package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.Tables
import graft.operators.Params

/** Pins WordShingles to the declarative HOF composition it replaces —
  * bit-identical outputs on the real documents table plus edge cases, so
  * the DuckDB oracle twins (written against the HOF semantics) stay
  * valid. */
class TextExpressionsSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  test("word_shingles == transform/sequence/element_at composition on real docs") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val both = docs.select(
      TextExpressions.word_shingles(col("text"), Params.ShingleN).as("fast"),
      Params.shingles(Params.toks(col("text"))).as("hof"))
    assert(both.filter(col("fast") =!= col("hof")).count() == 0)
    assert(both.filter(size(col("fast")) > 0).count() > 0)
  }

  test("edge cases: empty, punctuation-only, short, case folding") {
    import spark.implicits._
    val df = Seq("", "!!! 123 ...", "one two", "one two three",
      "ONE tWo THREE four", "a--b__c  d").toDF("text")
    val got = df.select(TextExpressions.word_shingles(col("text"), 3).as("s"))
      .as[Seq[String]].collect().toSeq
    assert(got == Seq(
      Nil, Nil, Nil,
      Seq("one two three"),
      Seq("one two three", "two three four"),
      Seq("a b c", "b c d")))
  }

  test("null text yields null (UnaryExpression null propagation)") {
    import spark.implicits._
    val df = Seq(Option("x y z w"), None).toDF("text")
    val got = df.select(TextExpressions.word_shingles(col("text"), 3).as("s")).collect()
    assert(got(0).getSeq[String](0) == Seq("x y z", "y z w"))
    assert(got(1).isNullAt(0))
  }
}
