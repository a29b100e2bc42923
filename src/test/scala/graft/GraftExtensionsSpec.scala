package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** SQL-surface registration: the native expressions must be callable from
  * plain `spark.sql`, with results identical to the Column API. */
class GraftExtensionsSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    GraftExtensions.register(s)
    s
  }

  test("word_shingles and min_shingle_hash work from SQL") {
    import spark.implicits._
    Seq(("one two three four", 1L), ("tiny", 2L)).toDF("text", "id")
      .createOrReplaceTempView("t")
    val rows = spark.sql(
      """SELECT id, word_shingles(text, 3) AS sh, word_shingles(text) AS sh_default,
                min_shingle_hash(text, 3) AS fp
         FROM t ORDER BY id""").collect()
    assert(rows(0).getSeq[String](1) == Seq("one two three", "two three four"))
    assert(rows(0).getSeq[String](2) == rows(0).getSeq[String](1)) // default n = 3
    assert(rows(0).getString(3) ==
      java.security.MessageDigest.getInstance("MD5")
        .digest("one two three".getBytes("UTF-8")).map(b => f"$b%02x").mkString)
    assert(rows(1).getSeq[String](1) == Nil)
    assert(rows(1).isNullAt(3))
  }

  test("non-literal shingle width is rejected") {
    import spark.implicits._
    Seq(("a b c", 3)).toDF("text", "n").createOrReplaceTempView("t2")
    val e = intercept[Exception] {
      spark.sql("SELECT word_shingles(text, n) FROM t2").collect()
    }
    assert(e.getMessage.contains("integer literal") ||
      Option(e.getCause).exists(_.getMessage.contains("integer literal")))
  }
}
