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

  test("min_shingle_hash == array_min(transform(shingles, md5)) on real docs") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val both = docs.select(
      TextExpressions.min_shingle_hash(col("text"), Params.ShingleN).as("fast"),
      array_min(transform(Params.shingles(Params.toks(col("text"))),
        sh => md5(sh))).as("hof"))
    assert(both.filter(not(col("fast") <=> col("hof"))).count() == 0)
    assert(both.filter(col("fast").isNotNull).count() > 0)
  }

  test("min_shingle_hash edge cases: short text null, known value") {
    import spark.implicits._
    val df = Seq("one two", "one two three").toDF("text")
    val got = df.select(TextExpressions.min_shingle_hash(col("text"), 3)).collect()
    assert(got(0).isNullAt(0))
    // md5("one two three") — single shingle, so also the min
    assert(got(1).getString(0) ==
      java.security.MessageDigest.getInstance("MD5")
        .digest("one two three".getBytes("UTF-8")).map(b => f"$b%02x").mkString)
  }

  test("minhash_signature == explode + per-permutation min aggregation on real docs") {
    val perms = 16
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val native = docs.select(col("doc_id"),
        TextExpressions.minhash_signature(col("text"), Params.ShingleN,
          (0 until perms).map(Params.minHashA),
          (0 until perms).map(Params.minHashB), Params.MinHashP).as("sig"))
      .filter(size(col("sig")) > 0)
    // the aggregation formulation the oracle SQL mirrors
    val agg = docs.select(col("doc_id"),
        explode(Params.shingles(Params.toks(col("text")))).as("sh"))
      .withColumn("h", Params.md5Long(col("sh"), 8))
      .groupBy("doc_id")
      .agg(array((0 until perms).map(i =>
        min((col("h") * Params.minHashA(i) + Params.minHashB(i)) % Params.MinHashP)): _*)
        .as("sig_agg"))
    val joined = native.join(agg, "doc_id")
    assert(joined.count() == 500)
    assert(joined.filter(col("sig") =!= col("sig_agg")).count() == 0,
      "native one-pass signature must equal the aggregation formulation")
  }

  test("minhash_signature: short text yields an empty signature") {
    val sp = spark
    import sp.implicits._
    val out = Seq("one two", "").toDF("text")
      .select(TextExpressions.minhash_signature(col("text"), 3,
        Seq(1L, 3L), Seq(5L, 7L), Params.MinHashP).as("sig"))
      .collect().map(_.getSeq[Long](0))
    assert(out.forall(_.isEmpty), "fewer than n tokens -> empty, as the agg form drops the doc")
  }

  test("simhash64 == explode + distinct + per-bit vote aggregation on real docs") {
    val bits = Params.SimHashBits
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val native = docs.select(col("doc_id"),
      TextExpressions.simhash64(col("text"), bits).as("sh_native"))
    // the aggregation formulation the oracle SQL mirrors
    val tok = docs.select(col("doc_id"), explode(Params.toks(col("text"))).as("t"))
      .distinct()
      .withColumn("h", Params.md5Long64(col("t")))
    // & 1, not % 2: at 64 bits h is signed, and srl(h, 0) is a no-op so
    // a signed % would read bit 0 of negative hashes as -1 (the oracle's
    // (h >> j) & 1 has the same property)
    val bitSums = (0 until bits).map(j =>
      sum(when(shiftrightunsigned(col("h"), j).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"s$j"))
    val agg = tok.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), (0 until bits)
        .map(j => when(col(s"s$j") > 0, lit(1L << j)).otherwise(lit(0L)))
        .reduce[org.apache.spark.sql.Column](_ + _).as("sh_agg"))
    val joined = native.join(agg, "doc_id")
    assert(joined.count() == 500)
    assert(joined.filter(col("sh_native") =!= col("sh_agg")).count() == 0,
      "native one-pass simhash must equal the vote-aggregation formulation")
  }

  test("simhash64: token-less text yields null") {
    val sp = spark
    import sp.implicits._
    val out = Seq("...", "actual words here").toDF("text")
      .select(TextExpressions.simhash64(col("text"), 8).as("h")).collect()
    assert(out(0).isNullAt(0) && !out(1).isNullAt(0))
  }

  test("min_tokens(text, n) == the signature-emptiness conditions it pre-filters " +
    "(r19: replaces filter-on-derived-column, which double-evaluated the signatures)") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    // min_tokens(text, ShingleN) must equal size(minhash_signature) > 0
    val mh = docs.select(
      TextExpressions.min_tokens(col("text"), Params.ShingleN).as("cheap"),
      (size(TextExpressions.minhash_signature(col("text"), Params.ShingleN,
        (0 until 4).map(Params.minHashA), (0 until 4).map(Params.minHashB),
        Params.MinHashP)) > 0).as("full"))
    assert(mh.filter(col("cheap") =!= col("full")).count() == 0)
    // min_tokens(text, 1) must equal simhash64.isNotNull
    val sh = docs.select(
      TextExpressions.min_tokens(col("text"), 1).as("cheap"),
      TextExpressions.simhash64(col("text"), Params.SimHashBits).isNotNull.as("full"))
    assert(sh.filter(col("cheap") =!= col("full")).count() == 0)
    // edge cases: empty, punctuation-only, boundary token counts, nulls
    import spark.implicits._
    val edges = Seq("", "!!! 123 ...", "one", "one two", "one two three",
      "ONE-two_three", "a b c d", null.asInstanceOf[String]).toDF("text")
    val got = edges.select(TextExpressions.min_tokens(col("text"), 3).as("m"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getBoolean(0)).toSeq
    assert(got == Seq(false, false, false, false, true, true, true, null))
  }

  test("null text yields null (UnaryExpression null propagation)") {
    import spark.implicits._
    val df = Seq(Option("x y z w"), None).toDF("text")
    val got = df.select(TextExpressions.word_shingles(col("text"), 3).as("s")).collect()
    assert(got(0).getSeq[String](0) == Seq("x y z", "y z w"))
    assert(got(1).isNullAt(0))
  }
}
