package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantics pins for [[TemporalJoins]]: inclusive as-of boundary,
  * null fill for unmatched left rows, per-key isolation; interval join
  * containment incl. intervals spanning multiple buckets. */
class TemporalJoinsSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  test("asOf: latest right row at-or-before each left row, per key") {
    val sp = spark
    import sp.implicits._
    val left = Seq((1L, 100L, "a"), (1L, 200L, "b"), (2L, 150L, "c"), (3L, 50L, "d"))
      .toDF("k", "ts", "tag")
    val right = Seq((1L, 100L, "r100"), (1L, 150L, "r150"), (2L, 149L, "r149"))
      .toDF("k", "rts", "rv")
    val out = TemporalJoins.asOf(left, right, Seq("k"), "ts", "rts")
      .orderBy("k", "ts")
      .select("k", "ts", "tag", "rts", "rv")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), Option(r.getString(4)).getOrElse("-")))
    assert(out.toSeq == Seq(
      (1L, 100L, "a", 100L, "r100"), // inclusive: right at exactly ts matches
      (1L, 200L, "b", 150L, "r150"), // latest ≤ 200 wins, not the first
      (2L, 150L, "c", 149L, "r149"), // keys don't leak across groups
      (3L, 50L, "d", -1L, "-"))) // no prior right row → nulls
  }

  test("asOf forward: earliest right row at-or-after; tolerance turns far matches into misses") {
    val sp = spark
    import sp.implicits._
    val left = Seq((1L, 100L, "a"), (1L, 200L, "b"), (2L, 50L, "c")).toDF("k", "ts", "tag")
    val right = Seq((1L, 100L, "r100"), (1L, 150L, "r150"), (2L, 500L, "r500"))
      .toDF("k", "rts", "rv")
    def run(tol: Option[Long]) =
      TemporalJoins.asOf(left, right, Seq("k"), "ts", "rts", "forward", tol)
        .orderBy("k", "ts").select("k", "ts", "rts")
        .collect().map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) -1L else r.getLong(2)))
    assert(run(None).toSeq == Seq(
      (1L, 100L, 100L), // inclusive at equal ts
      (1L, 200L, -1L), // nothing at-or-after 200
      (2L, 50L, 500L))) // earliest ≥ 50
    assert(run(Some(100L)).toSeq == Seq(
      (1L, 100L, 100L), (1L, 200L, -1L),
      (2L, 50L, -1L)), "match at distance 450 > tolerance 100 becomes a miss")
  }

  test("intervalJoinBucketed: exact containment; multi-bucket intervals join once") {
    val sp = spark
    import sp.implicits._
    // bucketMs = 100; interval [50, 250] spans buckets 0..2
    val iv = Seq((50L, 250L), (400L, 450L)).toDF("start_ms", "end_ms")
    val pts = Seq(49L, 50L, 199L, 250L, 251L, 420L, 500L).toDF("pos")
    val out = TemporalJoins.intervalJoinBucketed(iv, pts, "start_ms", "end_ms", "pos", 100L)
      .select("pos", "start_ms").orderBy("pos")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((50L, 50L), (199L, 50L), (250L, 50L), (420L, 400L)),
      "boundaries are inclusive, outside points drop, and no duplicate matches")
  }
}
