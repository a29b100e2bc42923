package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: runs every declared query on
  * `SPARK_GRAFT_SF_DIR` and prints ONE JSON line with per-query seconds.
  * Queries are forced with a `noop` sink write (full plan executes —
  * `count()` would let Catalyst prune the computation to row counting).
  *
  * Each query runs twice and the second run is reported: the first run
  * pays one-time whole-stage-codegen + JIT compilation of that query
  * shape (measured 23 s → 1.4 s on repetition for the heaviest shape),
  * which any long-running job amortizes to zero — steady-state is the
  * number that scales.
  *
  * Robustness (this container shares a host; single runs intermittently
  * catch 10-50× external stalls on arbitrary queries, and a stall window
  * can swallow BOTH back-to-back timed runs — BENCH r1 recorded 31 s for
  * a query that reproduces at 1.3 s):
  *  - `value` per query = min of the timed runs (the reproducible plan
  *    cost);
  *  - `spread` per query = max/min of the timed runs, so a contended
  *    measurement is self-identifying in the artifact;
  *  - when the two runs disagree >3×, a third run is taken before the
  *    min/spread are computed;
  *  - after the sweep, queries whose value is >3× the median query time
  *    are re-timed once more — minutes later, outside the original stall
  *    window (temporal diversity is the only defense when a stall spans
  *    a whole query's samples); the min wins and the re-check is flagged
  *    in `rechecked`;
  *  - a query that throws reports -1 and lands in `errors` instead of
  *    silently contributing a small "time to throw" (ADVICE r1).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Option[String] =
      try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); None }
      catch { case e: Throwable => Some(s"${e.getClass.getSimpleName}: ${e.getMessage}") }

    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    def timed(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      run(fn).foreach(err => errors(name) = err)
      (System.nanoTime() - t0) / 1e9
    }
    val firstPass = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      run(fn) match { // warm-up: one-time codegen/JIT for this query shape
        case Some(err) =>
          errors(name) = err
          spark.catalog.clearCache()
          name -> (-1.0, -1.0)
        case None =>
          var runs = List(timed(name, fn), timed(name, fn))
          if (runs.max / runs.min > 3.0) runs = timed(name, fn) :: runs
          // queries are independent: drop relations persisted inside query
          // builders so cache memory doesn't leak into later measurements
          spark.catalog.clearCache()
          if (errors.contains(name)) name -> (-1.0, -1.0)
          else name -> (runs.min, runs.max / runs.min)
      }
    }
    // outlier re-check in a fresh time window (see scaladoc)
    val ok = firstPass.collect { case (_, (v, _)) if v >= 0 => v }.sorted
    val median = if (ok.isEmpty) 0.0 else ok(ok.length / 2)
    val rechecked = scala.collection.mutable.ArrayBuffer.empty[String]
    val results = firstPass.map {
      case (name, (v, s)) if v >= 0 && median > 0 && v > 3 * median =>
        val again = timed(name, SparkEntry.queries(name))
        spark.catalog.clearCache()
        rechecked += name
        name -> (math.min(v, again), s)
      case other => other
    }
    val qs = results.map { case (k, (v, _)) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val spreads = results.collect { case (k, (v, s)) if v >= 0 =>
      "\"" + k + "\":" + f"$s%.2f" }.mkString("{", ",", "}")
    val errs = errors.map { case (k, e) =>
      "\"" + k + "\":\"" + e.replaceAll("[\"\\\\\n]", " ").take(160) + "\"" }
      .mkString("{", ",", "}")
    val rech = rechecked.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2._1).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"spread":$spreads,"errors":$errs,"rechecked":$rech,"sf":"$sfDir"}""")
    spark.stop()
  }
}
