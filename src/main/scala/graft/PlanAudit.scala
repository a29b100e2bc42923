package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: prints condensed physical plans for the headline queries so
  * plan quality (pushdown, broadcast, partial agg, codegen spans) can be
  * audited — `sbt "runMain graft.PlanAudit [sfDir] [query...]"`. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q_scan_project", "q_join_pricing", "q_agg_summary",
        "q_lww_merge_columns", "q_tombstone_filter", "q_knn_cosine",
        "q_ann_ivf", "q_dedup_minhash", "q_session_windows")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n======== $n ========")
      SparkEntry.queries.get(n) match {
        case Some(fn) => fn(spark, sfDir).explain("formatted")
        case None => println(s"unknown query $n")
      }
    }
    spark.stop()
  }
}
