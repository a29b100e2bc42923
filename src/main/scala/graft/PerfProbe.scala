package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Params._

/** Scratch perf probe for the shingle-pipeline variants (dev tool). */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
    }

    val docs = Tables.documents(spark, sfDir)

    time("A_tokens_only") {
      docs.select(col("doc_id"), toks(col("text")).as("t"))
    }
    time("B_exact_fp_only") {
      docs.select(col("doc_id"), md5(concat_ws(" ", toks(col("text")))).as("fp"))
    }
    time("C_shingles_hof") {
      docs.select(col("doc_id"), shingles(toks(col("text"))).as("sh"))
    }
    time("C2_shingles_precomputed_t") {
      docs.select(col("doc_id"), toks(col("text")).as("t"))
        .select(col("doc_id"), shingles(col("t")).as("sh"))
    }
    time("D_min_md5_shingle_hof") {
      docs.select(col("doc_id"),
        array_min(transform(shingles(toks(col("text"))), sh => md5(sh))).as("fp"))
    }
    time("D2_min_md5_two_steps") {
      docs.select(col("doc_id"), shingles(toks(col("text"))).as("sh"))
        .select(col("doc_id"), array_min(transform(col("sh"), sh => md5(sh))).as("fp"))
    }
    time("E_explode_groupby") {
      docs.select(col("doc_id"), explode(shingles(toks(col("text")))).as("sh"))
        .groupBy("doc_id").agg(min(md5(col("sh"))).as("fp"))
    }
    spark.stop()
  }
}
