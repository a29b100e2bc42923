package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Params._

/** Dev probe: bisect q_dedup_ngram's 46s wall into its stages. */
object NgramProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }

    val docs = Tables.documents(spark, sfDir).filter(col("doc_id") < PairSampleIds)
    val sh = docs.select(col("doc_id"), toks(col("text")).as("t"))
      .select(col("doc_id"), shingles(col("t")).as("shs"))
      .select(col("doc_id"), explode(col("shs")).as("sh"))
      .distinct().persist()
    time("materialize sh")(println("sh rows: " + sh.count()))
    val cnt = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    time("cnt")(println("cnt rows: " + cnt.count()))
    val inter = sh.select(col("doc_id").as("a"), col("sh"))
      .join(sh.select(col("doc_id").as("b"), col("sh")), "sh")
      .filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("i"))
    time("inter join+agg")(println("inter rows: " + inter.count()))
    inter.explain()
    val full = inter
      .join(cnt.select(col("doc_id").as("a"), col("n").as("na")), "a")
      .join(cnt.select(col("doc_id").as("b"), col("n").as("nb")), "b")
      .withColumn("jacc", col("i") * lit(1.0) / (col("na") + col("nb") - col("i")))
      .orderBy(col("jacc").desc, col("a"), col("b")).limit(JaccardTopPairs)
    time("full")(println("full rows: " + full.count()))
    spark.stop()
  }
}
