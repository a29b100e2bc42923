package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming TF-IDF scoring against the persisted df store. Pinned:
  * streamed scores equal the batch formulation exactly; statistics
  * REFRESH between micro-batches (an epoch landing between batches
  * changes the next batch's scores); unseen terms drop. */
class StreamingTfIdfScoreSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private def docsDf(rows: (Long, String)*) = {
    val sp = spark
    import sp.implicits._
    rows.toSeq.toDF("doc_id", "text")
  }

  test("streamed scores == the batch formulation; unseen terms drop; " +
    "an empty store refuses") {
    val store = Files.createTempDirectory("tfidf-score").toString
    // scoring before any epoch has landed refuses loudly
    val refusal = intercept[IllegalArgumentException](
      StreamingTfIdfScore.scoreBatch(docsDf(1L -> "alpha"), store).collect())
    assert(refusal.getMessage.contains("counted no documents"))

    val corpus = Seq(1L -> "alpha beta beta", 2L -> "alpha gamma",
      3L -> "beta gamma delta")
    StreamingDfUpdate.processBatch(docsDf(corpus: _*), store, 0L)
    val toScore = docsDf(10L -> "alpha beta unseenword", 11L -> "delta delta")
    val got = StreamingTfIdfScore.scoreBatch(toScore, store)
      .collect().map(_.toString).toSeq
    // direct: df over corpus = alpha 2, beta 2, gamma 2, delta 1; n = 3
    val direct = toScore
      .select(col("doc_id"), explode(graft.operators.Params.toks(col("text"))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .join(StreamingDfUpdate.docFreqs(spark, store), "term")
      .withColumn("score_e4", expr("(tf * 3 * 10000) div df"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
          .orderBy(col("score_e4").desc, col("term"))))
      .filter(col("rk") <= graft.operators.Params.TfidfTopK)
      .select(col("doc_id"), col("term"), col("tf"), col("df"), col("score_e4"))
      .orderBy(col("doc_id"), col("score_e4").desc, col("term"))
      .collect().map(_.toString).toSeq
    assert(got == direct, s"streamed scoring diverged:\n$got\nvs\n$direct")
    assert(!got.exists(_.contains("unseenword")),
      "a term the store has never seen must drop (idf undefined)")
    assert(got.exists(_.contains("delta")), "known terms must score")
  }

  test("statistics refresh between micro-batches: an epoch landing " +
    "between batches changes the next batch's scores") {
    val store = Files.createTempDirectory("tfidf-fresh").toString
    StreamingDfUpdate.processBatch(
      docsDf(1L -> "alpha beta", 2L -> "alpha gamma"), store, 0L)
    val probe = docsDf(20L -> "beta beta")
    val before = StreamingTfIdfScore.scoreBatch(probe, store)
      .select("score_e4").head().getLong(0)
    // n=2, df(beta)=1, tf=2 -> (2*2*10000) div 1 = 40000
    assert(before == 40000L, before)
    // a new epoch lands: beta appears in two more docs
    StreamingDfUpdate.processBatch(
      docsDf(3L -> "beta x", 4L -> "beta y"), store, 1L)
    val after = StreamingTfIdfScore.scoreBatch(probe, store)
      .select("score_e4").head().getLong(0)
    // n=4, df(beta)=3 -> (2*4*10000) div 3 = 26666
    assert(after == 26666L,
      s"the next batch must see the NEW statistics, got $after")
  }

  test("the streaming entry point wires foreachBatch end-to-end and " +
    "re-reads the store per batch") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = spark.sqlContext
    val store = Files.createTempDirectory("tfidf-e2e").toString
    StreamingDfUpdate.processBatch(
      docsDf(1L -> "alpha beta", 2L -> "alpha gamma"), store, 0L)
    val scores = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val input = MemoryStream[(Long, String)]
    val q = StreamingTfIdfScore.start(
      input.toDF().toDF("doc_id", "text"), store,
      Files.createTempDirectory("tfidf-ck").toString,
      (df, _) => scores.synchronized {
        df.select("doc_id", "score_e4").collect()
          .foreach(r => scores += ((r.getLong(0), r.getLong(1))))
      })
    try {
      input.addData((20L, "beta beta"))
      q.processAllAvailable()
      // the maintainer advances the store between batches
      StreamingDfUpdate.processBatch(
        docsDf(3L -> "beta x", 4L -> "beta y"), store, 1L)
      input.addData((21L, "beta beta"))
      q.processAllAvailable()
    } finally q.stop()
    val byDoc = scores.synchronized(scores.toMap)
    assert(byDoc(20L) == 40000L && byDoc(21L) == 26666L,
      s"per-batch store re-read not observed: $byDoc")
  }
}
