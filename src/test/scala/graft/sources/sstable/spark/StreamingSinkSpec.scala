package graft.sources.sstable.spark

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SSTableOps

/** `writeStream.format("sstable")`: each micro-batch commits one SSTable
  * generation; the batch source reads the union of generations and the
  * LWW merge resolves cross-epoch rewrites — Cassandra's memtable-flush
  * model on Structured Streaming. */
class StreamingSinkSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("streaming sink commits one readable generation per epoch; LWW merges across epochs") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("sstable-stream").toString

    val input = MemoryStream[(String, String, Long)] // (key, value, ts)
    val df = input.toDF().toDF("k", "v", "ts")
      .select(col("k").cast("binary").as("key"),
        array(struct(
          lit("c").cast("binary").as("name"),
          lit("NORMAL").as("state"),
          col("v").cast("binary").as("value"),
          col("ts").as("timestamp"),
          lit(0L).as("ttlSecs"),
          lit(0L).as("expiresMillis"))).as("columns"))

    val q = df.writeStream.format("sstable")
      .option("path", dir)
      .option("checkpointLocation", Files.createTempDirectory("sstable-ck").toString)
      .start()

    input.addData(("a", "v1", 10L), ("b", "v1", 10L))
    q.processAllAvailable()
    input.addData(("a", "v2", 20L), ("c", "v1", 15L)) // a rewritten in epoch 1
    q.processAllAvailable()
    q.stop()

    // no staged leftovers visible to readers; epoch-stamped sets committed
    val files = new java.io.File(dir).listFiles().map(_.getName)
    assert(files.count(_.endsWith("-Data.db")) >= 2, files.mkString(", "))
    assert(files.forall(f => !f.contains("_streaming-staging") || // staging dir itself
      new java.io.File(s"$dir/$f").isDirectory))
    // published names are (partition, epoch)-deterministic: the staged
    // attempt id must be stripped at commit (replay idempotency), and
    // every visible Data.db must have its complete sibling set in place
    assert(files.filter(_.endsWith(".db")).forall(!_.contains("-attempt-")),
      files.mkString(", "))
    files.filter(_.endsWith("-Data.db")).foreach { data =>
      graft.sources.sstable.SSTableFiles.AllSuffixes.foreach { suf =>
        val sib = graft.sources.sstable.SSTableFiles.sibling(s"$dir/$data", suf)
        assert(new java.io.File(sib).exists(), s"missing sibling $sib")
      }
    }
    assert(SSTableStreamingWrite.publishedName("part-00003-epoch-7-attempt-42-Data.db")
      == "part-00003-epoch-7-Data.db")

    val all = spark.read.format("sstable").load(dir)
    assert(all.count() == 4) // a(e0), b(e0), a(e1), c(e1)

    // LWW compaction collapses the two generations of `a` to ts=20
    val merged = SSTableOps.compactRows(all)
    assert(merged.count() == 3)
    val aRow = merged.filter(col("key").cast("string") === "a")
      .select(explode(col("columns")).as("c")).select("c.value", "c.timestamp")
      .collect().map(r => (new String(r.getAs[Array[Byte]](0)), r.getLong(1)))
    assert(aRow.toSeq == Seq(("v2", 20L)))
  }

  test("streaming source: newly landed generations arrive as micro-batches, exactly once") {
    val dir = Files.createTempDirectory("sstable-stream-src").toString

    def writeGen(prefix: String, keys: Seq[String]): Unit = {
      val w = new graft.sources.sstable.SSTableWriter(s"$dir/$prefix-Data.db",
        compress = true, chunkLength = 512, summaryInterval = 8)
      keys.sorted.foreach(k => w.append(graft.sources.sstable.SSTableRow(
        k.getBytes, Seq(graft.sources.sstable.Column.Normal(
          "c".getBytes, s"$prefix-$k".getBytes, 1L)))))
      w.close()
    }
    writeGen("gen1", Seq("a", "b"))

    val q = spark.readStream.format("sstable").load(dir)
      .select(col("key").cast("string").as("k"))
      .writeStream.outputMode("append").format("memory").queryName("sst_stream")
      .option("checkpointLocation", Files.createTempDirectory("sst-src-ck").toString)
      .start()
    q.processAllAvailable()
    writeGen("gen2", Seq("c", "d")) // a new generation lands mid-stream
    q.processAllAvailable()
    q.processAllAvailable() // no new files -> no duplicate batch
    q.stop()

    val keys = spark.table("sst_stream").collect().map(_.getString(0)).sorted
    assert(keys.toSeq == Seq("a", "b", "c", "d"), s"got ${keys.mkString(", ")}")
  }

  test("streaming source survives restart: offsets recover from the checkpoint, no replays") {
    val dir = Files.createTempDirectory("sstable-stream-rst").toString
    val ck = Files.createTempDirectory("sst-rst-ck").toString

    def writeGen(prefix: String, keys: Seq[String]): Unit = {
      val w = new graft.sources.sstable.SSTableWriter(s"$dir/$prefix-Data.db",
        compress = true, chunkLength = 512, summaryInterval = 8)
      keys.sorted.foreach(k => w.append(graft.sources.sstable.SSTableRow(
        k.getBytes, Seq(graft.sources.sstable.Column.Normal(
          "c".getBytes, k.getBytes, 1L)))))
      w.close()
    }
    val outDir = Files.createTempDirectory("sst-rst-out").toString
    // memory sink can't recover from a checkpoint — use the file sink
    def start() = spark.readStream.format("sstable").load(dir)
      .select(col("key").cast("string").as("k"))
      .writeStream.outputMode("append").format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ck)
      .start()

    writeGen("g1", Seq("a", "b"))
    val q1 = start()
    q1.processAllAvailable()
    q1.stop()
    writeGen("g2", Seq("c"))
    // restart from the same checkpoint: the committed offset (a JSON array
    // of processed files) must round-trip through the line-oriented offset
    // log — g1 must NOT replay, g2 must arrive
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    val keys = spark.read.parquet(outDir).collect().map(_.getString(0)).sorted
    assert(keys.toSeq == Seq("a", "b", "c"), s"got ${keys.mkString(", ")}")
  }
}
