package graft.sources.sstable.spark

import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.StructType
import graft.sources.sstable._

/** Streaming offset = the set of Data.db files already processed.
  * SSTable generations are immutable once committed (the staged-commit
  * write paths rename complete filesets in), so "new data" is exactly
  * "new files" — the Cassandra memtable-flush ingestion model. The
  * offset serializes as a single-line JSON array (Spark's offset log is
  * line-oriented — a newline inside an offset would corrupt checkpoint
  * recovery); growth is O(#files), acceptable at generation granularity
  * (compaction keeps it bounded). */
final case class SSTableOffset(files: Set[String]) extends Offset {
  override def json(): String = {
    import org.json4s.JsonDSL._
    org.json4s.jackson.JsonMethods.compact(
      org.json4s.jackson.JsonMethods.render(files.toSeq.sorted))
  }
}

object SSTableOffset {
  def fromJson(s: String): SSTableOffset = {
    implicit val fmt: org.json4s.Formats = org.json4s.DefaultFormats
    SSTableOffset(org.json4s.jackson.JsonMethods.parse(s)
      .extract[List[String]].toSet)
  }
}

/** Micro-batch streaming read over an SSTable directory: every batch
  * processes the generations that landed since the last offset, split-
  * planned exactly like the batch scan (row-aligned, pruned, bloom- and
  * locality-aware via [[SSTableScan.planFile]]). Exactly-once per file:
  * a file is in precisely one offset range, and ranges replay
  * deterministically from the checkpoint. */
final class SSTableMicroBatchStream(path: String, requiredSchema: StructType,
                                    targetSplitBytes: Long,
                                    ttlAsOfMs: Option[Long],
                                    serConf: Option[SerializableHadoopConf])
    extends MicroBatchStream {
  private def storage: Storage =
    serConf.map(c => new HadoopStorage(c.value): Storage).getOrElse(LocalStorage)

  override def initialOffset(): Offset = SSTableOffset(Set.empty)
  override def deserializeOffset(json: String): Offset = SSTableOffset.fromJson(json)
  override def latestOffset(): Offset =
    SSTableOffset(storage.listDataFiles(path).toSet)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val seen = start.asInstanceOf[SSTableOffset].files
    val now = end.asInstanceOf[SSTableOffset].files
    val fresh = (now -- seen).toSeq.sorted
    val st = storage
    fresh.flatMap(SSTableScan.planFile(st, targetSplitBytes, None, None)).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SSTableReaderFactory(requiredSchema, ttlAsOfMs, serConf)

  override def commit(end: Offset): Unit = () // offsets live in the checkpoint
  override def stop(): Unit = ()
}
