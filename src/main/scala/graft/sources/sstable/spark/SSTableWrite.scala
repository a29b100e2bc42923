package graft.sources.sstable.spark

import java.io.File
import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection, SortOrder}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType
import graft.sources.sstable._

/** DSv2 write path: each Spark partition emits one complete SSTable set.
  *
  * The reference had no writer (read-only library, SURVEY.md §2.2-K row
  * "*SSTable writer* absent"); this is the new-capability half of the
  * north star. Sorting is delegated to Spark via
  * `RequiresDistributionAndOrdering` (cluster by `key`, sort by `key`
  * asc) — the engine's sort-merge machinery does the heavy lifting and the
  * writer itself is a streaming pass (O(chunk) memory).
  */
final class SSTableWriteBuilder(path: String, info: LogicalWriteInfo,
                                properties: Map[String, String])
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new SSTableWrite(path, info.schema(), properties, doTruncate)
}

final class SSTableWrite(path: String, schema: StructType,
                         properties: Map[String, String], truncate: Boolean)
    extends Write with RequiresDistributionAndOrdering {
  require(schema.fieldNames.contains("key"),
    s"sstable write requires a `key` column, got ${schema.simpleString}")

  override def requiredDistribution(): Distribution =
    Distributions.clustered(Array(Expressions.identity("key")))
  override def requiredOrdering(): Array[SortOrder] =
    Array(Expressions.sort(Expressions.column("key"), SortDirection.ASCENDING))

  override def toBatch: BatchWrite = new SSTableBatchWrite(path, schema, properties, truncate)
}

final case class SSTableCommit(files: Seq[String]) extends WriterCommitMessage

final class SSTableBatchWrite(path: String, schema: StructType,
                              properties: Map[String, String], truncate: Boolean)
    extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val dir = new File(path)
    if (truncate && dir.isDirectory)
      dir.listFiles().filter(_.getName.endsWith(".db")).foreach(_.delete())
    dir.mkdirs()
    val compress = properties.getOrElse(SSTableSource.CompressOption, "true").toBoolean
    val chunkLength = properties.getOrElse(SSTableSource.ChunkLengthOption,
      CompressionInfo.DefaultChunkLength.toString).toInt
    val summaryInterval = properties.getOrElse(SSTableSource.SummaryIntervalOption,
      IndexFile.DefaultSummaryInterval.toString).toInt
    new SSTableWriterFactory(path, schema, compress, chunkLength, summaryInterval)
  }
  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

final class SSTableWriterFactory(path: String, schema: StructType, compress: Boolean,
                                 chunkLength: Int, summaryInterval: Int)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new SSTablePartitionWriter(path, schema, partitionId, taskId, compress,
      chunkLength, summaryInterval)
}

/** Streams one partition's rows (already key-sorted by Spark) into a
  * 4-file SSTable set. Accepts either the full nested schema or a bare
  * `key` plus nested `columns` in any field order. */
final class SSTablePartitionWriter(dir: String, schema: StructType, partitionId: Int,
                                   taskId: Long, compress: Boolean, chunkLength: Int,
                                   summaryInterval: Int)
    extends DataWriter[InternalRow] {
  private val dataPath =
    f"$dir/part-$partitionId%05d-$taskId-Data.db"
  private val writer = new SSTableWriter(dataPath, compress, chunkLength, summaryInterval)
  private val keyIdx = schema.fieldIndex("key")
  private val colsIdx = if (schema.fieldNames.contains("columns")) schema.fieldIndex("columns") else -1
  private val colStruct = SSTableSchema.columnStruct

  override def write(record: InternalRow): Unit = {
    val key = record.getBinary(keyIdx)
    val cols: Seq[Column] =
      if (colsIdx < 0 || record.isNullAt(colsIdx)) Nil
      else {
        val arr = record.getArray(colsIdx)
        (0 until arr.numElements()).map { i =>
          val c = arr.getStruct(i, colStruct.length)
          val name = c.getBinary(0)
          val state = c.getUTF8String(1).toString
          val ts = c.getLong(3)
          state match {
            case "NORMAL" => Column.Normal(name, c.getBinary(2), ts)
            case "DELETED" => Column.Deleted(name, ts)
            case "EXPIRING" => Column.Expiring(name, c.getBinary(2), c.getLong(4), c.getLong(5), ts)
            case other => throw new IllegalArgumentException(s"unknown column state $other")
          }
        }
      }
    writer.append(SSTableRow(key, cols))
  }

  override def commit(): WriterCommitMessage = { writer.close(); SSTableCommit(Seq(dataPath)) }
  override def abort(): Unit = writer.close()
  override def close(): Unit = ()
}
