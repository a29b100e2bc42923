package graft.sources.sstable.spark

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, StructType}

/** The catalog's V2 `bucket` function — the key→bucket mapping of the
  * bucketed write layout, exposed through `FunctionCatalog` so Catalyst
  * can RESOLVE it wherever the engine declares a bucket transform:
  *
  *  - a bucketed table's `INSERT INTO` asks Spark for
  *    `Distributions.clustered(bucket(n, key))` + a `(bucket, key)` sort
  *    ([[SSTableWrite]]) — the shuffle then routes every row with THIS
  *    function, and each task streams whole buckets in order;
  *  - storage-partitioned reads can declare the same transform, letting
  *    Spark match co-bucketed tables exchange-free.
  *
  * The mapping is bit-identical to the expression
  * [[graft.operators.SSTableOps.writeBucketed]] routes with —
  * `pmod(xxhash64(key), n)` (xxhash64 = Spark's `XxHash64`, seed 42) —
  * so SQL-written and operator-written bucketed directories interoperate:
  * same key ⇒ same bucket id ⇒ same `bucket-NNNNN-` stem, whichever path
  * wrote it (spec-pinned against the SQL expression). Only this LAYOUT
  * contract matters to readers, never the function's internals. */
object GraftBucketFunction extends UnboundFunction {
  /** Bucket id of `key` under `numBuckets` — `pmod(xxhash64(key), n)`. */
  def bucketOf(numBuckets: Int, key: Array[Byte]): Int = {
    val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
      key, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, key.length, 42L)
    val m = (h % numBuckets).toInt
    if (m < 0) m + numBuckets else m
  }

  override def name(): String = "bucket"
  override def description(): String =
    "bucket(numBuckets, key BINARY): the sstable bucketed-layout id — pmod(xxhash64(key), numBuckets)"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2,
      s"bucket takes (numBuckets INT, key BINARY), got ${inputType.simpleString}")
    require(inputType.fields(0).dataType == IntegerType,
      s"bucket: numBuckets must be INT, got ${inputType.fields(0).dataType.simpleString}")
    require(inputType.fields(1).dataType == BinaryType,
      s"bucket: key must be BINARY, got ${inputType.fields(1).dataType.simpleString}")
    Bound
  }

  /** Bound form; Spark prefers the `invoke` magic method (static-shape
    * call, no row boxing), `produceResult` is the generic fallback. */
  object Bound extends ScalarFunction[Integer] {
    override def inputTypes(): Array[DataType] = Array(IntegerType, BinaryType)
    override def resultType(): DataType = IntegerType
    override def isResultNullable: Boolean = false
    override def name(): String = "bucket"
    override def canonicalName(): String = "graft.bucket(int,binary)"
    override def produceResult(input: InternalRow): Integer =
      bucketOf(input.getInt(0), input.getBinary(1))
    def invoke(numBuckets: Int, key: Array[Byte]): Int = bucketOf(numBuckets, key)
  }
}
