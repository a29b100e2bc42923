package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the harness parquet tables (`/root/testdata/sf*`).
  *
  * All query-facing time arithmetic is done on epoch-millisecond BIGINT
  * columns rather than TIMESTAMP values so that the Spark results and the
  * DuckDB oracle (`epoch_ms(ts)`) agree bit-for-bit regardless of each
  * engine's internal timestamp precision (parquet stores `events.ts` as
  * TIMESTAMP(NANOS), which Spark cannot even read natively — see
  * [[Tables.events]]).
  */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events.parquet` has shipped with two physical `ts` layouts across
    * harness revisions — TIMESTAMP(NANOS) (which Spark only reads as a
    * raw nano BIGINT via `nanosAsLong`) and plain TIMESTAMP(MICROS)
    * (read natively, as NTZ under parquet timestamp inference). The
    * loader accepts both and derives the same canonical columns:
    *  - `ts_ms`: epoch millis (BIGINT) — the canonical column every query
    *    uses; identical to DuckDB's `epoch_ms(ts)` (floor division; the
    *    session timezone is UTC everywhere, so NTZ == instant).
    *  - `ts_ns`: epoch nanos (BIGINT) — micro files carry 000 tails.
    *  - `ts`: µs-precision TIMESTAMP for Spark-internal windowing only
    *    (never emitted in query output).
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    // session-wide set, deliberately: TIMESTAMP(NANOS) is unreadable
    // without it, no per-read option exists, and re-setting is
    // idempotent (a caller-set false would only make this loader throw
    // PARQUET_TYPE_ILLEGAL anyway)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => // TIMESTAMP(NANOS) as raw longs
        raw.withColumnRenamed("ts", "ts_ns")
          .withColumn("ts_ms", expr("ts_ns div 1000000"))
          .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      case org.apache.spark.sql.types.TimestampType |
           org.apache.spark.sql.types.TimestampNTZType => // TIMESTAMP(MICROS)
        raw.withColumn("ts", col("ts").cast("timestamp"))
          .withColumn("ts_ns", unix_micros(col("ts")) * 1000L)
          .withColumn("ts_ms", expr("ts_ns div 1000000"))
      case other => // a THIRD layout must fail loudly, not null-coerce
        throw new IllegalStateException(
          s"events.ts has unsupported physical type $other — " +
            "teach Tables.events the new harness layout")
    }
  }

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "customer")
  def documents(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")
}
