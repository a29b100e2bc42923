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

  /** `events.parquet` carries TIMESTAMP(NANOS), rejected by Spark's parquet
    * reader (PARQUET_TYPE_ILLEGAL). We read nanos as raw longs and derive:
    *  - `ts_ms`: epoch millis (BIGINT) — the canonical column every query
    *    uses; identical to DuckDB's `epoch_ms(ts)` (floor division).
    *  - `ts`: µs-precision TIMESTAMP for Spark-internal windowing only
    *    (never emitted in query output).
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    // session-wide set, deliberately: TIMESTAMP(NANOS) is unreadable
    // without it, no per-read option exists, and re-setting is
    // idempotent (a caller-set false would only make this loader throw
    // PARQUET_TYPE_ILLEGAL anyway)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(spark, sfDir, "events")
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts_ms", expr("ts_ns div 1000000"))
      .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
  }

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "customer")
  def documents(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")
}
