package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the declared operator inventory (SURVEY.md §2.8 + the
  * training-data-pipeline extensions); each entry has an ANSI-SQL twin in
  * `oracleSql` that the driver executes in DuckDB over the same parquet
  * tables and hash-compares against our result.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Full-row LWW merge (the reference's MsgPackSSTableDataReducer
    * semantics, mapred/SSTableData.scala:79-119) over the events table. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_lww_merge_columns")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++
      WideRowQueries.queries ++
      TextQueries.queries ++
      DedupQueries.queries ++
      SimilarityQueries.queries ++
      SessionQueries.queries ++
      MultimodalQueries.queries ++
      PipelineQueries.queries ++
      TakedownQueries.queries

  /** DuckDB twins, same column names + total ORDER BY as the Spark side. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++
      WideRowQueries.oracles ++
      TextQueries.oracles ++
      DedupQueries.oracles ++
      SimilarityQueries.oracles ++
      SessionQueries.oracles ++
      MultimodalQueries.oracles ++
      PipelineQueries.oracles ++
      TakedownQueries.oracles
}
