package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkEntry

/** Plan-quality assertions for the headline queries: filters reach the
  * parquet scan, projections prune the read schema, small dims broadcast,
  * and shuffle counts stay at the expected minimum. These are the
  * properties that decide 100 TB behaviour — pinned here so a refactor
  * can't silently regress them. */
class PlanQualitySpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.001"

  private lazy val spark = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private def executedPlan(name: String) = {
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.collect() // force AQE to finalize
    df.queryExecution.executedPlan
  }

  private def collectAll(p: org.apache.spark.sql.execution.SparkPlan)
  : Seq[org.apache.spark.sql.execution.SparkPlan] = {
    val self = p match {
      case a: AdaptiveSparkPlanExec => collectAll(a.executedPlan)
      case other => Seq(other)
    }
    self ++ p.children.flatMap(collectAll) ++ p.subqueries.flatMap(collectAll)
  }

  test("q_scan_project: shipdate filter is pushed to the parquet scan and schema is pruned") {
    val scans = collectAll(executedPlan("q_scan_project"))
      .collect { case s: FileSourceScanExec => s }
    assert(scans.nonEmpty)
    val scan = scans.head
    assert(scan.metadata("PushedFilters").contains("l_shipdate"),
      s"filter not pushed: ${scan.metadata("PushedFilters")}")
    val readCols = scan.requiredSchema.fieldNames.toSet
    assert(readCols == Set("l_orderkey", "l_linenumber", "l_quantity",
      "l_extendedprice", "l_shipdate"), s"read schema not pruned: $readCols")
  }

  test("q_join_pricing: customer dim joins via broadcast, not shuffle") {
    val plan = executedPlan("q_join_pricing")
    val bhj = collectAll(plan).collect { case j: BroadcastHashJoinExec => j }
    assert(bhj.nonEmpty, s"no broadcast hash join in:\n$plan")
  }

  test("q_lww_merge_columns: exactly one shuffle (single hash-agg on the grouping keys)") {
    // latest-per-(user,type) = one partial+final hash-agg pair → one
    // exchange, plus the final presentation sort's exchange.
    val plan = executedPlan("q_lww_merge_columns")
    val shuffles = collectAll(plan).collect { case e: ShuffleExchangeExec => e }
    assert(shuffles.size <= 2, s"expected <=2 exchanges (agg + order-by), got ${shuffles.size}:\n$plan")
  }

  test("q_tombstone_filter: tombstone relation broadcasts; fact table is not shuffled") {
    val plan = executedPlan("q_tombstone_filter")
    val bhj = collectAll(plan).collect { case j: BroadcastHashJoinExec => j }
    assert(bhj.nonEmpty, s"tombstone join should broadcast:\n$plan")
  }

  test("q_ann_ivf: candidate join is an equi-join on the cell, queries broadcast") {
    val plan = executedPlan("q_ann_ivf")
    val bhj = collectAll(plan).collect { case j: BroadcastHashJoinExec => j }
    assert(bhj.nonEmpty, s"IVF probe should broadcast the query side:\n$plan")
  }
}
