package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import Params.{e2, e4}

/** The relational surface the reference delegated to Pig (SURVEY.md §2.6) —
  * scans with projection/filter pushdown, joins (broadcast for small dims),
  * window top-k, set ops, grouped aggregation — plus the direct analogues of
  * its scan/projection operators (S1–S8, P2/P4/P6, A3).
  *
  * Scale notes: every filter/projection here is declarative so Catalyst
  * pushes it into the parquet scan (verified via `.explain` →
  * PushedFilters/ReadSchema); `customer` joins are explicitly
  * `broadcast(...)` (dim ≪ fact); aggregations are hash-aggs with map-side
  * partial combine.
  */
object RelationalQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S1–S4 + P6 — scan, project, filter (pushdown-friendly).
    "q_scan_project" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-01-01").cast("timestamp"))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber")
    }),
    // S5/S8 — index scan projected to distinct ordered keys.
    "q_index_keys" -> ((s, d) => {
      Tables.orders(s, d).select("o_custkey").distinct().orderBy("o_custkey")
    }),
    // P2 — explode row → columns (unnest with ordinal).
    "q_explode" -> ((s, d) => {
      Tables.embeddings(s, d)
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .select(col("vec_id"), col("pos").cast("long").as("pos"),
          e4(col("v").cast("double")).as("val_e4"))
        .orderBy("vec_id", "pos")
    }),
    // P4 — string decode/normalize (without the reference's padding bug).
    "q_cast_utf8" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"), upper(col("lang")).as("lang_norm"),
          length(col("text")).cast("long").as("text_chars"))
        .orderBy("doc_id")
    }),
    // A3/O1 — per-group min/max/count + in-group sort.
    "q_group_minmax_sort" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy("l_orderkey")
        .agg(count(lit(1)).as("n_lines"),
          min("l_quantity").as("qty_min"), max("l_quantity").as("qty_max"),
          concat_ws(",", sort_array(collect_list(col("l_linenumber")))).as("linenumbers"))
        .orderBy("l_orderkey")
    }),
    // §2.6 Pig layer — TPC-H Q3-shaped join pipeline (bench anchor).
    "q_join_pricing" -> ((s, d) => {
      val cut = lit("1998-06-01").cast("timestamp")
      val c = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.orders(s, d).filter(col("o_orderdate") < cut)
      val l = Tables.lineitem(s, d).filter(col("l_shipdate") > cut)
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
        .select(col("l_orderkey"), e2(col("rev")).as("revenue_e2"),
          unix_millis(col("o_orderdate").cast("timestamp")).as("o_date_ms"))
        .orderBy(col("revenue_e2").desc, col("l_orderkey"))
        .limit(20)
    }),
    // §2.6/O3 — window top-k per group.
    "q_window_topk" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= 2)
        .select("o_custkey", "rk", "o_orderkey", "o_totalprice")
        .orderBy("o_custkey", "rk")
    }),
    // §2.6 — set operations (EXCEPT / INTERSECT / UNION distinct).
    "q_setops" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val withOrders = c.join(Tables.orders(s, d),
        col("c_custkey") === col("o_custkey"), "left_semi").select("c_custkey")
      val building = c.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val lowBal = c.filter(col("c_acctbal") < 0.0).select("c_custkey")
      withOrders.except(building).union(building.intersect(lowBal))
        .distinct().orderBy("c_custkey")
    }),
    // Grouping sets / rollup — absent from the reference (SURVEY §2.4
    // note), provided natively by Spark; subtotal rows surface as 'ALL'
    // (never null: null sort keys order differently across engines).
    "q_rollup_pricing" -> ((s, d) => {
      Tables.lineitem(s, d)
        .rollup("l_returnflag", "l_linestatus")
        .agg(e2(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("rev_e2"),
          count(lit(1)).as("n"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("lstatus"),
          col("rev_e2"), col("n"))
        .orderBy("rflag", "lstatus")
    }),
    // Semi-structured surface: JSON property extraction feeding a grouped
    // aggregation (props is a JSON text column, as event payloads are in
    // practice). Narrow extract + one hash-agg; per-row e2 scaling keeps
    // the float sum order-independent across engines.
    "q_json_extract" -> ((s, d) => {
      Tables.events(s, d)
        .select(pmod(get_json_object(col("props"), "$.k").cast("long"), lit(10L)).as("kb"),
          e2(col("value")).as("v2"))
        .groupBy("kb")
        .agg(count(lit(1)).as("n"), sum(col("v2")).as("value_sum_e2"))
        .orderBy("kb")
    }),
    // TPC-H Q1-shaped grouped aggregation (bench anchor; Spark partial-agg
    // map-side combine vs. the reference's combiner-less MR shuffle).
    "q_agg_summary" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(e2(sum("l_quantity")).as("sum_qty_e2"),
          e2(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("sum_disc_price_e2"),
          e4(avg("l_discount")).as("avg_disc_e4"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag", "l_linestatus")
    })
  )

  def oracles: Map[String, String] = Map(
    "q_scan_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01'
         ORDER BY l_orderkey, l_linenumber""",
    "q_index_keys" ->
      "SELECT DISTINCT o_custkey FROM orders ORDER BY o_custkey",
    "q_explode" ->
      s"""SELECT vec_id, CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS pos,
                ${Params.e4Sql("CAST(unnest(embedding) AS DOUBLE)")} AS val_e4
         FROM embeddings ORDER BY vec_id, pos""",
    "q_cast_utf8" ->
      """SELECT doc_id, upper(lang) AS lang_norm, CAST(length(text) AS BIGINT) AS text_chars
         FROM documents ORDER BY doc_id""",
    "q_group_minmax_sort" ->
      """SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_lines,
                min(l_quantity) AS qty_min, max(l_quantity) AS qty_max,
                string_agg(l_linenumber, ',' ORDER BY l_linenumber) AS linenumbers
         FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""",
    "q_join_pricing" ->
      s"""SELECT l_orderkey, ${Params.e2Sql("sum(l_extendedprice * (1.0 - l_discount))")} AS revenue_e2,
                epoch_ms(o_orderdate) AS o_date_ms
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         WHERE c_mktsegment = 'BUILDING'
           AND o_orderdate < TIMESTAMP '1998-06-01' AND l_shipdate > TIMESTAMP '1998-06-01'
         GROUP BY l_orderkey, o_orderdate
         ORDER BY revenue_e2 DESC, l_orderkey LIMIT 20""",
    "q_window_topk" ->
      """SELECT o_custkey, rk, o_orderkey, o_totalprice
         FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                      CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rk
               FROM orders) WHERE rk <= 2 ORDER BY o_custkey, rk""",
    "q_setops" ->
      """SELECT c_custkey FROM (
           (SELECT c_custkey FROM customer WHERE c_custkey IN (SELECT o_custkey FROM orders)
            EXCEPT SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
           UNION
           (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
            INTERSECT SELECT c_custkey FROM customer WHERE c_acctbal < 0.0)
         ) ORDER BY c_custkey""",
    "q_rollup_pricing" ->
      s"""SELECT coalesce(l_returnflag, 'ALL') AS rflag, coalesce(l_linestatus, 'ALL') AS lstatus,
                ${Params.e2Sql("sum(l_extendedprice * (1.0 - l_discount))")} AS rev_e2,
                CAST(count(*) AS BIGINT) AS n
         FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
         ORDER BY rflag, lstatus""",
    "q_json_extract" ->
      // ((x % 10) + 10) % 10 mirrors Spark's pmod (always in [0,10)) —
      // DuckDB's bare % keeps the dividend's sign (ADVICE r2 low)
      s"""SELECT ((CAST(json_extract_string(props, '$$.k') AS BIGINT) % 10) + 10) % 10 AS kb,
                CAST(count(*) AS BIGINT) AS n,
                CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS value_sum_e2
         FROM ${Params.EventsSql} GROUP BY kb ORDER BY kb""",
    "q_agg_summary" ->
      s"""SELECT l_returnflag, l_linestatus, ${Params.e2Sql("sum(l_quantity)")} AS sum_qty_e2,
                ${Params.e2Sql("sum(l_extendedprice * (1.0 - l_discount))")} AS sum_disc_price_e2,
                ${Params.e4Sql("avg(l_discount)")} AS avg_disc_e4, CAST(count(*) AS BIGINT) AS n
         FROM lineitem GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"""
  )
}
