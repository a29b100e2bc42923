package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph primitives for the dedup pipeline — currently the
  * one every near-dup pipeline ends with: collapsing candidate PAIRS
  * into duplicate CLUSTERS so one canonical document per cluster can be
  * kept. (The reference has no graph surface; pair generation alone —
  * q_dedup_minhash / q_simhash_pairs — leaves the transitive grouping
  * to the caller.)
  */
object GraphOps {

  /** Connected components over an undirected edge list by iterated
    * label propagation ("hash-to-min"): every vertex's label starts as
    * its own id and each pass lowers it to the minimum of its
    * neighbors' labels; at fixpoint `component` = the minimum vertex id
    * reachable from `id` — a deterministic canonical cluster id,
    * independent of iteration schedule or partitioning.
    *
    * Scale shape: each pass is one equi-join of the (persisted,
    * symmetrized) edge list with the label relation plus a min hash-agg
    * — O(E) shuffle per pass, no driver-side per-row state; labels are
    * `localCheckpoint`ed every pass so lineage and plan size stay flat
    * in the iteration count (the k-medians pattern). Pass count is
    * O(graph diameter) — small for near-dup clusters, which are
    * quasi-cliques (every member pairs with most others); a chain-like
    * pathology converges slower and hits `maxIters` LOUDLY rather than
    * returning a half-merged clustering. (If chains ever become a real
    * workload, the O(log n) large-star/small-star variant is the
    * upgrade path; for dedup graphs the simple fixpoint is the honest
    * fit.)
    *
    * Output: one row per vertex appearing in any edge — `(id,
    * component)`. Vertex ids must be an orderable type (long/string). */
  def connectedComponents(edges: DataFrame, src: String, dst: String,
                          maxIters: Int = 64): DataFrame = {
    val sym = edges.select(col(src).as("u"), col(dst).as("v"))
      .union(edges.select(col(dst).as("u"), col(src).as("v")))
      .distinct().persist()
    // localCheckpoint is eager and caches: flat lineage from pass zero
    var labels = sym.select(col("u").as("id")).distinct()
      .withColumn("component", col("id")).localCheckpoint()
    var it = 0
    var changed = 1L
    while (changed > 0 && it < maxIters) {
      val neighborMin = sym
        .join(labels, sym("v") === labels("id"))
        .groupBy(col("u")).agg(min(col("component")).as("nmin"))
      val next = labels.join(neighborMin, labels("id") === neighborMin("u"), "left")
        .select(col("id"), col("component").as("old"),
          least(col("component"), coalesce(col("nmin"), col("component")))
            .as("component"))
        .persist()
      val nextLabels = next.select("id", "component").localCheckpoint()
      changed = next.filter(col("component") =!= col("old")).count()
      next.unpersist()
      labels.unpersist()
      labels = nextLabels
      it += 1
    }
    sym.unpersist()
    require(changed == 0,
      s"connected components did not converge in $maxIters passes — " +
        "graph diameter exceeds the bound; raise maxIters")
    labels
  }
}
