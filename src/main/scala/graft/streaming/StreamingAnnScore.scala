package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorExpressions.vector_dot

/** Streaming ANN routing against the PERSISTED index (the serving loop
  * of a live retrieval pipeline composed with [[graft.operators.AnnIndex]]):
  * a stream of query vectors is assigned its nearest coarse cell per
  * micro-batch, using centroids loaded ONCE from the index table at
  * stream setup. Downstream, the routed stream composes with the batch
  * layers — probe the cell's candidates via the lookup tier, or land
  * routed vectors for `update_ann_index` to encode.
  *
  * Shape: the centroids are k tiny rows (the whole point of the
  * persisted index), so they fold into ONE stateless projection — no
  * streaming aggregation, no state store, no watermark; append mode
  * works and a restart re-reads the (possibly rebuilt) index. The fold
  * visits centroids in ascending cell order and replaces only on a
  * STRICTLY greater cosine, which reproduces training's assignment rule
  * exactly (max cosine; tie → lowest cell —
  * [[graft.operators.SimilarityQueries.kmediansCells]]), so a streamed
  * vector routes to the same cell batch encoding gives it
  * (spec-pinned against [[graft.operators.AnnIndex.assignCoarse]]). */
object StreamingAnnScore {

  /** Route each streamed vector (any schema with `qv: array<double>`)
    * to its nearest persisted coarse cell: adds `cell` and `csim`
    * (cosine to that centroid). Driver reads the index once at setup;
    * `expectEpoch` forwards to [[graft.operators.AnnIndex.requireEpoch]]
    * so a stream never silently serves a stale or re-parameterized
    * index. */
  def nearestCell(queries: DataFrame, idxDir: String,
                  expectEpoch: Map[String, String] = Map.empty): DataFrame = {
    val s = queries.sparkSession
    if (expectEpoch.nonEmpty)
      graft.operators.AnnIndex.requireEpoch(s, idxDir, expectEpoch)
    val cents = graft.operators.AnnIndex.loadCoarseCentroids(s, idxDir)
      .select(col("cell"), col("cv"), col("cn")).collect()
      .map(r => (r.getAs[Number](0).intValue(), r.getSeq[Double](1).toArray,
        r.getDouble(2)))
      .sortBy(_._1)
    require(cents.nonEmpty,
      s"no coarse centroids in the index at $idxDir — build it with " +
        "CALL build_ann_index (kind 'ivf' or 'ivfpq') first")
    val centArr: Column = array(cents.map { case (cell, cv, cn) =>
      struct(lit(cell).as("cell"), typedLit(cv.toSeq).as("cv"), lit(cn).as("cn"))
    }: _*)
    val qn = sqrt(vector_dot(col("qv"), col("qv")))
    val init = struct(lit(-1).as("cell"),
      lit(Double.NegativeInfinity).as("csim"))
    val best = aggregate(centArr, init, (acc, c) => {
      val csim = vector_dot(col("qv"), c.getField("cv")) /
        (qn * c.getField("cn"))
      when(csim > acc.getField("csim"),
        struct(c.getField("cell").cast("int").as("cell"), csim.as("csim")))
        .otherwise(acc)
    })
    queries.withColumn("_best", best)
      .withColumn("cell", col("_best.cell"))
      .withColumn("csim", col("_best.csim"))
      .drop("_best")
  }
}
