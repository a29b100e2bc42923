package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks natively: point-in-time (as-of)
  * join and interval-containment (range) join. Both are built from
  * shuffle-minimal compositions of existing operators — no custom
  * SparkPlan needed, and no BroadcastNestedLoopJoin / CartesianProduct
  * anywhere in the executed plans (pinned by PlanQualitySpec).
  *
  * Scale notes:
  *  - [[asOf]] is the union–window formulation: ONE shuffle on the `by`
  *    keys, in-partition sort, no range-condition join (a naive
  *    `l.ts >= r.ts` join is a BNLJ that explodes quadratically in
  *    versions-per-key). State per task is one carried struct — constant
  *    memory per partition beyond the sort.
  *  - [[intervalJoinBucketed]] maps both sides onto coarse time buckets
  *    and equi-joins on the bucket with the containment predicate as a
  *    residual filter — the standard 100 TB range-join shape (a plain
  *    inequality join has no equi key and degenerates to BNLJ). Bucket
  *    width trades fan-out (an interval appears once per covered bucket)
  *    against candidates per bucket; pick it near the typical interval
  *    span.
  */
object TemporalJoins {

  /** As-of (point-in-time) join. `backward` (default): for each left row,
    * attach the right row with the greatest `rightTs` ≤ `leftTs` within
    * the same `by` group; `forward`: the smallest `rightTs` ≥ `leftTs`.
    * Both inclusive — a right row at exactly `leftTs` matches.
    * `toleranceMs` bounds the match distance (a farther match becomes a
    * miss, as in pandas `merge_asof`). Left rows with no match get
    * nulls. Right payload columns (everything except `by`) must not
    * clash with left column names; if several right rows share (`by`,
    * `rightTs`) the survivor is unspecified — dedupe the right side
    * first (e.g. aggregate per key+ts).
    */
  def asOf(left: DataFrame, right: DataFrame, by: Seq[String],
           leftTs: String, rightTs: String,
           direction: String = "backward",
           toleranceMs: Option[Long] = None): DataFrame = {
    val backward = direction match {
      case "backward" => true
      case "forward" => false
      case other => throw new IllegalArgumentException(
        s"asOf direction must be backward|forward, got $other")
    }
    val rPayload = right.columns.filterNot(by.contains).toSeq
    require(rPayload.nonEmpty, "right side has no payload columns")
    val clash = rPayload.toSet.intersect(left.columns.toSet)
    require(clash.isEmpty, s"right payload columns clash with left: $clash")
    val rStruct = struct(rPayload.map(col): _*)
    val l2 = left
      .withColumn("_ats", col(leftTs))
      .withColumn("_side", lit(1))
      .withColumn("_r", lit(null).cast(right.select(rStruct).schema.head.dataType))
    val r2 = right
      .withColumn("_ats", col(rightTs))
      .withColumn("_side", lit(0))
      .withColumn("_r", rStruct)
      .select((by ++ Seq("_ats", "_side", "_r")).map(col): _*)
    // backward walks time ascending, forward descending — either way the
    // running `last` right row is the nearest eligible one, and _side
    // orders right (0) before left (1) at equal timestamps → inclusive.
    val ord = if (backward) col("_ats").asc else col("_ats").desc
    val w = Window.partitionBy(by.map(col): _*)
      .orderBy(ord, col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = l2.unionByName(r2, allowMissingColumns = true)
      .withColumn("_m", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
    val withTol = toleranceMs match {
      case None => matched
      case Some(t) =>
        val dist = if (backward) col(leftTs) - col(s"_m.$rightTs")
        else col(s"_m.$rightTs") - col(leftTs)
        matched.withColumn("_m", when(dist <= t, col("_m"))) // else null: a miss
    }
    withTol.select(left.columns.map(col) ++ rPayload.map(c => col(s"_m.$c").as(c)): _*)
  }

  /** Join `points` to the disjoint `intervals` containing them
    * (`startCol ≤ posCol ≤ endCol`, all epoch-ms BIGINT). Intervals are
    * exploded onto every `bucketMs`-wide bucket they cover, points onto
    * their single bucket, and the join is an equi-join on the bucket with
    * the containment predicate as residual. Disjoint intervals ⇒ each
    * point matches at most one interval and each (interval, point) pair
    * meets in exactly one bucket, so no dedup is needed. Column sets of
    * the two inputs must be disjoint.
    */
  def intervalJoinBucketed(intervals: DataFrame, points: DataFrame,
                           startCol: String, endCol: String, posCol: String,
                           bucketMs: Long): DataFrame = {
    val iv = intervals.withColumn("_b",
      explode(sequence(expr(s"$startCol div $bucketMs"), expr(s"$endCol div $bucketMs"))))
    val pt = points.withColumn("_b", expr(s"$posCol div $bucketMs"))
    pt.join(iv, usingColumn = "_b")
      .filter(col(posCol) >= col(startCol) && col(posCol) <= col(endCol))
      .drop("_b")
  }
}
