package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming deduplication — the streaming twin of the batch dedup family
  * (q_dedup_docs / q_dedup_minhash): drop re-arriving documents as data
  * streams in, instead of a full-corpus batch groupBy.
  *
  * The reference is batch-only MR (SURVEY.md §2.6 — no streaming
  * analogue); this is north-star capability for a continuously-ingesting
  * training-data pipeline. Both shapes use Spark's streaming
  * `dropDuplicates*` state store, which scales with the number of
  * *distinct keys inside the watermark horizon*, not total history —
  * the only state bound that survives at 100 TB/day ingest.
  */
object StreamingDedup {

  /** Exact streaming dedup on a content digest. `docs` must carry
    * (doc_id, text, ts: timestamp). `dropDuplicatesWithinWatermark`
    * keeps a digest's state only until the watermark passes it, so a
    * duplicate arriving within `watermark` of the original is dropped
    * and state is evicted afterwards (unbounded-history dedup would OOM
    * any finite cluster; bounded-horizon dedup is the scale contract). */
  def exactDedup(docs: DataFrame, watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("content_h", md5(col("text")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("content_h")

  /** Near-dup streaming suppression via the 1-permutation min-shingle
    * fingerprint (same hash as batch q_fingerprint): documents whose
    * min-shingle hash collides within the watermark horizon are treated
    * as near-duplicates and only the first survives. Coarser than batch
    * MinHash-LSH banding (one permutation, not 64) — the streaming
    * stage is a cheap pre-filter; full LSH runs in the batch layer. */
  def nearDedup(docs: DataFrame, shingleN: Int, watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("shingle_fp",
        coalesce(graft.functions.TextExpressions.min_shingle_hash(col("text"), shingleN),
          // short texts (< n tokens) fall back to exact-content identity
          md5(col("text"))))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("shingle_fp")
}
