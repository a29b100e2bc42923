package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column handling.
  *
  * Contract: media travels as an opaque `payload: binary` column; derived
  * metadata is a typed struct column `meta` computed either (a) by
  * codegen'd column expressions ([[withMeta]], cheap header-level fields) or
  * (b) by a per-partition batch decoder ([[decodePartitions]], the shape a
  * real decoder plugs into — one library init per partition, streaming over
  * rows, never materializing the partition).
  *
  * The actual pixel/sample decode requires native libs absent from this
  * container; [[decodeStub]] is the STUB — a deterministic fake keyed on
  * byte length so tests and the oracle can pin the plumbing end-to-end.
  * Swap it for a real JNI/FFM decoder without touching any Spark code.
  */
object Multimodal {

  final case class MediaMeta(byte_len: Int, width: Int, height: Int, frames: Int)
  final case class MediaRow(doc_id: Long, payload: Array[Byte])
  final case class DecodedRow(doc_id: Long, meta: MediaMeta)

  /** STUB decoder — deterministic fake of header parsing. A real
    * implementation would hand `payload` to an image/audio library; the
    * dimensions here are pure functions of the byte length so both the
    * ScalaTest specs and the DuckDB oracle can verify the plumbing. */
  def decodeStub(payload: Array[Byte]): MediaMeta = {
    val n = payload.length
    MediaMeta(n, 64 + (n * 7) % 1216, 64 + (n * 13) % 656, 1 + n % 30)
  }

  /** Column-expression metadata (codegen'd, stays in whole-stage codegen). */
  def withMeta(df: DataFrame): DataFrame = {
    val n = length(col("payload")).cast("long")
    df.withColumn("meta", struct(
      n.as("byte_len"),
      (lit(64L) + (n * 7) % 1216).as("width"),
      (lit(64L) + (n * 13) % 656).as("height"),
      (lit(1L) + n % 30).as("frames")))
  }

  /** Per-partition batch decode: the real-decoder integration point.
    * Initializes (stub) decoder state once per partition, then streams. */
  def decodePartitions(ds: Dataset[MediaRow]): Dataset[DecodedRow] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      // one-time per-partition decoder init would go here
      rows.map(r => DecodedRow(r.doc_id, decodeStub(r.payload)))
    }
  }

  /** Frame sampling: one row per every-`every`-th frame of each video
    * payload — the standard pre-processing fan-out before per-frame
    * feature extraction. Declarative (`sequence` + `explode`, codegen'd):
    * the fan-out itself never touches pixel data, so at 100 TB it's a
    * narrow transform and only the sampled frames reach the (expensive)
    * decoder downstream. `frame_ts_ms` assumes 25 fps (40 ms/frame). */
  def sampleFrames(df: DataFrame, every: Int): DataFrame =
    withMeta(df)
      .select(col("doc_id"),
        explode(sequence(lit(0L), col("meta.frames") - 1, lit(every.toLong)))
          .as("frame_idx"))
      .withColumn("frame_ts_ms", col("frame_idx") * 40)

  final case class FeatureRow(doc_id: Long, features: Array[Float])

  /** Per-partition batch feature extraction (the resize→embed shape): a
    * real implementation decodes + resizes + runs a vision encoder per
    * BATCH of rows (model weights loaded once per partition); the stub
    * derives a deterministic 8-dim vector from the byte length so the
    * batch shape is testable. */
  def extractFeatures(ds: Dataset[MediaRow], dim: Int = 8): Dataset[FeatureRow] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      // per-partition: decoder + model init would go here, then batched
      // inference over grouped rows
      rows.map { r =>
        val n = r.payload.length
        FeatureRow(r.doc_id,
          Array.tabulate(dim)(i => ((n.toLong * (i + 3)) % 997).toFloat / 997f))
      }
    }
  }
}
