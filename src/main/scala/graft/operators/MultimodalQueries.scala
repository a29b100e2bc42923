package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing: media payloads ride as opaque `binary`
  * columns with a typed metadata struct alongside.
  * [[graft.operators.Multimodal.decode]] reads REAL image headers for
  * the JDK-shipped formats (PNG/JPEG/BMP/GIF via javax.imageio); these
  * oracle queries use text payloads (non-image by construction), so the
  * oracle-visible dimensions come from the documented length-derived
  * fallback on both sides — see MultimodalSpec for the real decodes.
  */
object MultimodalQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Binary payload + deterministic fake feature-extraction metadata.
    "q_multimodal_meta" -> ((s, d) => {
      Multimodal.withMeta(
          Tables.documents(s, d).select(col("doc_id"),
            col("text").cast("binary").as("payload")))
        .select(col("doc_id"), col("meta.byte_len").as("byte_len"),
          col("meta.width").as("width"), col("meta.height").as("height"),
          col("meta.frames").as("frames"))
        .orderBy("doc_id")
    }),
    // Frame-sampling fan-out: every 10th frame of each "video" payload,
    // with 25fps timestamps — the narrow pre-decoder transform.
    "q_multimodal_frames" -> ((s, d) => {
      Multimodal.sampleFrames(
          Tables.documents(s, d).select(col("doc_id"),
            col("text").cast("binary").as("payload")),
          every = 10)
        .orderBy("doc_id", "frame_idx")
    })
  )

  def oracles: Map[String, String] = Map(
    "q_multimodal_meta" ->
      """SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
                CAST(64 + (octet_length(encode(text)) * 7) % 1216 AS BIGINT) AS width,
                CAST(64 + (octet_length(encode(text)) * 13) % 656 AS BIGINT) AS height,
                CAST(1 + octet_length(encode(text)) % 30 AS BIGINT) AS frames
         FROM documents ORDER BY doc_id""",
    "q_multimodal_frames" ->
      """SELECT doc_id, frame_idx, frame_idx * 40 AS frame_ts_ms FROM (
           SELECT doc_id,
                  unnest(range(0, CAST(1 + octet_length(encode(text)) % 30 AS BIGINT), 10)) AS frame_idx
           FROM documents)
         ORDER BY doc_id, frame_idx"""
  )
}
