package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column handling.
  *
  * Contract: media travels as an opaque `payload: binary` column; derived
  * metadata is a typed struct column `meta` computed either (a) by
  * codegen'd column expressions ([[withMeta]], cheap length-derived
  * fields for payloads known to be non-image) or (b) by a per-partition
  * batch decoder ([[decodePartitions]] → [[decode]], real header decode —
  * one decoder init per partition, streaming over rows, never
  * materializing the partition).
  *
  * [[decode]] is REAL for the formats the JDK ships readers for:
  * images (PNG/JPEG/BMP/GIF/WBMP via `javax.imageio`, header-only —
  * pixels are never decoded) and audio containers (WAV/AIFF/AU/SND via
  * `javax.sound.sampled`, header-only — sample data is never read);
  * `meta.kind` says which decoder spoke. Payloads no installed reader
  * recognizes — video containers and arbitrary bytes; those codecs need
  * native libs absent from this container — fall back to [[decodeStub]],
  * a clearly-marked deterministic fake keyed on byte length so tests and
  * the DuckDB oracle can pin the plumbing end-to-end. Swap the fallback
  * for a real JNI/FFM video decoder without touching any Spark code.
  */
object Multimodal {

  /** Modality-neutral header metadata. `kind` says which decoder spoke:
    * "image" (width/height in pixels, frames = container images),
    * "audio" (width = sample rate Hz, height = channels, frames =
    * sample frames — the audio analogue of pixel dimensions), or
    * "opaque" (the deterministic stub fields). */
  final case class MediaMeta(byte_len: Int, width: Int, height: Int, frames: Int,
                             kind: String = "image")
  final case class MediaRow(doc_id: Long, payload: Array[Byte])
  final case class DecodedRow(doc_id: Long, meta: MediaMeta)

  /** STUB decoder — deterministic fake of header parsing, used only for
    * payloads [[decode]] finds no JDK image or audio reader for (video
    * and junk bytes). Pure function of the byte length so both the
    * ScalaTest specs and the DuckDB oracle can verify the plumbing. */
  def decodeStub(payload: Array[Byte]): MediaMeta = {
    val n = payload.length
    MediaMeta(n, 64 + (n * 7) % 1216, 64 + (n * 13) % 656, 1 + n % 30, "opaque")
  }

  /** REAL audio header decode via the JDK's `javax.sound.sampled` (pure
    * JVM): WAV/AIFF/AU/SND headers parse without touching sample data.
    * None = not an audio container this JVM recognizes. */
  private def decodeAudio(payload: Array[Byte]): Option[MediaMeta] =
    try {
      val fmt = javax.sound.sampled.AudioSystem.getAudioFileFormat(
        new java.io.ByteArrayInputStream(payload))
      val af = fmt.getFormat
      val frames = fmt.getFrameLength
      Some(MediaMeta(payload.length,
        math.round(af.getSampleRate), math.max(af.getChannels, 0),
        if (frames >= 0) frames else 0, "audio"))
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => None
      case _: java.io.IOException => None
    }

  /** REAL header decode via the JDK's `javax.imageio` (pure JVM, no
    * native libs): for any payload a shipped reader recognizes
    * (PNG/JPEG/BMP/GIF/WBMP), width/height are read from the image
    * header WITHOUT decoding pixels, and frames counts the container's
    * images (multi-frame GIFs report their true frame count; single-image
    * formats report 1). Unrecognized or corrupt payloads fall back to
    * the deterministic stub — decode never throws on arbitrary bytes,
    * the property a 100 TB ingest of scraped media needs. */
  def decode(payload: Array[Byte]): MediaMeta = {
    val n = payload.length
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    if (iis == null) return decodeAudio(payload).getOrElse(decodeStub(payload))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext)
        decodeAudio(payload).getOrElse(decodeStub(payload))
      else {
        val r = readers.next()
        try {
          r.setInput(iis)
          val w = r.getWidth(0)
          val h = r.getHeight(0)
          // allowSearch: the payload is an in-memory buffer, so counting a
          // GIF's frames is a bounded header walk, not real IO
          val frames = try r.getNumImages(true) catch {
            case _: java.io.IOException => -1
          }
          MediaMeta(n, w, h, if (frames > 0) frames else 1, "image")
        } finally r.dispose()
      }
    } catch {
      case _: java.io.IOException | _: RuntimeException =>
        decodeAudio(payload).getOrElse(decodeStub(payload))
    } finally iis.close()
  }

  /** Column-expression metadata (codegen'd, stays in whole-stage
    * codegen) — the cheap tier for payloads KNOWN non-image (documents,
    * synthetic fixtures), where the length-derived stub fields apply.
    * Image payloads belong on [[decodePartitions]], which decodes real
    * headers. */
  def withMeta(df: DataFrame): DataFrame = {
    val n = length(col("payload")).cast("long")
    df.withColumn("meta", struct(
      n.as("byte_len"),
      (lit(64L) + (n * 7) % 1216).as("width"),
      (lit(64L) + (n * 13) % 656).as("height"),
      (lit(1L) + n % 30).as("frames"),
      lit("opaque").as("kind")))
  }

  /** Per-partition batch decode through [[decode]]: real image headers,
    * stub fallback for everything else. */
  def decodePartitions(ds: Dataset[MediaRow]): Dataset[DecodedRow] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      // one-time per-partition decoder state (javax.imageio registry is
      // JVM-global; a native decoder would init here)
      rows.map(r => DecodedRow(r.doc_id, decode(r.payload)))
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
