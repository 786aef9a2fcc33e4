package graft.multimodal

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed media metadata carried alongside the opaque payload. */
final case class MediaMeta(
    mimeType: String,
    width: Int,
    height: Int,
    durationMs: Long)

/** One multimodal record: opaque `binary` payload + typed metadata —
  * the storage shape for image/audio/video columns at 100 TB (payload
  * stays an opaque blob in parquet; only metadata is queryable without
  * decoding). */
final case class MediaRecord(
    media_id: Long,
    kind: String,
    bytes: Array[Byte],
    meta: MediaMeta)

/** Output of the per-partition decode + feature-extract stage. */
final case class MediaFeatures(
    media_id: Long,
    kind: String,
    n_bytes: Long,
    luma_mean: Double,
    fingerprint: Long,
    out_width: Int,
    out_height: Int)

/** One sampled frame of a video-like payload. */
final case class SampledFrame(
    media_id: Long,
    frame_idx: Int,
    frame_md5: String)

/** Multimodal ingestion/feature pipeline.
  *
  * The container ships no image/audio codecs, so [[StubCodec]] is a
  * clearly-marked deterministic fake; everything AROUND it — the typed
  * schema, the per-partition batched decode (`mapPartitions`, the Scala
  * analog of `mapInPandas`: codec initialized once per partition, rows
  * streamed through), the resize rule, and the frame-sampling explode —
  * is the real plumbing a production pipeline would keep, with only the
  * codec call swapped.
  */
object MediaPipeline {

  /** ===== STUB CODEC =====
    * Production: javax.imageio / ffmpeg / soundfile behind this exact
    * interface. Here: deterministic arithmetic over the payload bytes so
    * the DuckDB oracle can verify the pipeline end-to-end. */
  object StubCodec {
    final case class Decoded(lumaMean: Double, fingerprint: Long)

    /** "Decode" a payload: mean unsigned-byte value plays luma; a
      * polynomial byte fold plays the perceptual hash. */
    def decode(bytes: Array[Byte]): Decoded = {
      var sum = 0L
      var fp = 0L
      var i = 0
      while (i < bytes.length) {
        val b = bytes(i) & 0xff
        sum += b
        fp = (fp * 131 + b) % 1000000007L
        i += 1
      }
      Decoded(if (bytes.isEmpty) 0.0 else sum.toDouble / bytes.length, fp)
    }
  }

  val FrameBytes  = 32 // video-like payloads: fixed-size frame stride
  val FrameStride = 4  // sample every 4th frame
  val MaxDim      = 64 // resize: clamp the longest edge

  /** Derive the media table from `documents` (payload = UTF-8 text
    * bytes; deterministic fake dimensions — the data generator ships no
    * real binary column). */
  def load(spark: SparkSession, sfDir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    val kind = element_at(array(lit("image"), lit("audio"), lit("video")),
      (col("doc_id") % 3 + 1).cast("int"))
    Tables.documents(spark, sfDir)
      .select(
        col("doc_id").as("media_id"),
        kind.as("kind"),
        encode(col("text"), "UTF-8").as("bytes"),
        struct(
          concat(lit("application/x-graft-"), kind).as("mimeType"),
          (lit(16) + col("doc_id") % 113).cast("int").as("width"),
          (lit(16) + col("doc_id") % 71).cast("int").as("height"),
          (col("n_chars") * 10).as("durationMs")).as("meta"))
      .as[MediaRecord]
  }

  /** Keep-aspect resize rule: clamp the longest edge to [[MaxDim]]
    * using exact integer arithmetic (portable to the SQL oracle). */
  def resizeDims(w: Int, h: Int): (Int, Int) = {
    val m = math.max(w, h)
    if (m <= MaxDim) (w, h)
    else (w * MaxDim / m, h * MaxDim / m)
  }

  /** Decode + feature-extract, batched per partition: the codec is
    * initialized once per partition and rows stream through it — the
    * `mapInPandas` batch shape, executor-side only, no driver traffic. */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      val codec = StubCodec // per-partition codec init happens here
      batch.map { m =>
        val d = codec.decode(m.bytes)
        val (ow, oh) = resizeDims(m.meta.width, m.meta.height)
        MediaFeatures(m.media_id, m.kind, m.bytes.length.toLong,
          d.lumaMean, d.fingerprint, ow, oh)
      }
    }
  }

  /** Frame sampling for video-like payloads: split the byte stream into
    * fixed [[FrameBytes]] strides, keep every [[FrameStride]]-th frame,
    * fingerprint each. flatMap ⇒ one output row per sampled frame. */
  def sampleFrames(media: Dataset[MediaRecord]): Dataset[SampledFrame] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      val nFrames = (m.bytes.length + FrameBytes - 1) / FrameBytes
      (0 until nFrames by FrameStride).map { idx =>
        val from = idx * FrameBytes
        val until = math.min(from + FrameBytes, m.bytes.length)
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(java.util.Arrays.copyOfRange(m.bytes, from, until))
        SampledFrame(m.media_id, idx, md.map("%02x".format(_)).mkString)
      }
    }
  }

  /** Metadata-only scan: no decode — at scale this must NOT read the
    * payload column (verified via ReadSchema in explain). */
  def metadataSummary(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    load(spark, sfDir)
      .select(col("media_id"), col("kind"), col("meta.width"), col("meta.height"),
        col("meta.durationMs").as("duration_ms"))
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n_media"),
        sum(col("width").cast("long")).as("sum_width"),
        sum(col("duration_ms")).as("sum_duration_ms"))
      .orderBy(col("kind"))
  }
}
