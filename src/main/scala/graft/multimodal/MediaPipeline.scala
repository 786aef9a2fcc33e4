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

/** Output of the per-partition decode + feature-extract stage.
  * `luma_mean`/`fingerprint` come from the stub codec (pixel-domain
  * stand-ins); `distinct_bytes`/`ioc`/`printable_ratio`/`format` are
  * REAL statistics of the actual payload bytes ([[MediaPipeline.ByteStats]]). */
final case class MediaFeatures(
    media_id: Long,
    kind: String,
    n_bytes: Long,
    luma_mean: Double,
    fingerprint: Long,
    distinct_bytes: Int,
    ioc: Double,
    printable_ratio: Double,
    format: String,
    out_width: Int,
    out_height: Int)

/** One sampled frame of a video-like payload. */
final case class SampledFrame(
    media_id: Long,
    frame_idx: Int,
    frame_md5: String)

/** One chromaprint-style audio sub-fingerprint (packed band-energy
  * derivative bits over [[MediaPipeline.AudioPackFrames]] consecutive
  * frame transitions). */
final case class AudioSubFp(
    media_id: Long,
    kind: String,
    subfp: Long)

/** One audio frame's total energy (unsigned-byte sum over one
  * [[MediaPipeline.AudioFrameBytes]] frame). */
final case class AudioFrame(
    media_id: Long,
    frame_idx: Int,
    energy: Long)

/** An image's 64-bit aHash as 8 bands of 8 bits (banded for the d06
  * pigeonhole candidate generation; the full hash is the bands'
  * concatenation). */
final case class ImageAHash(
    media_id: Long,
    bands: Seq[Long])

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

  /** ===== REAL byte-level analysis (NOT a stub) =====
    * Statistics computed from the actual payload bytes — no codec
    * needed, meaningful on any blob, and the first triage a 100 TB
    * media-ingest pipeline runs before spending decode CPU:
    *
    *  - '''index of coincidence''' `Σ cᵢ(cᵢ−1) / n(n−1)` over the byte
    *    histogram — the exact-integer cousin of Shannon entropy
    *    (compressed/encrypted payloads ≈ 1/256; text ≈ 0.04-0.07).
    *    Chosen over `−Σ p log₂ p` deliberately: the numerator and
    *    denominator are exact integers with ONE deterministic double
    *    division, where log₂ would hash-diverge from the oracle by a
    *    ulp (libm vs JVM);
    *  - '''printable ratio''' — fraction of bytes in [0x20, 0x7E]:
    *    text-vs-binary triage;
    *  - '''distinct byte values''' — degenerate-payload detector;
    *  - '''container sniffing''' from magic bytes (JPEG SOI, PNG, GIF,
    *    RIFF) — public file-format knowledge; the honest answer on
    *    these text-derived payloads is "unknown", and the detector
    *    still runs for real on every byte array.
    */
  object ByteStats {
    final case class Stats(
        distinctBytes: Int, ioc: Double, printableRatio: Double, format: String)

    def analyze(bytes: Array[Byte]): Stats = {
      val hist = new Array[Long](256)
      var printable = 0L
      var i = 0
      while (i < bytes.length) {
        val b = bytes(i) & 0xff
        hist(b) += 1
        if (b >= 0x20 && b <= 0x7e) printable += 1
        i += 1
      }
      var distinct = 0
      var coll = 0L
      var j = 0
      while (j < 256) {
        val c = hist(j)
        if (c > 0) distinct += 1
        coll += c * (c - 1)
        j += 1
      }
      val n = bytes.length.toLong
      Stats(
        distinct,
        if (n < 2) 0.0 else coll.toDouble / (n * (n - 1)).toDouble,
        if (n == 0) 0.0 else printable.toDouble / n,
        sniff(bytes))
    }

    /** Magic-byte container detection (SOI `FF D8 FF`, PNG `89 50 4E
      * 47`, GIF `47 49 46 38`, RIFF `52 49 46 46`). */
    def sniff(b: Array[Byte]): String = {
      def u(i: Int) = b(i) & 0xff
      if (b.length >= 3 && u(0) == 0xFF && u(1) == 0xD8 && u(2) == 0xFF) "jpeg"
      else if (b.length >= 4 && u(0) == 0x89 && u(1) == 0x50 && u(2) == 0x4E && u(3) == 0x47) "png"
      else if (b.length >= 4 && u(0) == 0x47 && u(1) == 0x49 && u(2) == 0x46 && u(3) == 0x38) "gif"
      else if (b.length >= 4 && u(0) == 0x52 && u(1) == 0x49 && u(2) == 0x46 && u(3) == 0x46) "riff"
      else "unknown"
    }
  }

  val FrameBytes  = 32 // video-like payloads: fixed-size frame stride
  val FrameStride = 4  // sample every 4th frame
  val MaxDim      = 64 // resize: clamp the longest edge

  /** Derive the media table from `documents` (payload = UTF-8 text
    * bytes; deterministic fake dimensions — the data generator ships no
    * real binary column). */
  def load(spark: SparkSession, sfDir: String): Dataset[MediaRecord] =
    loadFrom(spark, Tables.documents(spark, sfDir))

  /** [[load]] over an arbitrary documents-shaped frame (doc_id, text,
    * n_chars, …) — the seam streaming arrival specs drive with a
    * micro-batch instead of the table scan. Same projection, so batch
    * and per-batch media rows are identical by construction. */
  def loadFrom(spark: SparkSession, docs: org.apache.spark.sql.DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    val kind = element_at(array(lit("image"), lit("audio"), lit("video")),
      (col("doc_id") % 3 + 1).cast("int"))
    docs
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
        val b = ByteStats.analyze(m.bytes) // real stats, actual bytes
        val (ow, oh) = resizeDims(m.meta.width, m.meta.height)
        MediaFeatures(m.media_id, m.kind, m.bytes.length.toLong,
          d.lumaMean, d.fingerprint,
          b.distinctBytes, b.ioc, b.printableRatio, b.format, ow, oh)
      }
    }
  }

  /** Frame sampling for video-like payloads: split the byte stream into
    * fixed [[FrameBytes]] strides, keep every [[FrameStride]]-th frame,
    * fingerprint each. flatMap ⇒ one output row per sampled frame. */
  def sampleFrames(media: Dataset[MediaRecord]): Dataset[SampledFrame] = {
    import media.sparkSession.implicits._
    // Column filter, not a typed lambda: Catalyst pushes it below the
    // record projection, so non-video rows never encode their payload
    // or deserialize into MediaRecord objects (the kind predicate folds
    // to a doc_id expression at the scan).
    media.filter(col("kind") === "video").flatMap { m =>
      // One digest instance per RECORD, reset per frame: getInstance
      // inside the frame loop would pay a JCA provider lookup +
      // allocation per 32-byte slice (~8k lookups per MB of video),
      // dwarfing the hashing itself.
      val digest = java.security.MessageDigest.getInstance("MD5")
      val nFrames = (m.bytes.length + FrameBytes - 1) / FrameBytes
      (0 until nFrames by FrameStride).map { idx =>
        val from = idx * FrameBytes
        val until = math.min(from + FrameBytes, m.bytes.length)
        digest.reset()
        digest.update(m.bytes, from, until - from)
        SampledFrame(m.media_id, idx, digest.digest().map("%02x".format(_)).mkString)
      }
    }
  }

  val AudioFrameBytes = 64 // audio fingerprint: bytes per frame
  val AudioBands      = 8  // energy bands per frame (8 bytes each)
  val AudioPackFrames = 4  // frame transitions packed per sub-fingerprint
  val MinAudioBytes   = AudioFrameBytes * 6 // >= 2 sub-fingerprints

  /** Chromaprint-style audio-track sub-fingerprints over the
    * stub-decoded byte stream — the Haitsma-Kalker construction in
    * exact integer arithmetic: the stream splits into
    * [[AudioFrameBytes]] frames, each frame yields [[AudioBands]] band
    * "energies" (unsigned-byte sums — the stub codec's stand-in for
    * FFT band magnitudes), each frame TRANSITION yields one bit per
    * band (1 iff the band's energy rose — the sign-of-derivative rule
    * real audio fingerprinters quantize with, robust to volume/offset
    * changes), and [[AudioPackFrames]] consecutive transitions pack
    * into one 32-bit sub-fingerprint. Matching is position-independent
    * (a trimmed or re-containered copy still shares sub-fingerprints).
    *
    * Runs over audio files AND video soundtracks — the cross-media
    * case (an audio rip of a video) is what audio fingerprinting
    * exists for; the "demux audio track" step is the stub (payload
    * bytes pass through), everything downstream is the real pipeline.
    * Same per-partition batch shape as [[extractFeatures]]; payloads
    * die at this projection — only (media_id, kind, subfp) rows ever
    * shuffle (the d10/m05 property). */
  def audioSubFingerprints(media: Dataset[MediaRecord]): Dataset[AudioSubFp] = {
    import media.sparkSession.implicits._
    // Column filter (see sampleFrames): image rows never decode.
    media.filter(col("kind").isin("audio", "video")).flatMap { m =>
      val n = m.bytes.length
      if (n < MinAudioBytes) Iterator.empty
      else {
        val nFrames = n / AudioFrameBytes
        val bandBytes = AudioFrameBytes / AudioBands
        val e = Array.ofDim[Long](nFrames, AudioBands)
        var f = 0
        while (f < nFrames) {
          var b = 0
          while (b < AudioBands) {
            val off = f * AudioFrameBytes + b * bandBytes
            var s = 0L
            var j = 0
            while (j < bandBytes) { s += m.bytes(off + j) & 0xff; j += 1 }
            e(f)(b) = s
            b += 1
          }
          f += 1
        }
        val nTrans = nFrames - 1
        val bits = new Array[Long](nTrans)
        var t = 0
        while (t < nTrans) {
          var bv = 0L
          var b = 0
          while (b < AudioBands) { if (e(t + 1)(b) > e(t)(b)) bv |= 1L << b; b += 1 }
          bits(t) = bv
          t += 1
        }
        (0 to nTrans - AudioPackFrames).iterator.map { i =>
          AudioSubFp(m.media_id, m.kind,
            bits(i) | (bits(i + 1) << 8) | (bits(i + 2) << 16) | (bits(i + 3) << 24))
        }
      }
    }
  }

  /** Per-frame total energy of an audio-bearing payload — the
    * [[AudioFrameBytes]] framing [[audioSubFingerprints]] uses, but
    * the raw per-frame energy (unsigned-byte sum over the whole frame)
    * instead of the band-derivative bits: the signal VAD-style
    * silence/activity segmentation thresholds on (m12). Exact integer
    * arithmetic; payloads die at this projection. */
  def audioFrameEnergies(media: Dataset[MediaRecord]): Dataset[AudioFrame] = {
    import media.sparkSession.implicits._
    // Column filter (see sampleFrames): image rows never decode.
    media.filter(col("kind").isin("audio", "video")).flatMap { m =>
      val nFrames = m.bytes.length / AudioFrameBytes
      (0 until nFrames).iterator.map { f =>
        var s = 0L
        var j = f * AudioFrameBytes
        val end = j + AudioFrameBytes
        while (j < end) { s += m.bytes(j) & 0xff; j += 1 }
        AudioFrame(m.media_id, f, s)
      }
    }
  }

  val AHashBlocks = 64 // aHash grid: 64 block-mean bits (the classic 8x8)
  val AHashBands  = 8  // 8 bands x 8 bits — pigeonhole-complete for hamming <= 7

  /** Average-hash (aHash) perceptual fingerprint over the stub-decoded
    * byte stream — the classic 8×8 block-mean construction in EXACT
    * integer arithmetic: the stream splits into [[AHashBlocks]] blocks
    * (boundaries `floor(n·b/64)` — exact for any length), and bit b is
    * 1 iff the block's mean exceeds the global mean, evaluated as the
    * cross-multiplication `block_sum·n > total_sum·block_len` so no
    * division ever rounds. Bits pack into [[AHashBands]] 8-bit bands
    * (never one 64-bit value: bit 63 would set the BIGINT sign, and
    * the band form is what the d06-style pigeonhole candidate join
    * needs anyway — any pair at hamming ≤ 7 shares at least one band
    * exactly). Same per-partition batch shape as [[extractFeatures]];
    * only (media_id, 8×8-byte bands) rows ever leave the projection. */
  def imageAHash(media: Dataset[MediaRecord]): Dataset[ImageAHash] = {
    import media.sparkSession.implicits._
    // Column filter (see sampleFrames); length(binary) is the byte
    // count, identical to the lambda's m.bytes.length test.
    media.filter(col("kind") === "image" &&
        length(col("bytes")) >= AHashBlocks).map { m =>
      val n = m.bytes.length.toLong
      var tsum = 0L
      var i = 0
      while (i < m.bytes.length) { tsum += m.bytes(i) & 0xff; i += 1 }
      val bands = new Array[Long](AHashBands)
      var b = 0
      while (b < AHashBlocks) {
        val from = (n * b / AHashBlocks).toInt
        val until = (n * (b + 1) / AHashBlocks).toInt
        var bsum = 0L
        var j = from
        while (j < until) { bsum += m.bytes(j) & 0xff; j += 1 }
        // BigInt: the Long products overflow for payloads past
        // ~1.5 GiB (tsum·blen ≈ 4n²), silently flipping bits; 64
        // BigInt compares per image are noise next to summing the
        // payload. The SQL twin's BIGINT multiply would instead error
        // loudly there — wrong-bits is the failure mode to prevent.
        if (BigInt(bsum) * n > BigInt(tsum) * (until - from))
          bands(b / 8) |= 1L << (b % 8)
        b += 1
      }
      ImageAHash(m.media_id, bands.toSeq)
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
