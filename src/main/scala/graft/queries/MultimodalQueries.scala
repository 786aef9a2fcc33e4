package graft.queries

import graft.{QueryDef, Tables}
import graft.multimodal.MediaPipeline
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-facing queries over the multimodal pipeline. The decode step
  * is the deterministic [[graft.multimodal.MediaPipeline.StubCodec]]
  * (container ships no codecs), so the full plumbing — typed schema,
  * per-partition batched decode, resize arithmetic, frame-sampling
  * flatMap — is oracle-verified end-to-end in DuckDB.
  */
object MultimodalQueries {

  private val kindDuck = "['image','audio','video'][CAST(doc_id % 3 + 1 AS INT)]"

  private def mediaFeatures(s: SparkSession, dir: String): DataFrame =
    MediaPipeline.extractFeatures(MediaPipeline.load(s, dir))
      .toDF()
      .orderBy(col("media_id"))

  private def frameSample(s: SparkSession, dir: String): DataFrame =
    MediaPipeline.sampleFrames(MediaPipeline.load(s, dir))
      .toDF()
      .orderBy(col("media_id"), col("frame_idx"))

  /** m04: token accounting for multimodal training data — the budget
    * input every mixed-modality mix plan needs. Estimated tokens per
    * record from METADATA alone (ViT-style 14px patches for images,
    * 80 ms/token audio, 1 fps × 28px patches for video), so the scan
    * never touches the payload column (the m03 pruning property), and
    * all arithmetic is exact integer ceil-division. */
  /** THE modality token estimator (ViT 14px patches / 80 ms audio
    * tokens / 1 fps × 28px video patches) — ONE definition for the m04
    * budget and the m13 curation card, over a `MediaPipeline.load`
    * frame (the d15/d16 no-drift rule). SQL `div`, not Column `/`:
    * `/` on longs is IEEE double division plus a truncating cast —
    * exact only below 2^53; `div` is true integer division at any
    * magnitude, matching the DuckDB twin's `//`. */
  private def estTokensCol: org.apache.spark.sql.Column =
    when(col("kind") === "image",
        expr("(CAST(meta.width AS BIGINT) + 13) div 14") *
        expr("(CAST(meta.height AS BIGINT) + 13) div 14"))
      .when(col("kind") === "audio", expr("(meta.durationMs + 79) div 80"))
      .otherwise(expr("(meta.durationMs + 999) div 1000") *
        expr("(CAST(meta.width AS BIGINT) + 27) div 28") *
        expr("(CAST(meta.height AS BIGINT) + 27) div 28"))

  /** DuckDB twin of [[estTokensCol]], over (kind, w, h, dur) columns —
    * spliced by the m04 and m13 oracles so the two cannot drift. */
  private val estTokensDuck = """CASE kind
            WHEN 'image' THEN ((w + 13) // 14) * ((h + 13) // 14)
            WHEN 'audio' THEN (dur + 79) // 80
            ELSE ((dur + 999) // 1000) * ((w + 27) // 28) * ((h + 27) // 28)
          END"""

  private def mediaTokenBudget(s: SparkSession, dir: String): DataFrame = {
    MediaPipeline.load(s, dir).toDF()
      .select(col("kind"), estTokensCol.as("est_tokens"))
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n_media"),
        sum(col("est_tokens")).as("sum_tokens"),
        max(col("est_tokens")).as("max_tokens"))
      .orderBy(col("kind"))
  }

  /** m05: cross-video duplicate-frame detection — the multimodal dedup
    * pass: near-identical videos (re-uploads, trims, watermarked copies)
    * share exact sampled-frame fingerprints even when their containers
    * differ byte-wise, so "how many of my frames appear in other media"
    * is the standard video near-dup signal.
    *
    * Scale shape: frames reduce to (media_id, digest) rows at the
    * sampling projection — payloads never shuffle. The per-media
    * DISTINCT collapses within-video repeats (static scenes, memoized
    * so the shared-set aggregate and the flag join read one build);
    * cross-media membership is an aggregate + join, not a
    * count-over-digest window (r14, the d10 conversion): an intro
    * frame shared by O(corpus) re-uploads made the window's one-task
    * partition unbounded, while the count partial-combines, the ≥2
    * shared set stays linear in dup mass (never broadcast-hinted),
    * and the left join back is AQE-skew-splittable. The rollup is the
    * last shuffle. */
  /** The sample→project→distinct frame pipeline over an arbitrary
    * media source — ONE definition (the shared-build rule) serving the
    * memoized full-corpus build below AND m14's filtered ingest slice,
    * so the probe and the index it joins cannot drift in shape. */
  private[queries] def framesOf(
      media: org.apache.spark.sql.Dataset[graft.multimodal.MediaRecord]): DataFrame =
    MediaPipeline.sampleFrames(media).toDF()
      .select(col("media_id"), col("frame_md5")).distinct()

  /** Distinct (media_id, frame_md5) rows, memoized per session — the
    * ONE decode+sample pass m05 and the m14 INDEX BUILD both read. */
  private[queries] def distinctFrames(s: SparkSession, dir: String): DataFrame =
    PersistedAggregates.memo(s, "m05_frames", dir) {
      framesOf(MediaPipeline.load(s, dir))
    }

  private[queries] def frameDedup(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DoubleType
    val frames = distinctFrames(s, dir)
    graft.operators.KeyedCounts.flagRepeated(frames, "frame_md5")
      .groupBy(col("media_id"))
      .agg(count(lit(1)).as("n_frames"),
        count(col("__dup")).as("n_shared_frames"))
      .filter(col("n_shared_frames") > 0)
      .select(col("media_id"), col("n_frames"), col("n_shared_frames"),
        round(col("n_shared_frames").cast(DoubleType) / col("n_frames"), 4).as("shared_ratio"))
      .orderBy(col("media_id"))
  }

  /** The materialized frame-digest index m14 probes: (frame_md5 →
    * canonical base media id), disk-materialized per source
    * fingerprint — the lookup table a media-dedup service keeps
    * between ingest batches, so arriving videos are checked without
    * re-decoding or re-hashing the base corpus (the d22/a39/s23
    * lifecycle discipline applied to the media modality). */
  private[graft] def frameIndexBase(s: SparkSession, dir: String): DataFrame =
    PersistedAggregates.diskMemo(s, "m14_frame_index", dir) {
      distinctFrames(s, dir)
        .filter(col("media_id") % 10 =!= 0)
        .groupBy(col("frame_md5")).agg(min(col("media_id")).as("idx_media"))
        .sortWithinPartitions(col("frame_md5")) // §6 write layout (r19)
    }

  /** m14: INCREMENTAL media dedup — d22's arrival pattern on the video
    * modality: the new batch (media_id % 10 == 0, the d09 convention)
    * is decoded and frame-sampled fresh, its frame digests probed
    * against [[frameIndexBase]], and each arriving video gets the
    * routing row (frames hit, majority-overlap drop flag, canonical
    * index media). Decode/hash work at each arrival is O(ingest); the
    * base corpus is touched only through the digest→keeper index. */
  private[queries] def incrementalFrameDedup(s: SparkSession, dir: String): DataFrame =
    // NOT the session memo: the arrival path's O(ingest) contract
    // requires the % 10 slice filter to reach the scan, and a filter
    // cannot prune an InMemoryRelation built over the full corpus — a
    // memoized read would decode the 90% base slice on first call
    // (r15 review). The filter is applied to load's output BEFORE the
    // typed sampling boundary: Catalyst cannot push a predicate
    // through SerializeFromObject/MapPartitions (second review pass
    // caught a post-sampling filter silently decoding the full
    // corpus), but below the typed ops it reaches the documents scan,
    // so only ingest media deserialize and hash. Plan-pinned.
    probeFrameIndex(s, dir,
      MediaPipeline.load(s, dir).filter(col("media_id") % 10 === 0))

  /** The m14 probe path over an ARBITRARY arrival slice of media
    * records — the seam `StreamingFrameDedupSpec` drives per
    * micro-batch. Per-media verdicts depend only on the slice's own
    * frames and the (fixed) digest→keeper index, so any partition of
    * the arrival set probed batch-by-batch unions to the one-shot
    * result — the a39/d22 batch≡streaming property, here for the
    * media modality. */
  private[graft] def probeFrameIndex(s: SparkSession, dir: String,
      ingestMedia: org.apache.spark.sql.Dataset[graft.multimodal.MediaRecord]): DataFrame = {
    import org.apache.spark.sql.types.DoubleType
    val ing = framesOf(ingestMedia)
    ing.join(frameIndexBase(s, dir), Seq("frame_md5"), "left")
      .groupBy(col("media_id"))
      .agg(count(lit(1)).as("n_frames"),
        sum(when(col("idx_media").isNotNull, 1L).otherwise(0L)).as("n_hit"),
        min(col("idx_media")).as("index_media"))
      .select(col("media_id"), col("n_frames"),
        col("n_hit").as("n_frames_in_index"),
        round(col("n_hit").cast(DoubleType) / col("n_frames"), 4).as("hit_ratio"),
        (col("n_hit") * 2 >= col("n_frames")).as("is_dup"),
        coalesce(col("index_media"), lit(-1L)).as("index_media"))
      .orderBy(col("media_id"))
  }

  /** The materialized audio-fingerprint index m15 probes: base-slice
    * (media_id, subfp) posting rows, disk-materialized per source
    * fingerprint — the d22/m14 lifecycle applied to the audio
    * modality (arriving audio is fingerprinted fresh; the base corpus
    * is never re-decoded). Postings in sub-fingerprint buckets over
    * [[DedupQueries.MaxBucket]] are dropped AT MATERIALIZATION (r17
    * ask #5) — they can never produce a candidate, and carrying them
    * forced each probe to recompute the per-bucket count, an
    * index-scale aggregate per arrival batch. */
  private[graft] def audioFpIndexBase(s: SparkSession, dir: String): DataFrame =
    PersistedAggregates.diskMemo(s, "m15_subfp_index", dir) {
      val b = audioFps(s, dir).filter(col("media_id") % 10 =!= 0)
        .select(col("media_id"), col("subfp"))
      val ok = b.groupBy(col("subfp")).agg(count(lit(1)).as("c"))
        .filter(col("c") <= DedupQueries.MaxBucket).select(col("subfp"))
      // §6 write layout: cluster postings by print key (r19)
      b.join(ok, "subfp").sortWithinPartitions(col("subfp"))
    }

  /** m15: INCREMENTAL audio dedup — m14's arrival pattern on the audio
    * track: the new batch (media_id % 10 == 0) is sub-fingerprinted
    * fresh, its prints probed against [[audioFpIndexBase]], and each
    * arriving audio-bearing media gets the m07 routing verdict: a base
    * partner sharing ≥ [[AudioMinShared]] sub-fingerprints makes it a
    * re-upload (drop), keeper = the min-id qualifying base media.
    * Rows cover the FINGERPRINTED arrival slice (the m14 convention:
    * media too short to fingerprint route as novel by absence).
    *
    * Scale shape: decode/fingerprint work per arrival is O(ingest);
    * the base corpus is touched only through the posting index, and
    * base sub-fingerprint buckets over [[DedupQueries.MaxBucket]]
    * emit no candidates (the d03/d22 cap discipline, mirrored in the
    * twin) — a degenerate print shared by the whole corpus cannot
    * funnel arrivals into a quadratic join. */
  private[queries] def incrementalAudioDedup(s: SparkSession, dir: String): DataFrame =
    probeAudioIndex(s, dir,
      MediaPipeline.load(s, dir).filter(col("media_id") % 10 === 0))

  /** The m15 probe path over an ARBITRARY arrival slice of media
    * records — per-media verdicts depend only on the slice's own
    * prints and the fixed posting index, so batched probes union to
    * the one-shot result (the a39/d22/m14 batch≡streaming property,
    * audio modality). */
  private[graft] def probeAudioIndex(s: SparkSession, dir: String,
      ingestMedia: org.apache.spark.sql.Dataset[graft.multimodal.MediaRecord]): DataFrame = {
    val ing = MediaPipeline.audioSubFingerprints(ingestMedia).toDF()
      .select(col("media_id"), col("kind"), col("subfp")).distinct()
    // the MaxBucket cap is pre-applied in [[audioFpIndexBase]]'s
    // materialization — the probe is one equi-join, no index aggregate
    val base = audioFpIndexBase(s, dir)
    val shared = ing.select(col("media_id"), col("subfp"))
      .join(base.select(col("subfp"), col("media_id").as("base_media")), "subfp")
      .groupBy(col("media_id"), col("base_media"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= AudioMinShared)
    val agg = shared.groupBy(col("media_id"))
      .agg(count(lit(1)).as("n_partners"),
        min(col("base_media")).as("index_media"),
        max(col("n_shared")).as("best_shared"))
    ing.groupBy(col("media_id"), col("kind")).agg(count(lit(1)).as("n_fps"))
      .join(agg, Seq("media_id"), "left")
      .select(col("media_id"), col("kind"), col("n_fps"),
        coalesce(col("n_partners"), lit(0L)).as("n_partners"),
        (coalesce(col("n_partners"), lit(0L)) > 0).as("is_dup"),
        coalesce(col("index_media"), lit(-1L)).as("index_media"),
        coalesce(col("best_shared"), lit(0L)).as("best_shared"))
      .orderBy(col("media_id"))
  }

  /** The materialized perceptual-hash index m16 probes: base-slice
    * aHash postings EXPLODED to (base_media, bb, band, bv) — one row
    * per pigeonhole band — with over-cap (band, bv) buckets dropped at
    * materialization (r17 ask #5: the cap aggregate runs once per
    * index refit, never per probe). `bb` carries the full 8-band array
    * so the hamming verify needs no second fetch; at 8 rows × 8 longs
    * per image the index is still a sliver of the payload bytes it
    * replaces. */
  private[graft] def imageAHashIndexBase(s: SparkSession, dir: String): DataFrame =
    PersistedAggregates.diskMemo(s, "m16_ahash_index", dir) {
      // builds from the SHARED memoized aHash pass (r18): the old
      // inline imageAHash(load) re-hashed the full corpus for the
      // index build even though m08 had already computed it
      val b = corpusAHashes(s, dir)
        .filter(col("media_id") % 10 =!= 0)
        .select(col("media_id").as("base_media"), col("bands").as("bb"))
        .select(col("base_media"), col("bb"),
          posexplode(col("bb")).as(Seq("band", "bv")))
      val ok = b.groupBy(col("band"), col("bv"))
        .agg(count(lit(1)).as("c"))
        .filter(col("c") <= DedupQueries.MaxBucket)
        .select(col("band"), col("bv"))
      b.join(ok, Seq("band", "bv"))
        .select(col("base_media"), col("bb"), col("band"), col("bv"))
        .sortWithinPartitions(col("band"), col("bv")) // §6 write layout (r19)
    }

  /** m16: INCREMENTAL image dedup — the arrival pattern on the image
    * modality, completing the incremental triptych (m14 video frames,
    * m15 audio prints, m16 image aHashes): arriving images are
    * aHashed fresh, candidates come from the m08 pigeonhole band
    * equality against [[imageAHashIndexBase]] (guaranteed recall at
    * hamming ≤ 7; base buckets capped), survivors verify the full
    * 64-bit hamming row-locally, and each arriving image gets the
    * routing row — match count, best (min-hamming, min-id) keeper.
    *
    * Scale shape: payloads die at the aHash projection on BOTH sides;
    * only (media_id, 8 bands) rows move; the candidate join is
    * band-equality with capped base buckets; hamming is a row-local
    * fold over the carried band arrays (no second fetch). */
  private[queries] def incrementalImageDedup(s: SparkSession, dir: String): DataFrame =
    probeImageIndex(s, dir,
      MediaPipeline.load(s, dir).filter(col("media_id") % 10 === 0))

  /** The m16 probe path over an ARBITRARY arrival slice — same
    * batch≡streaming contract as [[probeAudioIndex]]. */
  private[graft] def probeImageIndex(s: SparkSession, dir: String,
      ingestMedia: org.apache.spark.sql.Dataset[graft.multimodal.MediaRecord]): DataFrame = {
    import org.apache.spark.sql.types.{DoubleType, LongType}
    val ing = MediaPipeline.imageAHash(ingestMedia).toDF()
      .select(col("media_id"), col("bands"))
    // the index is already exploded to capped (band, bv) postings —
    // the candidate step is one equi-join, no index-side aggregate
    val baseBands = imageAHashIndexBase(s, dir)
    val ingBands = ing.select(col("media_id"), col("bands").as("ba"))
      .select(col("media_id"), col("ba"), posexplode(col("ba")).as(Seq("band", "bv")))
    val cand = ingBands.join(baseBands, Seq("band", "bv"))
      .select(col("media_id"), col("ba"), col("base_media"), col("bb"))
      .distinct()
    val ham = cand.withColumn("hamming",
      expr("""aggregate(zip_with(ba, bb, (x, y) -> bit_count(x ^ y)),
              0, (acc, h) -> acc + h)""").cast(LongType))
    val agg = ham
      .groupBy(col("media_id"))
      .agg(count(lit(1)).as("n_candidates"),
        sum(when(col("hamming") <= MaxImageHamming, 1L).otherwise(0L)).as("n_matches"),
        min(when(col("hamming") <= MaxImageHamming,
          struct(col("hamming"), col("base_media")))).as("best"))
    ing.select(col("media_id"))
      .join(agg, Seq("media_id"), "left")
      .select(col("media_id"),
        coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
        coalesce(col("n_matches"), lit(0L)).as("n_matches"),
        (coalesce(col("n_matches"), lit(0L)) > 0).as("is_neardup"),
        coalesce(col("best.base_media"), lit(-1L)).as("index_media"),
        coalesce(col("best.hamming"), lit(64L)).as("best_hamming"))
      .orderBy(col("media_id"))
  }

  /** m06: the modality mix manifest — the artifact a multimodal
    * training run actually signs off: per source, how many tokens each
    * modality contributes (text by whitespace tokenization; image/
    * audio/video by the m04 metadata-only estimators) and what fraction
    * of the budget is non-text. ONE scan of `documents`, everything
    * derived from metadata columns (the m03 pruning property: no
    * payload is ever read), exact integer sums, one double division
    * per share. */
  private def mixManifest(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{DoubleType, LongType}
    val d = graft.Tables.documents(s, dir)
      .withColumn("kind", expr(
        "CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END"))
      .withColumn("w", expr("CAST(16 + doc_id % 113 AS BIGINT)"))
      .withColumn("h", expr("CAST(16 + doc_id % 71 AS BIGINT)"))
      .withColumn("dur", expr("CAST(n_chars * 10 AS BIGINT)"))
      .withColumn("text_tokens", size(split(col("text"), " ")).cast(LongType))
      // same exact integer ceil-division estimators as m04 (`div`, not `/`)
      .withColumn("media_tokens", expr(
        """CASE kind WHEN 'image' THEN ((w + 13) div 14) * ((h + 13) div 14)
                     WHEN 'audio' THEN (dur + 79) div 80
                     ELSE ((dur + 999) div 1000) * ((w + 27) div 28) * ((h + 27) div 28)
           END"""))
    d.groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("text_tokens")).as("text_tokens"),
        sum(when(col("kind") === "image", col("media_tokens")).otherwise(0L)).as("image_tokens"),
        sum(when(col("kind") === "audio", col("media_tokens")).otherwise(0L)).as("audio_tokens"),
        sum(when(col("kind") === "video", col("media_tokens")).otherwise(0L)).as("video_tokens"))
      .withColumn("total_tokens",
        col("text_tokens") + col("image_tokens") + col("audio_tokens") + col("video_tokens"))
      .withColumn("media_share",
        (col("total_tokens") - col("text_tokens")).cast(DoubleType) / col("total_tokens"))
      .orderBy(col("source"))
  }

  private[queries] val AudioMinShared = 2

  /** m07: cross-media audio near-dup pairs — m05 dedups video frames;
    * this catches audio re-uploads: the same audio track in a
    * different container (an audio rip of a video, a re-encoded audio
    * file) shares chromaprint-style sub-fingerprints
    * ([[graft.multimodal.MediaPipeline.audioSubFingerprints]]) even
    * when the files differ byte-wise, because the fingerprint
    * quantizes band-energy DERIVATIVE SIGNS, not bytes, and matches
    * position-independently.
    *
    * Scale shape: the d10/m05 digest property — payloads die at the
    * fingerprint projection; only (media_id, kind, subfp) rows
    * shuffle. Candidate pairs come from the shared capped-bucket
    * expansion (cap BEFORE collect — a degenerate sub-fingerprint
    * shared by thousands of media spills, then drops, instead of
    * materializing one giant pair array), the d03 shape on a subfp
    * key. The per-media fingerprint counts join back only onto the
    * few surviving pairs. */
  /** The memoized full-corpus sub-fingerprint pass — read twice by m07
    * (per-media counts, bucket expansion) and once by m15's index
    * build; persisted once so the fingerprint flatMap runs a single
    * pass (a36/a18 pattern); recompute lineage is the scan-rooted
    * pipeline, safe for the memo contract. */
  private def audioFps(s: SparkSession, dir: String): DataFrame =
    PersistedAggregates.memo(s, "m07_fps", dir) {
      MediaPipeline.audioSubFingerprints(MediaPipeline.load(s, dir)).toDF()
        .select(col("media_id"), col("kind"), col("subfp")).distinct()
    }

  private[queries] def audioNearDup(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DoubleType
    val fps = audioFps(s, dir)
    val counts = fps.groupBy(col("media_id")).agg(count(lit(1)).as("nfp"))
    val pairs = DedupQueries.collectCappedBuckets(
        fps.select(col("subfp"), struct(col("media_id"), col("kind")).as("m")),
        Seq("subfp"), col("m"))
      .select(explode(expr(DedupQueries.pairExpansion(
        "x.media_id AS media_a, x.kind AS kind_a, y.media_id AS media_b, y.kind AS kind_b")))
        .as("p"))
      .groupBy(col("p.media_a").as("media_a"), col("p.kind_a").as("kind_a"),
        col("p.media_b").as("media_b"), col("p.kind_b").as("kind_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= AudioMinShared)
    pairs
      .join(counts.select(col("media_id").as("media_a"), col("nfp").as("nfp_a")), "media_a")
      .join(counts.select(col("media_id").as("media_b"), col("nfp").as("nfp_b")), "media_b")
      .select(col("media_a"), col("kind_a"), col("media_b"), col("kind_b"), col("n_shared"),
        round(col("n_shared").cast(DoubleType) / least(col("nfp_a"), col("nfp_b")), 4)
          .as("overlap"))
      .orderBy(col("media_a"), col("media_b"))
  }

  private[queries] val MaxImageHamming = 16L

  /** m08: image perceptual-hash near-dup pairs — completes the
    * modality dedup triptych (m05 video frames, m07 audio tracks):
    * re-encoded/watermarked image copies differ byte-wise but share
    * block-mean structure, the classic aHash signal
    * ([[graft.multimodal.MediaPipeline.imageAHash]] — exact integer
    * arithmetic, so the hash itself is cross-engine hash-checkable).
    *
    * Candidates come from the d06 pigeonhole shape on the 8×8-bit
    * bands: any pair at hamming ≤ 7 shares a band EXACTLY (guaranteed
    * recall); beyond 7 the band join is the standard LSH s-curve
    * sample. Survivors verify the full 64-bit hamming row-locally
    * (zip_with + bit_count over the band arrays riding the buckets —
    * the s03 carry pattern, one scan) and keep pairs at ≤
    * [[MaxImageHamming]] — 4σ below the ~32 a random pair scores.
    * Payloads die at the aHash projection: only (media_id, 8 bands)
    * rows shuffle. */
  /** The memoized full-corpus aHash pass — read by m08's band
    * expansion and m16's index build; persisted once so the per-image
    * block-mean fold runs a single pass per session (the m07 audioFps
    * pattern, r18; recompute lineage is scan-rooted, memo-safe). */
  private def corpusAHashes(s: SparkSession, dir: String): DataFrame =
    PersistedAggregates.memo(s, "m08_ahash", dir) {
      MediaPipeline.imageAHash(MediaPipeline.load(s, dir)).toDF()
        .select(col("media_id"), col("bands"))
    }

  private[queries] def imageNearDup(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{DoubleType, LongType}
    val ah = corpusAHashes(s, dir)
    DedupQueries.collectCappedBuckets(
        ah.select(posexplode(col("bands")).as(Seq("band", "bv")),
          struct(col("media_id"), col("bands")).as("m")),
        Seq("band", "bv"), col("m"))
      .select(explode(expr(DedupQueries.pairExpansion(
        "x.media_id AS media_a, x.bands AS ba, y.media_id AS media_b, y.bands AS bb"))).as("p"))
      .select(col("p.media_a").as("media_a"), col("p.media_b").as("media_b"),
        expr("""aggregate(zip_with(p.ba, p.bb, (x, y) -> bit_count(x ^ y)),
                0, (acc, h) -> acc + h)""").cast(LongType).as("hamming"))
      .distinct()
      .filter(col("hamming") <= MaxImageHamming)
      .select(col("media_a"), col("media_b"), col("hamming"),
        (lit(1.0) - col("hamming").cast(DoubleType) / 64.0).as("similarity"))
      .orderBy(col("media_a"), col("media_b"))
  }

  // ---- shared per-family oracle CTEs ----
  //
  // The m05/m07/m08 twins are single chains ending in a named relation
  // (m05d / m07p / m08p) so the d15 drop-list manifest can splice the
  // SAME text the per-query oracles run — the family semantics can
  // never drift between a query and the manifest that unions it. CTE
  // names are m-prefixed: the manifest's WITH also contains the d-family
  // (bands/vp/lab), t-family (stats), and s-family (v/n/asg) chains.

  /** DuckDB twin chain of [[frameDedup]] up to the per-media rollup
    * `m05d(media_id, n_frames, n_shared_frames)`. */
  private[queries] val m05DuckCte = """
      m05v AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 = 2),
      m05f AS (SELECT doc_id AS media_id,
              UNNEST(generate_series(0, CAST((length(text) + 31) // 32 AS INT) - 1, 4)) AS frame_idx,
              text
            FROM m05v),
      m05h AS (SELECT DISTINCT media_id,
              md5(substr(text, CAST(frame_idx AS INT) * 32 + 1, 32)) AS fh
            FROM m05f),
      m05o AS (SELECT media_id, fh, COUNT(*) OVER (PARTITION BY fh) AS n_media FROM m05h),
      m05d AS (SELECT media_id, COUNT(*) AS n_frames,
              CAST(SUM(CASE WHEN n_media >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared_frames
            FROM m05o GROUP BY media_id)"""

  /** DuckDB twin chain of [[incrementalFrameDedup]] — splices after
    * [[m05DuckCte]] (needs `m05h`); ends in the per-arrival verdict
    * relation `m14v(media_id, n_frames, n_frames_in_index, hit_ratio,
    * is_dup, index_media)`. Shared verbatim by the m14 oracle and
    * d23's arrival manifest (the d15/d16 no-drift rule), so the
    * manifest's media verdicts are BY CONSTRUCTION the m14 rows. */
  private[queries] val m14DuckCtes: String = """
      m14i AS (SELECT fh, MIN(media_id) AS idx_media
               FROM m05h WHERE media_id % 10 <> 0 GROUP BY fh),
      m14f AS (SELECT media_id, fh FROM m05h WHERE media_id % 10 = 0),
      m14j AS (SELECT f.media_id, f.fh, i.idx_media
               FROM m14f f LEFT JOIN m14i i ON i.fh = f.fh),
      m14a AS (SELECT media_id, COUNT(*) AS n_frames,
                 CAST(SUM(CASE WHEN idx_media IS NOT NULL THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_hit,
                 MIN(idx_media) AS index_media
               FROM m14j GROUP BY media_id),
      m14v AS (SELECT media_id, n_frames, n_hit AS n_frames_in_index,
                 ROUND(CAST(n_hit AS DOUBLE) / n_frames, 4) AS hit_ratio,
                 (n_hit * 2 >= n_frames) AS is_dup,
                 COALESCE(index_media, -1) AS index_media
               FROM m14a)"""

  /** DuckDB twin chain of [[incrementalAudioDedup]] — splices after
    * [[m07DuckCte]] (needs `m07ds`); ends in the per-arrival verdict
    * relation `m15v(media_id, kind, n_fps, n_partners, is_dup,
    * index_media, best_shared)` over the FINGERPRINTED arrival slice.
    * Shared verbatim by the m15 oracle and d23's arrival manifest
    * (the d15/d16 no-drift rule). */
  private[queries] val m15DuckCtes: String = s"""
      m15sz AS (SELECT subfp, COUNT(*) AS c FROM m07ds
                WHERE media_id % 10 <> 0 GROUP BY subfp),
      m15f AS (SELECT media_id, kind, subfp FROM m07ds WHERE media_id % 10 = 0),
      m15j AS (SELECT f.media_id, b.media_id AS base_media, COUNT(*) AS n_shared
               FROM m15f f
               JOIN m15sz s ON s.subfp = f.subfp AND s.c <= ${DedupQueries.MaxBucket}
               JOIN (SELECT media_id, subfp FROM m07ds WHERE media_id % 10 <> 0) b
                 ON b.subfp = f.subfp
               GROUP BY 1, 2),
      m15q AS (SELECT * FROM m15j WHERE n_shared >= $AudioMinShared),
      m15agg AS (SELECT media_id, COUNT(*) AS n_partners,
                   MIN(base_media) AS index_media,
                   CAST(MAX(n_shared) AS BIGINT) AS best_shared
                 FROM m15q GROUP BY media_id),
      m15cnt AS (SELECT media_id, kind, COUNT(*) AS n_fps
                 FROM m07ds WHERE media_id % 10 = 0 GROUP BY 1, 2),
      m15v AS (SELECT c.media_id, c.kind, c.n_fps,
                 COALESCE(a.n_partners, 0) AS n_partners,
                 (COALESCE(a.n_partners, 0) > 0) AS is_dup,
                 COALESCE(a.index_media, -1) AS index_media,
                 COALESCE(a.best_shared, 0) AS best_shared
               FROM m15cnt c LEFT JOIN m15agg a ON a.media_id = c.media_id)"""

  /** DuckDB twin chain of [[incrementalImageDedup]] — splices after
    * [[m08DuckCte]] (needs `m08bands`); ends in the per-arrival
    * verdict relation `m16v(media_id, n_candidates, n_matches,
    * is_neardup, index_media, best_hamming)` over the aHashED arrival
    * slice. Shared verbatim by the m16 oracle and d23's arrival
    * manifest. */
  private[queries] val m16DuckCtes: String = s"""
      m16sz AS (SELECT band, bv, COUNT(*) AS c FROM m08bands
                WHERE media_id % 10 <> 0 GROUP BY 1, 2),
      m16c AS (SELECT DISTINCT f.media_id, b.media_id AS base_media
               FROM m08bands f
               JOIN m16sz s ON s.band = f.band AND s.bv = f.bv
                 AND s.c <= ${DedupQueries.MaxBucket}
               JOIN m08bands b ON b.band = f.band AND b.bv = f.bv
                 AND b.media_id % 10 <> 0
               WHERE f.media_id % 10 = 0),
      m16h AS (SELECT c.media_id, c.base_media,
                 CAST(SUM(bit_count(xor(x.bv, y.bv))) AS BIGINT) AS hamming
               FROM m16c c
               JOIN m08bands x ON x.media_id = c.media_id
               JOIN m08bands y ON y.media_id = c.base_media AND y.band = x.band
               GROUP BY 1, 2),
      m16agg AS (SELECT media_id, COUNT(*) AS n_candidates,
                   CAST(SUM(CASE WHEN hamming <= $MaxImageHamming THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_matches
                 FROM m16h GROUP BY media_id),
      m16best AS (SELECT media_id, base_media, hamming FROM (
                    SELECT media_id, base_media, hamming,
                      ROW_NUMBER() OVER (PARTITION BY media_id
                                         ORDER BY hamming, base_media) AS rn
                    FROM m16h WHERE hamming <= $MaxImageHamming) t
                  WHERE rn = 1),
      m16i AS (SELECT DISTINCT media_id FROM m08bands WHERE media_id % 10 = 0),
      m16v AS (SELECT i.media_id,
                 COALESCE(a.n_candidates, 0) AS n_candidates,
                 COALESCE(a.n_matches, 0) AS n_matches,
                 (COALESCE(a.n_matches, 0) > 0) AS is_neardup,
                 COALESCE(b.base_media, -1) AS index_media,
                 COALESCE(b.hamming, 64) AS best_hamming
               FROM m16i i LEFT JOIN m16agg a ON a.media_id = i.media_id
                           LEFT JOIN m16best b ON b.media_id = i.media_id)"""

  /** DuckDB twin chain of [[audioNearDup]] up to the unfiltered shared-
    * fingerprint pairs `m07p(media_a, kind_a, media_b, kind_b,
    * n_shared)` plus per-media counts `m07cnt(media_id, nfp)`. */
  private[queries] val m07DuckCte = s"""
      m07a AS (SELECT doc_id AS media_id,
                   ['image','audio','video'][CAST(doc_id % 3 + 1 AS INT)] AS kind, text
                 FROM documents WHERE doc_id % 3 IN (1, 2)),
      m07fr AS (SELECT media_id, kind, text,
               UNNEST(generate_series(0, CAST(length(text) // 64 AS INT) - 1)) AS f
             FROM m07a WHERE length(text) >= 384),
      m07en AS (SELECT media_id, kind, f, b,
               list_reduce(list_prepend(CAST(0 AS BIGINT),
                 list_transform(generate_series(1, 8),
                   j -> CAST(ascii(substr(text, CAST(f * 64 + b * 8 + j AS INT), 1)) AS BIGINT))),
                 (x, y) -> x + y) AS e
             FROM m07fr, UNNEST(generate_series(0, 7)) AS t(b)),
      m07bits AS (SELECT e1.media_id, e1.kind, e1.f,
                 CAST(SUM(CASE WHEN e2.e > e1.e THEN 1 << e1.b ELSE 0 END) AS BIGINT) AS bv
               FROM m07en e1 JOIN m07en e2
                 ON e1.media_id = e2.media_id AND e2.f = e1.f + 1 AND e1.b = e2.b
               GROUP BY 1, 2, 3),
      m07sub AS (SELECT b0.media_id, b0.kind,
                b0.bv + b1.bv * 256 + b2.bv * 65536 + b3.bv * 16777216 AS subfp
              FROM m07bits b0
              JOIN m07bits b1 ON b1.media_id = b0.media_id AND b1.f = b0.f + 1
              JOIN m07bits b2 ON b2.media_id = b0.media_id AND b2.f = b0.f + 2
              JOIN m07bits b3 ON b3.media_id = b0.media_id AND b3.f = b0.f + 3),
      m07ds AS (SELECT DISTINCT media_id, kind, subfp FROM m07sub),
      m07cnt AS (SELECT media_id, COUNT(*) AS nfp FROM m07ds GROUP BY 1),
      m07bsz AS (SELECT subfp, COUNT(*) AS c FROM m07ds GROUP BY 1),
      m07p AS (SELECT x.media_id AS media_a, x.kind AS kind_a,
                   y.media_id AS media_b, y.kind AS kind_b, COUNT(*) AS n_shared
            FROM m07ds x JOIN m07ds y ON x.subfp = y.subfp AND x.media_id < y.media_id
            JOIN m07bsz s ON s.subfp = x.subfp AND s.c <= ${DedupQueries.MaxBucket}
            GROUP BY 1, 2, 3, 4)"""

  /** DuckDB twin chain of [[imageNearDup]] up to the exact-hamming
    * verified pairs `m08p(media_a, media_b, hamming)` (unfiltered). */
  private[queries] val m08DuckCte = s"""
      m08img AS (SELECT doc_id AS media_id, text, length(text) AS n
                   FROM documents WHERE doc_id % 3 = 0 AND length(text) >= 64),
      m08tot AS (SELECT media_id, text, n,
                list_reduce(list_prepend(CAST(0 AS BIGINT),
                  list_transform(generate_series(1, CAST(n AS INT)),
                    i -> CAST(ascii(substr(text, i, 1)) AS BIGINT))), (a, c) -> a + c) AS tsum
              FROM m08img),
      m08blocks AS (
        SELECT media_id, b,
          CAST(n * (b + 1) // 64 - n * b // 64 AS BIGINT) AS blen,
          list_reduce(list_prepend(CAST(0 AS BIGINT),
            list_transform(generate_series(CAST(n * b // 64 + 1 AS INT),
                                           CAST(n * (b + 1) // 64 AS INT)),
              i -> CAST(ascii(substr(text, i, 1)) AS BIGINT))), (a, c) -> a + c) AS bsum,
          tsum, n
        FROM m08tot, UNNEST(generate_series(0, 63)) AS t(b)),
      m08bits AS (SELECT media_id, b,
                 CASE WHEN bsum * n > tsum * blen THEN 1 ELSE 0 END AS bit
               FROM m08blocks),
      m08bands AS (
        SELECT media_id, CAST(b // 8 AS INT) AS band,
          CAST(SUM(bit * (1::BIGINT << (b % 8))) AS BIGINT) AS bv
        FROM m08bits GROUP BY 1, 2),
      m08bsz AS (SELECT band, bv, COUNT(*) AS c FROM m08bands GROUP BY 1, 2),
      m08cand AS (
        SELECT DISTINCT a.media_id AS media_a, b.media_id AS media_b
        FROM m08bands a JOIN m08bands b
          ON a.band = b.band AND a.bv = b.bv AND a.media_id < b.media_id
        JOIN m08bsz s ON s.band = a.band AND s.bv = a.bv
          AND s.c BETWEEN 2 AND ${DedupQueries.MaxBucket}),
      m08p AS (
        SELECT media_a, media_b,
          CAST(SUM(bit_count(xor(x.bv, y.bv))) AS BIGINT) AS hamming
        FROM m08cand
        JOIN m08bands x ON x.media_id = media_a
        JOIN m08bands y ON y.media_id = media_b AND y.band = x.band
        GROUP BY media_a, media_b)"""

  val defs: Seq[(String, QueryDef)] = Seq(
    "m01_media_features" -> QueryDef(mediaFeatures, Some(s"""
      WITH m AS (
        SELECT doc_id AS media_id, $kindDuck AS kind, text,
               CAST(16 + doc_id % 113 AS INT) AS w, CAST(16 + doc_id % 71 AS INT) AS h
        FROM documents),
      codes AS (
        SELECT media_id,
          UNNEST(list_transform(generate_series(1, length(text)),
            i -> ascii(substr(text, i, 1)))) AS code
        FROM m),
      hist AS (SELECT media_id, code, COUNT(*) AS c FROM codes GROUP BY 1, 2),
      bstats AS (
        SELECT media_id,
          CAST(COUNT(*) AS INT) AS distinct_bytes,
          CAST(SUM(c * (c - 1)) AS BIGINT) AS coll,
          CAST(SUM(CASE WHEN code BETWEEN 32 AND 126 THEN c ELSE 0 END) AS BIGINT) AS printable
        FROM hist GROUP BY 1)
      SELECT m.media_id, kind, CAST(length(text) AS BIGINT) AS n_bytes,
        CASE WHEN length(text) = 0 THEN 0.0
             ELSE CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                    list_transform(generate_series(1, length(text)),
                      i -> CAST(ascii(substr(text, i, 1)) AS BIGINT))), (a, c) -> a + c) AS DOUBLE)
                  / length(text) END AS luma_mean,
        list_reduce(list_prepend(CAST(0 AS BIGINT),
          list_transform(generate_series(1, length(text)),
            i -> CAST(ascii(substr(text, i, 1)) AS BIGINT))), (a, c) -> (a * 131 + c) % 1000000007)
          AS fingerprint,
        b.distinct_bytes,
        CASE WHEN length(text) < 2 THEN 0.0
             ELSE CAST(b.coll AS DOUBLE)
                  / CAST(length(text) * (length(text) - 1) AS DOUBLE) END AS ioc,
        CASE WHEN length(text) = 0 THEN 0.0
             ELSE CAST(b.printable AS DOUBLE) / length(text) END AS printable_ratio,
        CASE WHEN length(text) >= 3 AND ascii(substr(text, 1, 1)) = 255
              AND ascii(substr(text, 2, 1)) = 216 AND ascii(substr(text, 3, 1)) = 255
             THEN 'jpeg'
             WHEN length(text) >= 4 AND ascii(substr(text, 1, 1)) = 137
              AND ascii(substr(text, 2, 1)) = 80 AND ascii(substr(text, 3, 1)) = 78
              AND ascii(substr(text, 4, 1)) = 71
             THEN 'png'
             WHEN length(text) >= 4 AND ascii(substr(text, 1, 1)) = 71
              AND ascii(substr(text, 2, 1)) = 73 AND ascii(substr(text, 3, 1)) = 70
              AND ascii(substr(text, 4, 1)) = 56
             THEN 'gif'
             WHEN length(text) >= 4 AND ascii(substr(text, 1, 1)) = 82
              AND ascii(substr(text, 2, 1)) = 73 AND ascii(substr(text, 3, 1)) = 70
              AND ascii(substr(text, 4, 1)) = 70
             THEN 'riff'
             ELSE 'unknown' END AS format,
        CAST(CASE WHEN greatest(w, h) <= 64 THEN w ELSE w * 64 // greatest(w, h) END AS INT) AS out_width,
        CAST(CASE WHEN greatest(w, h) <= 64 THEN h ELSE h * 64 // greatest(w, h) END AS INT) AS out_height
      FROM m JOIN bstats b USING (media_id) ORDER BY m.media_id"""),
      "decode (stub codec) + REAL payload byte statistics: IoC, printable ratio, magic-byte sniff"),

    "m02_frame_sample" -> QueryDef(frameSample, Some("""
      WITH v AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 = 2),
      f AS (SELECT doc_id AS media_id,
              UNNEST(generate_series(0, CAST((length(text) + 31) // 32 AS INT) - 1, 4)) AS frame_idx,
              text
            FROM v)
      SELECT media_id, CAST(frame_idx AS INT) AS frame_idx,
             md5(substr(text, CAST(frame_idx AS INT) * 32 + 1, 32)) AS frame_md5
      FROM f ORDER BY media_id, frame_idx"""),
      "video frame sampling (every 4th 32-byte frame, fingerprinted)"),

    "m04_media_token_budget" -> QueryDef(mediaTokenBudget, Some(s"""
      WITH m AS (
        SELECT $kindDuck AS kind,
               CAST(16 + doc_id % 113 AS BIGINT) AS w,
               CAST(16 + doc_id % 71 AS BIGINT) AS h,
               CAST(n_chars * 10 AS BIGINT) AS dur
        FROM documents),
      t AS (
        SELECT kind, $estTokensDuck AS est_tokens
        FROM m)
      SELECT kind, COUNT(*) AS n_media,
        CAST(SUM(est_tokens) AS BIGINT) AS sum_tokens,
        CAST(MAX(est_tokens) AS BIGINT) AS max_tokens
      FROM t GROUP BY kind ORDER BY kind"""),
      "multimodal token accounting from metadata only (payload never read)"),

    "m03_media_meta" -> QueryDef(MediaPipeline.metadataSummary, Some(s"""
      WITH m AS (
        SELECT $kindDuck AS kind, CAST(16 + doc_id % 113 AS BIGINT) AS w,
               n_chars * 10 AS dur
        FROM documents)
      SELECT kind, COUNT(*) AS n_media, CAST(SUM(w) AS BIGINT) AS sum_width,
             CAST(SUM(dur) AS BIGINT) AS sum_duration_ms
      FROM m GROUP BY kind ORDER BY kind"""),
      "metadata-only scan (payload column never read)"),

    "m05_frame_dedup" -> QueryDef(frameDedup, Some(s"""
      WITH $m05DuckCte
      SELECT media_id, n_frames, n_shared_frames,
        ROUND(CAST(n_shared_frames AS DOUBLE) / n_frames, 4) AS shared_ratio
      FROM m05d WHERE n_shared_frames > 0 ORDER BY media_id"""),
      "cross-video duplicate-frame detection over sampled-frame fingerprints"),

    "m06_mix_manifest" -> QueryDef(mixManifest, Some(s"""
      WITH m AS (
        SELECT source,
          $kindDuck AS kind,
          CAST(16 + doc_id % 113 AS BIGINT) AS w,
          CAST(16 + doc_id % 71 AS BIGINT) AS h,
          CAST(n_chars * 10 AS BIGINT) AS dur,
          CAST(len(string_split(text, ' ')) AS BIGINT) AS text_tokens
        FROM documents),
      t AS (
        SELECT source, kind, text_tokens,
          CASE kind
            WHEN 'image' THEN ((w + 13) // 14) * ((h + 13) // 14)
            WHEN 'audio' THEN (dur + 79) // 80
            ELSE ((dur + 999) // 1000) * ((w + 27) // 28) * ((h + 27) // 28)
          END AS media_tokens
        FROM m),
      g AS (
        SELECT source, COUNT(*) AS n_docs,
          CAST(SUM(text_tokens) AS BIGINT) AS text_tokens,
          CAST(SUM(CASE WHEN kind = 'image' THEN media_tokens ELSE 0 END) AS BIGINT) AS image_tokens,
          CAST(SUM(CASE WHEN kind = 'audio' THEN media_tokens ELSE 0 END) AS BIGINT) AS audio_tokens,
          CAST(SUM(CASE WHEN kind = 'video' THEN media_tokens ELSE 0 END) AS BIGINT) AS video_tokens
        FROM t GROUP BY source)
      SELECT source, n_docs, text_tokens, image_tokens, audio_tokens, video_tokens,
        text_tokens + image_tokens + audio_tokens + video_tokens AS total_tokens,
        CAST(image_tokens + audio_tokens + video_tokens AS DOUBLE) /
          (text_tokens + image_tokens + audio_tokens + video_tokens) AS media_share
      FROM g ORDER BY source"""),
      "per-source modality token mix manifest (metadata-only, one scan)"),

    "m07_audio_neardup" -> QueryDef(audioNearDup, Some(s"""
      WITH $m07DuckCte
      SELECT media_a, kind_a, media_b, kind_b, n_shared,
        ROUND(CAST(n_shared AS DOUBLE) / LEAST(ca.nfp, cb.nfp), 4) AS overlap
      FROM m07p JOIN m07cnt ca ON ca.media_id = media_a
                JOIN m07cnt cb ON cb.media_id = media_b
      WHERE n_shared >= $AudioMinShared
      ORDER BY media_a, media_b"""),
      "cross-media audio near-dup pairs (chromaprint-style band-derivative sub-fingerprints)"),

    "m08_image_neardup" -> QueryDef(imageNearDup, Some(s"""
      WITH $m08DuckCte
      SELECT media_a, media_b, hamming,
        1.0 - CAST(hamming AS DOUBLE) / 64.0 AS similarity
      FROM m08p WHERE hamming <= $MaxImageHamming
      ORDER BY media_a, media_b"""),
      "image perceptual-hash (aHash) near-dup pairs, pigeonhole-banded, exact-hamming verified"),

    "m09_media_dedup_clusters" -> QueryDef(mediaDedupClusters, Some(s"""
      WITH RECURSIVE $m07DuckCte,
      $m08DuckCte,
      $mediaCcDuckCte
      SELECT media AS media_id, cluster AS cluster_id,
        COUNT(*) OVER (PARTITION BY cluster) AS n_members
      FROM mlab ORDER BY media_id"""),
      "media dedup clusters: connected components over the m07+m08 near-dup edges, named by minimum media id"),

    "m10_media_survivors" -> QueryDef(mediaSurvivors, Some(s"""
      WITH RECURSIVE $m07DuckCte,
      $m08DuckCte,
      $mediaCcDuckCte,
      mlen AS (SELECT doc_id AS media_id, CAST(strlen(text) AS BIGINT) AS payload_bytes
               FROM documents),
      mj AS (SELECT mlab.media, mlab.cluster, mlen.payload_bytes
             FROM mlab JOIN mlen ON mlen.media_id = mlab.media),
      mr AS (SELECT *,
               ROW_NUMBER() OVER (PARTITION BY cluster
                                  ORDER BY payload_bytes DESC, media) AS rn,
               COUNT(*) OVER (PARTITION BY cluster) AS n_members
             FROM mj)
      SELECT cluster AS cluster_id, n_members,
             media AS keeper_media, payload_bytes AS keeper_bytes
      FROM mr WHERE rn = 1 ORDER BY cluster_id"""),
      "media survivors: per-cluster keeper by largest payload (the keep-the-best-copy rule), min id tiebreak"),

    "m13_media_curation_card" -> QueryDef(mediaCurationCard, Some(s"""
      WITH RECURSIVE $m07DuckCte,
      $m08DuckCte,
      $mediaCcDuckCte,
      mbase AS (
        SELECT doc_id AS media_id, $kindDuck AS kind,
          CAST(strlen(text) AS BIGINT) AS payload_bytes,
          CAST(16 + doc_id % 113 AS BIGINT) AS w,
          CAST(16 + doc_id % 71 AS BIGINT) AS h,
          CAST(n_chars * 10 AS BIGINT) AS dur
        FROM documents),
      mtok AS (
        SELECT media_id, kind, payload_bytes, $estTokensDuck AS est_tokens
        FROM mbase),
      mjj AS (SELECT mlab.media, mlab.cluster, b.payload_bytes
              FROM mlab JOIN mtok b ON b.media_id = mlab.media),
      mkeep AS (SELECT cluster, media,
                  ROW_NUMBER() OVER (PARTITION BY cluster
                                     ORDER BY payload_bytes DESC, media) AS rn
                FROM mjj),
      mdrop AS (SELECT media FROM mkeep WHERE rn > 1)
      SELECT kind, COUNT(*) AS n_media,
        CAST(COUNT(*) - SUM(CASE WHEN d.media IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS n_kept,
        CAST(SUM(CASE WHEN d.media IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS n_dropped,
        CAST(SUM(payload_bytes) AS BIGINT) AS payload_bytes,
        CAST(SUM(CASE WHEN d.media IS NULL THEN payload_bytes ELSE 0 END) AS BIGINT)
          AS kept_bytes,
        CAST(SUM(est_tokens) AS BIGINT) AS est_tokens,
        CAST(SUM(CASE WHEN d.media IS NULL THEN est_tokens ELSE 0 END) AS BIGINT)
          AS kept_tokens,
        CAST(SUM(CASE WHEN d.media IS NULL THEN est_tokens ELSE 0 END) AS DOUBLE)
          / SUM(est_tokens) AS kept_token_share
      FROM mtok t LEFT JOIN mdrop d ON d.media = t.media_id
      GROUP BY kind ORDER BY kind"""),
      "media curation card: per-modality pre/post-dedup counts, payload bytes, and m04 token budget after the m09/m10 drop rule"),

    "m11_scene_segments" -> QueryDef(sceneSegments, Some("""
      WITH v AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 = 2),
      f AS (SELECT doc_id AS media_id,
              UNNEST(generate_series(0, CAST((length(text) + 31) // 32 AS INT) - 1, 4)) AS frame_idx,
              text
            FROM v),
      fr AS (SELECT media_id, CAST(frame_idx AS INT) AS frame_idx,
               md5(substr(text, CAST(frame_idx AS INT) * 32 + 1, 32)) AS fp
             FROM f),
      l AS (SELECT media_id, frame_idx, fp,
              LAG(fp) OVER (PARTITION BY media_id ORDER BY frame_idx) AS pf
            FROM fr),
      c AS (SELECT media_id, frame_idx, fp,
              CASE WHEN pf IS NULL OR fp <> pf THEN 1 ELSE 0 END AS cut
            FROM l),
      r AS (SELECT media_id, fp,
              SUM(cut) OVER (PARTITION BY media_id ORDER BY frame_idx
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id
            FROM c),
      runs AS (SELECT media_id, run_id, COUNT(*) AS rl FROM r GROUP BY 1, 2),
      seg AS (SELECT media_id, CAST(SUM(rl) AS BIGINT) AS n_frames,
                COUNT(*) AS n_scenes, CAST(MAX(rl) AS BIGINT) AS longest_scene
              FROM runs GROUP BY media_id),
      dct AS (SELECT media_id, COUNT(DISTINCT fp) AS n_distinct_frames
              FROM fr GROUP BY media_id)
      SELECT seg.media_id, n_frames, n_distinct_frames, n_scenes, longest_scene
      FROM seg JOIN dct ON dct.media_id = seg.media_id
      ORDER BY seg.media_id"""),
      "shot/scene segmentation: fingerprint-delta cuts over the sampled frame sequence, run-length scene stats"),

    "m12_energy_segments" -> QueryDef(energySegments, Some("""
      WITH af AS (SELECT doc_id AS media_id, text FROM documents
                  WHERE doc_id % 3 IN (1, 2) AND length(text) >= 64),
      fr AS (SELECT media_id, CAST(f AS INT) AS frame_idx,
               list_reduce(list_prepend(CAST(0 AS BIGINT),
                 list_transform(generate_series(1, 64),
                   j -> CAST(ascii(substr(text, CAST(f * 64 + j AS INT), 1)) AS BIGINT))),
                 (a, c) -> a + c) AS energy
             FROM af, UNNEST(generate_series(0, CAST(length(text) // 64 AS INT) - 1)) AS t(f)),
      cl AS (SELECT media_id, frame_idx, energy,
               SUM(energy) OVER (PARTITION BY media_id) AS e_tot,
               COUNT(*) OVER (PARTITION BY media_id) AS nf
             FROM fr),
      lw AS (SELECT media_id, frame_idx,
               (energy * nf < e_tot) AS low
             FROM cl),
      lg AS (SELECT media_id, frame_idx, low,
               LAG(low) OVER (PARTITION BY media_id ORDER BY frame_idx) AS pl
             FROM lw),
      ns AS (SELECT media_id, frame_idx, low,
               CASE WHEN pl IS NULL OR pl <> low THEN 1 ELSE 0 END AS new_seg
             FROM lg),
      sg AS (SELECT media_id, frame_idx, low,
               SUM(new_seg) OVER (PARTITION BY media_id ORDER BY frame_idx
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seg_idx
             FROM ns)
      SELECT media_id, CAST(seg_idx AS BIGINT) AS seg_idx,
        CASE WHEN MAX(CASE WHEN low THEN 1 ELSE 0 END) = 1
             THEN 'quiet' ELSE 'active' END AS cls,
        COUNT(*) AS n_frames,
        MIN(frame_idx) AS start_frame,
        MAX(frame_idx) AS end_frame
      FROM sg GROUP BY media_id, seg_idx
      ORDER BY media_id, seg_idx"""),
      "energy (VAD-style) segmentation: active/quiet segment manifest per audio-bearing media, mean-relative integer threshold"),

    "m15_incremental_audio_dedup" -> QueryDef(incrementalAudioDedup, Some(s"""
      WITH $m07DuckCte,
      $m15DuckCtes
      SELECT media_id, kind, n_fps, n_partners, is_dup, index_media,
        best_shared
      FROM m15v ORDER BY media_id"""),
      "incremental audio dedup: new media sub-fingerprinted fresh and probed against the MATERIALIZED base posting index (no base re-decode), m07's >= 2-shared-print re-upload rule, per-arrival routing row"),

    "m16_incremental_image_dedup" -> QueryDef(incrementalImageDedup, Some(s"""
      WITH $m08DuckCte,
      $m16DuckCtes
      SELECT media_id, n_candidates, n_matches, is_neardup, index_media,
        best_hamming
      FROM m16v ORDER BY media_id"""),
      "incremental image dedup: new images aHashed fresh, m08 pigeonhole band candidates against the MATERIALIZED base index (capped buckets), exact 64-bit hamming verify, per-arrival routing row with (min-hamming, min-id) keeper"),

    "m14_incremental_frame_dedup" -> QueryDef(incrementalFrameDedup, Some(s"""
      WITH $m05DuckCte,
      $m14DuckCtes
      SELECT media_id, n_frames, n_frames_in_index, hit_ratio, is_dup,
        index_media
      FROM m14v ORDER BY media_id"""),
      "incremental media dedup: new videos' sampled-frame digests probed against the MATERIALIZED base frame index (no base re-decode), majority-overlap drop rule"))

  /** m09: media dedup clusters — the d07 step for the media domain:
    * the m07 (audio) and m08 (image) near-dup pairs merged into one
    * edge list and grouped into connected components, each named by
    * its minimum media id (the canonical keeper; everything else is
    * droppable). Closes the media families' gap to the text side,
    * where pairs → clusters → survivors is the full d04→d07→d08
    * chain: transitive re-uploads (A≈B, B≈C re-encodes) now land in
    * ONE cluster even when A and C share no direct edge.
    *
    * Same scale machinery as d07: alternating-star contraction
    * ([[graft.operators.ConnectedComponents]]), O(log n) rounds for
    * arbitrary component diameter, driver sees only a convergence
    * checksum; the edge lists arrive payload-free from the audited
    * m07/m08 pipelines. The DuckDB twin is the d07-style recursive
    * CTE over the SAME spliced m07p/m08p chains the family oracles
    * and the d15 manifest run. */
  private def mediaDedupClusters(s: SparkSession, dir: String): DataFrame = {
    // Cluster sizes via the shared KeyedCounts aggregate+join (r14,
    // the d07 conversion — hot-component rationale in KeyedCounts'
    // scaladoc); labels are the disk materialization, so both reads
    // are parquet scans.
    graft.operators.KeyedCounts
      .withGroupSize(mediaClusterLabels(s, dir), "cluster", "n_members")
      .select(col("doc").as("media_id"), col("cluster").as("cluster_id"), col("n_members"))
      .orderBy(col("media_id"))
  }

  /** CC labels over the merged m07+m08 edges — shared by m09/m10/m13.
    * The EDGE LIST is memoized (scan-rooted union of the two digest
    * pipelines — recomputable after eviction, so memo-safe by the
    * d11/m07 rule; measured r12: each of m09/m10 was otherwise paying
    * the full ~1.2 s m07+m08 rebuild). The CC LABELS are
    * localCheckpoint-backed, so a persist() memo is banned (the
    * d07/d12 rule — eviction + executor loss = permanent
    * missing-block failure); since r13 they are DISK-materialized
    * instead ([[PersistedAggregates.diskMemo]]): the contraction runs
    * once per (key, dir), the label map lands in parquet, and every
    * consumer — three queries now read this relation — serves from a
    * scan-rooted plan that survives executor loss. Measured
    * (CcConsumersProbe, sf0.1 warm): 1.4-1.8 s/consumer → first pays
    * the build, the rest the ~0.3 s scan tail. */
  private def mediaClusterLabels(s: SparkSession, dir: String): DataFrame =
    PersistedAggregates.diskMemo(s, "m09_labels", dir) {
      graft.operators.ConnectedComponents.run(
        PersistedAggregates.memo(s, "m09_edges", dir) {
          audioNearDup(s, dir).select(col("media_a"), col("media_b"))
            .unionByName(imageNearDup(s, dir).select(col("media_a"), col("media_b")))
            .distinct()
        },
        "media_a", "media_b", 50)
    }

  /** The m09/m10-shared DuckDB CC chain (assumes m07p/m08p in scope;
    * splice under WITH RECURSIVE): edges both directions → recursive
    * reach → `mlab(media, cluster)` with cluster = component min. */
  // lazy: declared below `defs`, which splices it at object init
  private[queries] lazy val mediaCcDuckCte = s"""
      medges AS (
        SELECT media_a AS src, media_b AS dst FROM m07p WHERE n_shared >= $AudioMinShared
        UNION SELECT media_b, media_a FROM m07p WHERE n_shared >= $AudioMinShared
        UNION SELECT media_a, media_b FROM m08p WHERE hamming <= $MaxImageHamming
        UNION SELECT media_b, media_a FROM m08p WHERE hamming <= $MaxImageHamming),
      mnodes AS (SELECT DISTINCT src AS media FROM medges),
      mreach AS (
        SELECT media, media AS cluster FROM mnodes
        UNION
        SELECT e.dst AS media, r.cluster FROM mreach r JOIN medges e ON e.src = r.media),
      mlab AS (SELECT media, MIN(cluster) AS cluster FROM mreach GROUP BY media)"""

  /** m10: media survivors — the d12 rule for the media domain: within
    * each m09 cluster keep the copy with the LARGEST payload (the
    * highest-fidelity original among re-encodes; resolution/bitrate
    * collapses to byte count for the deterministic fake codec), min
    * media id as tiebreak. Payload size is the UTF-8 BYTE count on
    * every path (r13 ADVICE fix): Spark `octet_length(text)` here,
    * `length(bytes)` on m13's binary payload, `strlen(text)` in both
    * Duck twins — all four agree on ANY corpus, not just single-byte
    * ASCII, so the keeper choice can never drift between the survivor
    * manifest, the curation card, and the oracles
    * (`MediaPayloadLengthSpec` pins the non-ASCII agreement).
    *
    * Scale shape: the struct-argmax per cluster is map-side
    * combinable (the d12/M4 pattern, never a window); the byte-length
    * join touches only clustered media (≪ corpus). */
  /** m13: the MEDIA CURATION CARD — the d16 dataset-card analog for the
    * media families: per modality, pre- vs post-dedup counts, payload
    * bytes, and the m04 estimated-token budget after the m09/m10 drop
    * rule (non-keeper members of every near-dup cluster drop). This is
    * the sign-off artifact a multimodal training run reads: how many
    * tokens of each modality actually survive curation, and what
    * fraction of the raw budget dedup reclaimed. Composes the SAME
    * relations m09/m10 ship — labels from [[mediaClusterLabels]], the
    * keeper rule verbatim — so card and survivor manifest cannot drift
    * (the d15/d16 no-drift rule; the Duck twin splices the m07/m08/CC
    * chains).
    *
    * Scale shape: tokens and bytes are metadata/scan-local arithmetic
    * (the m04 rule — payload never decoded); the drop set is
    * cluster-bounded but grows LINEARLY with the corpus at a constant
    * dup rate, so it is deliberately NOT hinted as a broadcast side
    * (the r13 IVF lesson: an O(N)-sized broadcast is a hard OOM at
    * the 100 TB target, however small it looks at test SF) — the flag
    * join is a plain media_id-keyed left join and AQE still promotes
    * it to a broadcast at runtime whenever the drop set actually
    * fits; the final aggregate is 3 rows. */
  private def mediaCurationCard(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{DoubleType, LongType}
    val base = MediaPipeline.load(s, dir).toDF()
      .select(col("media_id"), col("kind"),
        length(col("bytes")).cast(LongType).as("payload_bytes"),
        estTokensCol.as("est_tokens"))
    val labels = mediaClusterLabels(s, dir)
    val keepers = labels
      .join(base.select(col("media_id"), col("payload_bytes")),
        col("doc") === col("media_id"))
      .groupBy(col("cluster"))
      .agg(max(struct(col("payload_bytes").as("b"),
        (-col("media_id")).as("negid"))).as("m"))
      .select((-col("m.negid")).as("keeper_id"))
    val dropped = labels
      .join(keepers, col("doc") === col("keeper_id"), "left_anti")
      .select(col("doc").as("media_id"), lit(true).as("is_dropped"))
    base.join(dropped, Seq("media_id"), "left")
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n_media"),
        sum(when(col("is_dropped"), 1L).otherwise(0L)).as("n_dropped"),
        sum(col("payload_bytes")).as("payload_bytes"),
        sum(when(col("is_dropped"), 0L).otherwise(col("payload_bytes"))).as("kept_bytes"),
        sum(col("est_tokens")).as("est_tokens"),
        sum(when(col("is_dropped"), 0L).otherwise(col("est_tokens"))).as("kept_tokens"))
      .select(col("kind"), col("n_media"),
        (col("n_media") - col("n_dropped")).as("n_kept"), col("n_dropped"),
        col("payload_bytes"), col("kept_bytes"),
        col("est_tokens"), col("kept_tokens"),
        (col("kept_tokens").cast(DoubleType) / col("est_tokens")).as("kept_token_share"))
      .orderBy(col("kind"))
  }

  private def mediaSurvivors(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.LongType
    val lens = Tables.documents(s, dir)
      .select(col("doc_id").as("media_id"),
        expr("octet_length(text)").cast(LongType).as("payload_bytes"))
    mediaClusterLabels(s, dir)
      .join(lens, col("doc") === col("media_id"))
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_members"),
        max(struct(col("payload_bytes").as("b"), (-col("media_id")).as("negid"))).as("m"))
      .select(col("cluster").as("cluster_id"), col("n_members"),
        (-col("m.negid")).as("keeper_media"), col("m.b").as("keeper_bytes"))
      .orderBy(col("cluster_id"))
  }

  /** m12: energy (VAD-style) segmentation — the audio counterpart of
    * m11's scene cuts: frames classified active/quiet against the
    * media's own mean energy (the relative-threshold rule real voice-
    * activity detectors use — robust to per-recording gain), maximal
    * constant-class runs emitted as a SEGMENT MANIFEST (one row per
    * segment with class and frame span): the artifact an audio
    * pipeline consumes to clip silence before token budgeting, and to
    * bound transcription work to active spans. Runs over audio files
    * AND video soundtracks (the m07 domain).
    *
    * Exactness: the threshold is the integer cross-multiplication
    * `energy · n_frames < total_energy` (strictly below the mean) —
    * no division, no float, identical in both engines. Scale shape:
    * payloads die at the frame-energy projection; the mean arrives as
    * same-partition window aggregates (no media-grain join), and
    * every window keys on `media_id` — one shuffle end to end. */
  private def energySegments(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val fr = MediaPipeline.audioFrameEnergies(MediaPipeline.load(s, dir)).toDF()
    val wm = Window.partitionBy(col("media_id"))
    val wo = Window.partitionBy(col("media_id")).orderBy(col("frame_idx"))
    fr.withColumn("e_tot", sum(col("energy")).over(wm))
      .withColumn("nf", count(lit(1)).over(wm))
      .withColumn("low", col("energy") * col("nf") < col("e_tot"))
      .withColumn("pl", lag(col("low"), 1).over(wo))
      .withColumn("new_seg",
        when(col("pl").isNull || col("pl") =!= col("low"), 1L).otherwise(0L))
      .withColumn("seg_idx",
        sum(col("new_seg")).over(wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("media_id"), col("seg_idx"))
      .agg(count(lit(1)).as("n_frames"),
        min(col("frame_idx")).as("start_frame"),
        max(col("frame_idx")).as("end_frame"),
        max(when(col("low"), 1L).otherwise(0L)).as("lowi"))
      .select(col("media_id"), col("seg_idx"),
        when(col("lowi") === 1L, "quiet").otherwise("active").as("cls"),
        col("n_frames"), col("start_frame"), col("end_frame"))
      .orderBy(col("media_id"), col("seg_idx"))
  }

  /** m11: shot/scene segmentation — the temporal structure pass every
    * video curation pipeline runs after frame sampling: a CUT is a
    * sampled frame whose perceptual fingerprint differs from its
    * predecessor; a SCENE is a maximal run of identical fingerprints
    * (static shots, title cards, freeze frames). Scene counts and
    * longest-static-run feed video quality filters (slideshow vs
    * motion), per-scene token budgeting, and keyframe selection — one
    * representative frame per scene instead of per sample.
    *
    * Scale shape: payloads die at the m02 fingerprint projection (the
    * m05 digest rule); both windows and both aggregates partition by
    * `media_id`, so a video's frames land in one task and run-length
    * reduction never crosses media (the a07 sessionization shape). The
    * distinct-frame count is the only second aggregate, joined back on
    * the same key — no corpus-wide shuffle anywhere. */
  private def sceneSegments(s: SparkSession, dir: String): DataFrame =
    segmentStats(MediaPipeline.sampleFrames(MediaPipeline.load(s, dir)).toDF())

  /** The m11 run-length core over any (media_id, frame_idx, frame_md5)
    * frame — extracted as the spec seam: the synthetic corpus has no
    * adjacent-identical frames (every run has length 1), so the
    * multi-frame-scene semantics are pinned by `SceneSegmentSpec`
    * against hand-computed sequences (the t19 rule: when the data
    * can't exercise a branch, a constructed fixture must). */
  private[graft] def segmentStats(frames: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.LongType
    val wo = Window.partitionBy(col("media_id")).orderBy(col("frame_idx"))
    val runs = frames
      .withColumn("pf", lag(col("frame_md5"), 1).over(wo))
      .withColumn("cut",
        when(col("pf").isNull || col("pf") =!= col("frame_md5"), 1L).otherwise(0L))
      .withColumn("run_id",
        sum(col("cut")).over(wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("media_id"), col("run_id"))
      .agg(count(lit(1)).as("rl"))
    val seg = runs.groupBy(col("media_id"))
      .agg(sum(col("rl")).as("n_frames"),
        count(lit(1)).as("n_scenes"),
        max(col("rl")).as("longest_scene"))
    val dct = frames.groupBy(col("media_id"))
      .agg(countDistinct(col("frame_md5")).as("n_distinct_frames"))
    seg.join(dct, "media_id")
      .select(col("media_id"), col("n_frames").cast(LongType).as("n_frames"),
        col("n_distinct_frames"), col("n_scenes"), col("longest_scene"))
      .orderBy(col("media_id"))
  }
}
