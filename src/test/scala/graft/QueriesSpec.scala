package graft

import graft.streaming.SparkTestBase

/** Smoke: every registered query executes at sf0.001 and the flagship
  * returns rows (the t1 gate). Full value-level correctness is covered
  * by the DuckDB oracle gate (tools/local_verify.py). */
class QueriesSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  // Watch Spark's CodeGenerator logger while every registered query
  // executes below. A Janino compile failure is SILENT in results
  // (Spark falls back to interpreted execution, values stay correct)
  // but it forfeits whole-stage codegen for the entire stage — round
  // 8 found graft_gramhash had been falling back in every query that
  // used it because a companion-object name collision suppressed the
  // static forwarder its generated code called. This pin turns that
  // class of perf regression into a test failure.
  private val codegenErrors = new java.util.concurrent.ConcurrentLinkedQueue[String]()

  private def attachCodegenWatcher(): Unit = {
    import org.apache.logging.log4j.{Level, LogManager}
    import org.apache.logging.log4j.core.LoggerContext
    import org.apache.logging.log4j.core.appender.AbstractAppender
    import org.apache.logging.log4j.core.config.{LoggerConfig, Property}
    val watcher = new AbstractAppender(
        "graft-codegen-watch", null, null, false, Array.empty[Property]) {
      override def append(e: org.apache.logging.log4j.core.LogEvent): Unit =
        if (e.getLevel.isMoreSpecificThan(Level.ERROR))
          codegenErrors.add(String.valueOf(e.getMessage.getFormattedMessage).take(300))
    }
    watcher.start()
    val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
    val cls = "org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator"
    val cfg = ctx.getConfiguration
    cfg.addAppender(watcher)
    val loggerCfg = new LoggerConfig(cls, Level.ERROR, true)
    loggerCfg.addAppender(watcher, Level.ERROR, null)
    cfg.addLogger(cls, loggerCfg)
    ctx.updateLoggers()
  }
  attachCodegenWatcher()

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"query $name executes") {
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty)
      assert(df.count() >= 0)
    }
  }

  // Registered AFTER the per-query execution tests: asserts over
  // everything they compiled.
  test("no registered query silently loses whole-stage codegen (zero CodeGenerator errors)") {
    val errs = codegenErrors.toArray(Array.empty[String])
    assert(errs.isEmpty,
      s"${errs.length} codegen compile failure(s) — interpreted fallback is a silent " +
        s"perf regression:\n${errs.take(3).mkString("\n")}")
  }

  test("s08 quantized rerank is dominated by s01 exact search per rank (candidate-subset)") {
    // s08 reranks a quantized-scan candidate subset with the EXACT
    // cosine, so at every rank its cosine can be at most s01's (global
    // exact top-k). A violation means the rerank scored with the wrong
    // vectors or the quantized candidate stage leaked extra pairs.
    import org.apache.spark.sql.functions.col
    def byRank(q: String): Map[(Long, Long), Double] =
      SparkEntry.queries(q)(spark, sf)
        .select(col("q_id"), col("rnk"), col("cosine"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val exact = byRank("s01_ann_bruteforce")
    val quant = byRank("s08_ann_quantized")
    assert(quant.nonEmpty)
    quant.foreach { case (key, cosQ) =>
      val cosX = exact.getOrElse(key,
        fail(s"s08 produced a (q_id, rnk) pair s01 lacks: $key"))
      assert(cosQ <= cosX,
        s"quantized rank ${key._2} for query ${key._1} BEATS exact: $cosQ > $cosX")
    }
  }

  test("t16 quality terciles are balanced and monotone per language") {
    import org.apache.spark.sql.functions.col
    val rows = SparkEntry.queries("t16_quality_buckets")(spark, sf)
      .select(col("lang"), col("bucket"), col("n_docs"), col("min_score"), col("max_score"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    val langs = rows.keySet.map(_._1)
    assert(langs.nonEmpty)
    langs.foreach { lang =>
      val Seq(tail, mid, head) =
        Seq("tail", "middle", "head").map(b => rows((lang, b)))
      // ntile balance: tile sizes differ by at most one
      val sizes = Seq(tail._1, mid._1, head._1)
      assert(sizes.max - sizes.min <= 1, s"$lang terciles unbalanced: $sizes")
      // monotone tiers: the (score, doc_id) total order puts every tail
      // row before every middle row, so score ranges cannot interleave
      assert(tail._3 <= mid._2, s"$lang: tail max ${tail._3} > middle min ${mid._2}")
      assert(mid._3 <= head._2, s"$lang: middle max ${mid._3} > head min ${head._2}")
    }
  }

  test("t18 LM perplexity terciles are balanced and monotone per language") {
    // The t16 structural contract carried to the model-based filter:
    // ntile balance (tile sizes within 1) and non-interleaving score
    // ranges — tail's max avg log-prob never exceeds middle's min, etc.
    import org.apache.spark.sql.functions.col
    val rows = SparkEntry.queries("t18_lm_quality_filter")(spark, sf)
      .select(col("lang"), col("bucket"), col("n_docs"),
        col("min_logprob"), col("max_logprob"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    val langs = rows.keySet.map(_._1)
    assert(langs.nonEmpty)
    langs.foreach { lang =>
      val Seq(tail, mid, head) =
        Seq("tail", "middle", "head").map(b => rows((lang, b)))
      val sizes = Seq(tail._1, mid._1, head._1)
      assert(sizes.max - sizes.min <= 1, s"$lang LM terciles unbalanced: $sizes")
      assert(tail._3 <= mid._2, s"$lang: tail max ${tail._3} > middle min ${mid._2}")
      assert(mid._3 <= head._2, s"$lang: middle max ${mid._3} > head min ${head._2}")
      // a trained LM separates quality: the head tercile must sit at a
      // strictly higher avg log-prob (lower perplexity) than the tail
      assert(head._2 > tail._2, s"$lang: LM failed to separate head from tail")
    }
  }

  test("d10 dup-chunk counts are internally consistent") {
    import org.apache.spark.sql.functions.col
    val rows = SparkEntry.queries("d10_chunk_dedup")(spark, sf)
      .select(col("doc_id"), col("n_chunks"), col("n_dup_chunks"), col("is_dup_heavy"))
      .collect()
    assert(rows.nonEmpty, "chunk dedup found no duplicated chunks at sf0.001")
    rows.foreach { r =>
      val (n, dup, heavy) = (r.getLong(1), r.getLong(2), r.getBoolean(3))
      assert(dup >= 1 && dup <= n, s"doc ${r.getLong(0)}: dup=$dup outside [1, $n]")
      assert(heavy == (dup * 100 >= n * 50), s"doc ${r.getLong(0)}: flag drifted from ratio")
    }
  }

  test("d12 keeper is the max-quality member of its d07 cluster") {
    import org.apache.spark.sql.functions.col
    val members = SparkEntry.queries("d07_dedup_clusters")(spark, sf)
      .select(col("doc_id"), col("cluster_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val quality = SparkEntry.queries("t01_doc_quality")(spark, sf)
      .select(col("doc_id"), col("quality_score")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val byCluster = members.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    val keepers = SparkEntry.queries("d12_quality_survivors")(spark, sf)
      .select(col("cluster_id"), col("n_members"), col("keeper_doc"), col("keeper_score"))
      .collect()
    assert(keepers.nonEmpty)
    assert(keepers.map(_.getLong(0)).toSet == byCluster.keySet,
      "d12 and d07 disagree on the cluster set")
    keepers.foreach { r =>
      val (cid, n, keeper, score) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      val docs = byCluster(cid)
      assert(docs.contains(keeper), s"cluster $cid keeper $keeper is not a member")
      assert(n == docs.size, s"cluster $cid n_members $n != ${docs.size}")
      val best = docs.map(quality).max
      assert(score == best, s"cluster $cid keeper score $score != max member quality $best")
    }
  }

  test("m05 only reports video media with genuinely shared frames") {
    import org.apache.spark.sql.functions.col
    val rows = SparkEntry.queries("m05_frame_dedup")(spark, sf)
      .select(col("media_id"), col("n_frames"), col("n_shared_frames"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(0) % 3 == 2, s"media ${r.getLong(0)} is not a video (doc_id % 3 = 2)")
      assert(r.getLong(2) >= 1 && r.getLong(2) <= r.getLong(1))
    }
    // shared-ness is mutual: a frame shared by media A lives in >= 2
    // media, so the report can never contain exactly one media
    assert(rows.length != 1, "a shared frame needs at least two media")
  }

  test("m07 audio near-dup pairs are well-formed (ordered, audio-bearing kinds, bounded overlap)") {
    import org.apache.spark.sql.functions.col
    val rows = SparkEntry.queries("m07_audio_neardup")(spark, sf)
      .select(col("media_a"), col("kind_a"), col("media_b"), col("kind_b"),
        col("n_shared"), col("overlap"))
      .collect()
    // sf0.001 may legitimately have no audio near-dups; every emitted
    // row must still satisfy the pair contract.
    rows.foreach { r =>
      val (a, ka, b, kb) = (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3))
      assert(a < b, s"pair not ordered: $a >= $b")
      assert(Set("audio", "video")(ka) && Set("audio", "video")(kb),
        s"non-audio-bearing kind in pair: $ka/$kb")
      assert(ka == (if (a % 3 == 1) "audio" else "video"), s"kind_a drifted for media $a")
      assert(kb == (if (b % 3 == 1) "audio" else "video"), s"kind_b drifted for media $b")
      assert(r.getLong(4) >= 2, s"pair below MinShared: ${r.getLong(4)}")
      assert(r.getDouble(5) > 0.0 && r.getDouble(5) <= 1.0,
        s"overlap outside (0, 1]: ${r.getDouble(5)}")
    }
  }

  test("m08 image near-dup pairs are well-formed (images only, hamming bound, ordered)") {
    import org.apache.spark.sql.functions.col
    val rows = SparkEntry.queries("m08_image_neardup")(spark, sf)
      .select(col("media_a"), col("media_b"), col("hamming"), col("similarity"))
      .collect()
    rows.foreach { r =>
      val (a, b, h) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(a < b, s"pair not ordered: $a >= $b")
      assert(a % 3 == 0 && b % 3 == 0, s"non-image media in pair: $a/$b")
      assert(h >= 0 && h <= 16, s"hamming outside [0, 16]: $h")
      assert(r.getDouble(3) == 1.0 - h / 64.0, "similarity drifted from hamming")
    }
  }

  test("bloom pair: zero false negatives, rejects non-members (the d11 pruning premise)") {
    graft.functions.GraftFunctions.register(spark)
    spark.range(1000).selectExpr("CAST(id AS STRING) AS s")
      .createOrReplaceTempView("graft_bloom_members")
    val r = spark.sql("""
      WITH bf AS (SELECT graft_bloom_agg(xxhash64(s), 10000L, 65536L) AS b
                  FROM graft_bloom_members),
      probe AS (SELECT id,
                  graft_bloom_contains((SELECT b FROM bf), xxhash64(CAST(id AS STRING))) AS m
                FROM range(3000))
      SELECT SUM(CASE WHEN id < 1000 AND NOT m THEN 1L ELSE 0L END) AS false_negs,
             SUM(CASE WHEN id >= 1000 AND m THEN 1L ELSE 0L END) AS false_pos,
             SUM(CASE WHEN id >= 1000 THEN 1L ELSE 0L END) AS clean
      FROM probe""").collect()(0)
    assert(r.getLong(0) == 0, "bloom missed a member — impossible for a correct sketch")
    assert(r.getLong(1) * 10 <= r.getLong(2),
      s"bloom passed ${r.getLong(1)}/${r.getLong(2)} non-members; pruning premise broken")
  }

  test("s09 IVF+SQ8 is dominated by s06 plain IVF per rank (quantized-candidate subset)") {
    // s09 reranks a quantized-top-20 SUBSET of exactly s06's in-cell
    // candidates with the exact cosine, so rank-r can never beat s06's
    // rank-r; and both emit the same (q_id, rnk) key set (top-20 ⊇
    // top-5 whenever the cell has candidates at all).
    import org.apache.spark.sql.functions.col
    def byRank(q: String): Map[(Long, Long), Double] =
      SparkEntry.queries(q)(spark, sf)
        .select(col("q_id"), col("rnk"), col("cosine"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val ivf = byRank("s06_ann_ivf")
    val ivfq = byRank("s09_ann_ivf_quantized")
    assert(ivfq.nonEmpty && ivfq.keySet == ivf.keySet,
      s"s09/s06 key sets differ: ${(ivfq.keySet diff ivf.keySet) ++ (ivf.keySet diff ivfq.keySet)}")
    ivfq.foreach { case (key, cos9) =>
      assert(cos9 <= ivf(key),
        s"IVF+SQ8 rank ${key._2} for query ${key._1} BEATS plain IVF: $cos9 > ${ivf(key)}")
    }
  }

  test("Lloyd-fitted IVF centroids beat the raw seeds on mean in-cell cosine") {
    // The k-means objective: a Lloyd round re-centers each cell on its
    // members' mean, so the fitted index must bind vectors to their
    // cells more tightly than the raw stride-thinned seeds do. A fit
    // that regressed to (or broke) the seeds fails this strict
    // inequality.
    import org.apache.spark.sql.functions._
    import graft.queries.SimilarityQueries
    val e = SimilarityQueries.vecs(spark, sf)
    def meanInCellCos(cent: org.apache.spark.sql.DataFrame): Double =
      e.join(SimilarityQueries.assignCells(e, cent), "vec_id")
        .join(cent, col("cell") === col("s_id"))
        .select((expr("graft_dot(v, sv)") / (col("nrm") * col("sn"))).as("c"))
        .agg(avg(col("c"))).head().getDouble(0)
    val seedObj = meanInCellCos(SimilarityQueries.ivfSeeds(e))
    val fitObj = meanInCellCos(SimilarityQueries.ivfCentroids(spark, sf))
    assert(fitObj > seedObj,
      s"fitted centroids did not improve the objective: $fitObj <= $seedObj")
  }

  test("s10 SemDeDup drop list is well-formed (keeper precedes, threshold held, within-cell)") {
    import org.apache.spark.sql.functions.col
    import graft.queries.SimilarityQueries
    val e = SimilarityQueries.vecs(spark, sf)
    val cellOf = SimilarityQueries.ivfAssigned(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = SparkEntry.queries("s10_semantic_dedup")(spark, sf)
      .select(col("vec_id"), col("cell"), col("keeper"), col("max_cos"), col("n_close"))
      .collect()
    assert(rows.nonEmpty, "SemDeDup found no semantic duplicates at sf0.001")
    rows.foreach { r =>
      val (v, cell, keeper) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(keeper < v, s"keeper $keeper does not precede dropped $v")
      assert(cellOf(v) == cell && cellOf(keeper) == cell,
        s"drop pair ($keeper, $v) not within cell $cell")
      assert(r.getDouble(3) >= 0.3, s"max_cos below tau: ${r.getDouble(3)}")
      assert(r.getLong(4) >= 1)
    }
    // keepers are never themselves dropped in favor of a LATER id —
    // min-id greedy means a dropped vec's keeper either survives or
    // was dropped for an even earlier keeper
    val droppedSet = rows.map(_.getLong(0)).toSet
    rows.foreach { r =>
      if (droppedSet(r.getLong(2))) {
        val keeperRow = rows.find(_.getLong(0) == r.getLong(2)).get
        assert(keeperRow.getLong(2) < r.getLong(2))
      }
    }
  }

  test("s11 PQ rerank is dominated by s01 exact search per rank; recall contract vs s08") {
    // Dominance is a theorem: s11 reranks a PQ-ADC candidate SUBSET
    // with the exact cosine, so at every rank its cosine is at most
    // s01's (global exact top-k over the full candidate set). The
    // recall leg is the honest memory-for-recall contract: PQ stores
    // PqM codes per vector where SQ8 stores D bytes (16x less here),
    // so s08's recall may exceed s11's — what must hold is that the
    // PQ path still FINDS true neighbors (recall measurable and
    // nonzero), i.e. the codebooks quantize the corpus, not noise.
    import org.apache.spark.sql.functions.col
    def pairs(q: String): Set[(Long, Long)] =
      SparkEntry.queries(q)(spark, sf)
        .select(col("q_id"), col("c_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def byRank(q: String): Map[(Long, Long), Double] =
      SparkEntry.queries(q)(spark, sf)
        .select(col("q_id"), col("rnk"), col("cosine"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val exact = byRank("s01_ann_bruteforce")
    val pq = byRank("s11_ann_pq")
    assert(pq.nonEmpty)
    pq.foreach { case (key, cosP) =>
      val cosX = exact.getOrElse(key,
        fail(s"s11 produced a (q_id, rnk) pair s01 lacks: $key"))
      assert(cosP <= cosX,
        s"PQ rank ${key._2} for query ${key._1} BEATS exact: $cosP > $cosX")
    }
    val truth = pairs("s01_ann_bruteforce")
    val recallPq = pairs("s11_ann_pq").count(truth).toDouble / truth.size
    val recallSq = pairs("s08_ann_quantized").count(truth).toDouble / truth.size
    assert(truth.nonEmpty && recallPq > 0.0,
      s"PQ recall@5 not measurable or zero: $recallPq")
    info(f"recall@5: s11 PQ (${graft.queries.SimilarityQueries.PqM} codes/vec) " +
      f"$recallPq%.3f vs s08 SQ8 (D bytes/vec) $recallSq%.3f")
  }

  test("Lloyd-fitted PQ codebooks beat the raw seeds on quantization error") {
    // Per-subspace Lloyd: re-centering each codeword cell on its
    // members' mean cannot increase the summed squared-L2 assignment
    // error; on real data the improvement is strict. A fit that
    // regressed to (or broke) the seed codebooks fails here. The
    // subspace decomposition and seed rule come from
    // SimilarityQueries itself (pqSeeds, the spec seam) — the test
    // measures the REAL fit, not a re-implementation that could drift.
    import graft.queries.SimilarityQueries
    val e = SimilarityQueries.vecs(spark, sf)
    val seeds = SimilarityQueries.pqSeeds(e)
    val seedErr = QueriesSpec.pqDistortion(e, seeds)
    val fitErr = QueriesSpec.pqDistortion(e, SimilarityQueries.pqCodebooks(spark, sf))
    assert(fitErr < seedErr,
      s"fitted PQ codebooks did not improve quantization error: $fitErr >= $seedErr")
  }

  test("d15 manifest is total, keepers precede where the rule says so, priority merge holds") {
    import org.apache.spark.sql.functions.col
    val rows = SparkEntry.queries("d15_drop_manifest")(spark, sf)
      .select(col("item_type"), col("item_id"), col("verdict"), col("reason"),
        col("keeper"), col("n_signals"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getString(3),
        r.getLong(4), r.getLong(5)))
    // total: exactly one verdict per document and per embedding
    val nDocs = graft.Tables.documents(spark, sf).count()
    val nVecs = graft.queries.SimilarityQueries.vecs(spark, sf).count()
    assert(rows.count(_._1 == "document") == nDocs, "manifest not total over documents")
    assert(rows.count(_._1 == "embedding") == nVecs, "manifest not total over embeddings")
    assert(rows.map(r => (r._1, r._2)).distinct.length == rows.length, "duplicate items")
    val drops = rows.filter(_._3 == "drop")
    assert(drops.nonEmpty, "no drops at sf0.001 — every family found candidates before")
    drops.foreach { case (t, id, _, reason, keeper, nSig) =>
      assert(reason != "none" && nSig >= 1, s"drop ($t,$id) lacks provenance")
      reason match {
        case "lexical_neardup" | "semantic_neardup" | "audio_neardup" | "image_neardup" =>
          assert(keeper >= 0 && keeper < id, s"($t,$id,$reason): keeper $keeper !< item")
        case "quality_cluster" =>
          assert(keeper >= 0 && keeper != id, s"($t,$id): quality keeper is the item itself")
        case "video_frame_overlap" | "chunk_duplication" =>
          assert(keeper == -1L, s"($t,$id): $reason signal has no pairwise keeper")
        case other => fail(s"unknown reason $other")
      }
    }
    rows.filter(_._3 == "keep").foreach { case (t, id, _, reason, keeper, nSig) =>
      assert(reason == "none" && keeper == -1L && nSig == 0L, s"keep ($t,$id) carries drop fields")
    }
    // priority: every d08 lexical drop candidate must surface with the
    // top-priority reason, even where d12/m-family also flagged it
    val lexDrops = graft.queries.DedupQueries.jaccardPairs(spark, sf)
      .filter(col("jacc") >= graft.queries.DedupQueries.JaccThreshold)
      .select(col("doc_b")).distinct().collect().map(_.getLong(0)).toSet
    val manifested = drops.filter(d => d._1 == "document" && lexDrops(d._2))
    assert(manifested.nonEmpty && manifested.forall(_._4 == "lexical_neardup"),
      "a lexical drop candidate lost the priority merge")
    // d10 fold (r10 ask #2): every dup-heavy doc must be dropped; the
    // ones no higher-priority family claimed carry the chunk reason
    val dupHeavy = SparkEntry.queries("d10_chunk_dedup")(spark, sf)
      .filter(col("is_dup_heavy"))
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(dupHeavy.nonEmpty, "no dup-heavy docs at sf0.001 — threshold fixture drifted")
    val docDrops = drops.filter(_._1 == "document").map(d => d._2 -> d._4).toMap
    dupHeavy.foreach { id =>
      assert(docDrops.contains(id), s"dup-heavy doc $id missing from the drop manifest")
    }
    assert(drops.exists(d => d._1 == "document" && d._4 == "chunk_duplication"),
      "no drop surfaced with the chunk_duplication reason")
  }

  test("s12 IVFPQ is dominated by s06 plain IVF per rank; residual codes beat flat PQ on distortion") {
    // Dominance is the s09 theorem in PQ clothing: s12 reranks an
    // ADC-top-20 SUBSET of exactly s06's in-cell candidates with the
    // exact cosine, so rank-r can never beat s06's rank-r, and both
    // emit the same (q_id, rnk) key set. The distortion leg is WHY
    // residual encoding exists: the coarse quantizer absorbs the
    // between-cell variance, so the same m×k codebook budget spent on
    // residuals must reconstruct x = centroid + codeword with less
    // total squared error than flat PQ's x = codeword.
    import org.apache.spark.sql.functions._
    import graft.queries.SimilarityQueries
    def byRank(q: String): Map[(Long, Long), Double] =
      SparkEntry.queries(q)(spark, sf)
        .select(col("q_id"), col("rnk"), col("cosine"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val ivf = byRank("s06_ann_ivf")
    val ivfpq = byRank("s12_ann_ivfpq")
    assert(ivfpq.nonEmpty && ivfpq.keySet == ivf.keySet,
      s"s12/s06 key sets differ: ${(ivfpq.keySet diff ivf.keySet) ++ (ivf.keySet diff ivfpq.keySet)}")
    ivfpq.foreach { case (key, cos12) =>
      assert(cos12 <= ivf(key),
        s"IVFPQ rank ${key._2} for query ${key._1} BEATS plain IVF: $cos12 > ${ivf(key)}")
    }
    val flat = QueriesSpec.pqDistortion(SimilarityQueries.vecs(spark, sf),
      SimilarityQueries.pqCodebooks(spark, sf))
    val residual = QueriesSpec.pqDistortion(
      SimilarityQueries.ivfResiduals(spark, sf).select(col("vec_id"), col("v")),
      SimilarityQueries.ivfPqCodebooks(spark, sf))
    assert(residual < flat,
      s"residual PQ did not reduce distortion: $residual >= $flat")
    info(f"PQ distortion: flat $flat%.1f vs residual $residual%.1f " +
      f"(${(1 - residual / flat) * 100}%.0f%% lower)")
  }

  test("s13 multi-probe IVFPQ: s01-dominated per rank, key superset of s12, recall measured") {
    // What is provable and what is measured (see annIvfPqMultiProbe
    // scaladoc): (a) every emitted rank reranks a candidate subset with
    // the exact cosine, so s01's global top-k dominates per rank —
    // theorem; (b) probe-1 is exactly the assigned cell (same argmax,
    // same tiebreak), so s13's candidate pool contains s12's and its
    // key set can only grow — theorem; (c) per-rank dominance over s12
    // is NOT a theorem (cross-cell ADC competition can evict an
    // own-cell candidate pre-rerank), so recall is pinned as a measured
    // fact on this corpus, not asserted as an inequality.
    import org.apache.spark.sql.functions.col
    def byRank(q: String): Map[(Long, Long), Double] =
      SparkEntry.queries(q)(spark, sf)
        .select(col("q_id"), col("rnk"), col("cosine"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    def pairs(q: String): Set[(Long, Long)] =
      SparkEntry.queries(q)(spark, sf)
        .select(col("q_id"), col("c_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = byRank("s01_ann_bruteforce")
    val mp = byRank("s13_ann_ivfpq_multiprobe")
    assert(mp.nonEmpty)
    mp.foreach { case (key, cosM) =>
      val cosX = exact.getOrElse(key,
        fail(s"s13 produced a (q_id, rnk) pair s01 lacks: $key"))
      assert(cosM <= cosX,
        s"multi-probe IVFPQ rank ${key._2} for query ${key._1} BEATS exact: $cosM > $cosX")
    }
    val single = byRank("s12_ann_ivfpq")
    assert(single.keySet.subsetOf(mp.keySet),
      s"s13 lost keys s12 has: ${single.keySet diff mp.keySet}")
    val truth = pairs("s01_ann_bruteforce")
    val r12 = pairs("s12_ann_ivfpq").count(truth).toDouble / truth.size
    val r13 = pairs("s13_ann_ivfpq_multiprobe").count(truth).toDouble / truth.size
    info(f"recall@5: s12 single-probe $r12%.3f vs s13 two-probe $r13%.3f")
    assert(r13 > 0.0, "multi-probe recall not measurable")
  }

  test("d18 audit: status dimension fixed, leakage zero, totals tie out to the verified pairs") {
    import org.apache.spark.sql.functions.col
    val rows = SparkEntry.queries("d18_residual_leakage")(spark, sf)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(rows.keySet == Set("both_dropped", "both_kept", "one_kept"),
      s"status dimension drifted: ${rows.keySet}")
    // the invariant the audit exists to prove: the lexical family drops
    // doc_b of every verified pair, so no pair can survive intact
    assert(rows("both_kept") == ((0L, 0L, 0L)),
      s"LEAKAGE: verified near-dup pairs survived the manifest: ${rows("both_kept")}")
    val nPairs = graft.queries.DedupQueries.jaccardPairs(spark, sf)
      .filter(col("jacc") >= graft.queries.DedupQueries.JaccThreshold).count()
    assert(rows.values.map(_._1).sum == nPairs,
      s"audit pair total ${rows.values.map(_._1).sum} != verified pairs $nPairs")
    rows.values.foreach { case (n, inter, union) =>
      assert(inter <= union, "per-status gram mass inconsistent (inter > union)")
      assert((n == 0L) == (union == 0L), "empty status carries gram mass or vice versa")
    }
  }

  test("d19 calibration: band-collision floor holds, totals tie out, micro-average exact") {
    import org.apache.spark.sql.functions.col
    val rows = SparkEntry.queries("d19_minhash_calibration")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (est, n, inter, union, estJ, trueJ) =>
      // candidacy requires a full 4-perm band collision: est >= 4 always
      assert(est >= 4 && est <= 16, s"bin $est outside the band-collision range")
      assert(n >= 1 && inter <= union, s"bin $est mass inconsistent")
      assert(estJ == est.toDouble / 16.0, s"bin $est estimate not the exact division")
      assert(trueJ == inter.toDouble / union, s"bin $est micro-average drifted")
    }
    val nCand = graft.queries.DedupQueries.jaccardPairs(spark, sf).count()
    assert(rows.map(_._2).sum == nCand,
      s"calibration pair total ${rows.map(_._2).sum} != candidates $nCand")
    // the selection-bias fact the table documents: the top bin is
    // honest (true ~ est), the bottom bin overestimates
    val top = rows.maxBy(_._1)
    assert(top._1 == 16 && top._6 > 0.7, "exact-signature bin lost its high true Jaccard")
  }

  test("s18 index health: totals tie to the corpus, imbalance exact, mean cosine in range") {
    val r = SparkEntry.queries("s18_index_health")(spark, sf).collect()
    assert(r.length == 1, "health report must be one row")
    val row = r.head
    val (nVecs, nSeeds, nCells, nDead) =
      (row.getAs[Long]("n_vecs"), row.getAs[Long]("n_seeds"),
        row.getAs[Long]("n_cells"), row.getAs[Long]("n_dead_seeds"))
    val (minC, maxC, imb, sumU, meanCos) =
      (row.getAs[Long]("min_cell"), row.getAs[Long]("max_cell"),
        row.getAs[Double]("imbalance"), row.getAs[Long]("sum_cos_u"),
        row.getAs[Double]("mean_cos"))
    assert(nVecs == graft.queries.SimilarityQueries.vecs(spark, sf).count(),
      "health n_vecs drifted from the corpus")
    assert(nCells >= 1 && nCells <= nSeeds && nDead == nSeeds - nCells)
    assert(minC >= 1 && minC <= maxC && maxC <= nVecs)
    assert(imb == (maxC * nCells).toDouble / nVecs, "imbalance not the exact ratio")
    assert(imb >= 1.0, "imbalance below 1 — max cell smaller than the mean is impossible")
    assert(meanCos == sumU.toDouble / nVecs / 1048576.0, "mean cosine drifted")
    assert(meanCos > 0.0 && meanCos <= 1.0, s"mean in-cell cosine out of range: $meanCos")
    // the r14 pair-pass coverage canary: no over-cap cells at this SF,
    // and the two columns tie to each other (zero cells => zero vecs)
    val (overC, overV) =
      (row.getAs[Long]("n_cells_over_cap"), row.getAs[Long]("n_vecs_over_cap"))
    assert(overC == 0 && overV == 0,
      s"unexpected over-cap cells at this SF: $overC cells / $overV vecs")
  }

  test("s17 probe sweep: recall and candidate cost monotone in nProbe, totals consistent") {
    // Monotone recall is a THEOREM here, not a hope: probe p+1's
    // candidate set contains probe p's, and any candidate that evicts
    // a truth member from an exact-cosine top-5 must itself beat that
    // member globally — i.e. be truth too. A violation means the
    // candidate sets stopped nesting (probe ranking drifted).
    val rows = SparkEntry.queries("s17_probe_sweep")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == (1L to 3L).toSeq, "sweep rows not nProbe 1..3")
    rows.foreach { case (p, nq, nc, nt, nh, rec) =>
      assert(nq >= 1 && nc >= nq, s"probe $p sizes inconsistent")
      assert(nh <= nt && rec == nh.toDouble / nt, s"probe $p recall not the exact ratio")
    }
    rows.zip(rows.tail).foreach { case (a, b) =>
      assert(b._3 >= a._3, s"candidates shrank from probe ${a._1} to ${b._1}")
      assert(b._5 >= a._5, s"hits shrank from probe ${a._1} to ${b._1} — candidate nesting broke")
    }
    // the probe-2 row must agree with s07's fixed-nProbe recall surface
    assert(rows(1)._6 > 0.0, "sweep recall not measurable")
  }

  test("t23 domain distance: integer identity holds, divisions exact, one row per source") {
    import org.apache.spark.sql.functions.col
    val rows = SparkEntry.queries("t23_domain_distance")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6)))
    val nSources = graft.Tables.documents(spark, sf)
      .select(col("source")).distinct().count()
    assert(rows.length == nSources, "a source lost its distance row")
    rows.foreach { case (src, n, xu, eu, ku, xent, kl) =>
      assert(n >= 1, s"$src has no grams")
      assert(ku == xu - eu, s"$src: kl_u is not the exact integer difference")
      assert(xent == xu.toDouble / n / 1048576.0, s"$src: xent drifted from the fixed-order division")
      assert(kl == ku.toDouble / n / 1048576.0, s"$src: kl drifted from the fixed-order division")
      // rounding slack: each integer log is within 0.5 of ln*2^20, so
      // the plug-in KL can dip below zero by at most ~2 ulps per gram
      assert(ku >= -2L * n, s"$src: KL below the rounding floor — the fold broke")
    }
  }

  test("s16 kNN graph: ranks contiguous per vector, mutual flag symmetric, edges in-cell") {
    import org.apache.spark.sql.functions.col
    val rows = SparkEntry.queries("s16_knn_graph")(spark, sf)
      .select(col("vec_id"), col("nbr_id"), col("rnk"), col("cosine"), col("mutual"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))
    assert(rows.nonEmpty)
    val k = graft.queries.SimilarityQueries.KnnK
    rows.groupBy(_._1).foreach { case (v, es) =>
      assert(es.length <= k, s"vec $v has ${es.length} > $k neighbors")
      assert(es.map(_._3).sorted.toSeq == (1L to es.length).toSeq,
        s"vec $v ranks not contiguous: ${es.map(_._3).sorted.toSeq}")
      // ranks order by cosine desc (nbr_id tiebreak)
      val byRank = es.sortBy(_._3).map(_._4)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b },
        s"vec $v cosines not descending by rank")
    }
    val edges = rows.map(e => (e._1, e._2)).toSet
    rows.foreach { case (v, n, _, _, mut) =>
      assert(mut == edges((n, v)),
        s"mutual flag wrong for ($v,$n): flag=$mut reverse=${edges((n, v))}")
    }
    assert(rows.exists(_._5) && rows.exists(!_._5),
      "corpus exercises neither mutual nor one-way edges — fixture drifted")
    // every edge stays within one fitted cell
    val cells = graft.queries.SimilarityQueries.ivfAssigned(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (v, n, _, _, _) =>
      assert(cells(v) == cells(n), s"edge ($v,$n) crosses cells")
    }
  }

  test("t22 TF-IDF: five ranks per source, exact-integer score consistent with tf and df") {
    import org.apache.spark.sql.functions.col
    val rows = SparkEntry.queries("t22_tfidf_terms")(spark, sf)
      .select(col("source"), col("rnk"), col("term"), col("tf"), col("df"),
        col("score_u"), col("tfidf"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6)))
    val nSources = graft.Tables.documents(spark, sf)
      .select(col("source")).distinct().count()
    assert(rows.groupBy(_._1).size == nSources, "a source lost its term rows")
    val nDocs = graft.Tables.documents(spark, sf).count()
    def ilog(n: Long): Long = math.floor(math.log(n.toDouble) * 1048576.0 + 0.5).toLong
    rows.groupBy(_._1).foreach { case (src, es) =>
      assert(es.map(_._2).sorted.toSeq == (1L to 5L).toSeq, s"$src ranks not 1..5")
      val byRank = es.sortBy(_._2)
      // ordered by score desc, term asc
      byRank.zip(byRank.tail).foreach { case (a, b) =>
        assert(a._6 > b._6 || (a._6 == b._6 && a._3 < b._3),
          s"$src rank order violated between ${a._3} and ${b._3}")
      }
    }
    rows.foreach { case (src, _, term, tf, df, scoreU, tfidf) =>
      assert(df >= 1 && df <= nDocs && tf >= 1, s"($src,$term) tf/df out of range")
      assert(scoreU == tf * (ilog(nDocs) - ilog(df)),
        s"($src,$term) score_u != tf * (L(N) - L(df))")
      assert(math.abs(tfidf - scoreU.toDouble / 1048576.0) == 0.0,
        s"($src,$term) tfidf is not the single exact division")
    }
  }

  test("d20 spans: subset of d14's flagged docs, within bounds, disjoint with real gaps") {
    import org.apache.spark.sql.functions.{col, size, split}
    val spans = SparkEntry.queries("d20_span_removal")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(spans.nonEmpty, "no duplicated spans at sf0.001 — fixture drifted")
    val flagged = SparkEntry.queries("d14_substring_dedup")(spark, sf)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val lens = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    spans.foreach { case (d, _, a, b, n) =>
      assert(flagged(d), s"doc $d has cut spans but d14 never flagged it")
      assert(a >= 1 && b <= lens(d) && n == b - a + 1, s"doc $d span [$a,$b] out of bounds")
    }
    spans.groupBy(_._1).foreach { case (d, ss) =>
      val ordered = ss.sortBy(_._2)
      assert(ordered.map(_._2).toSeq == (1L to ss.length).toSeq, s"doc $d span indices broken")
      ordered.zip(ordered.tail).foreach { case (x, y) =>
        assert(y._3 > x._4 + 1, s"doc $d spans ${x._2}/${y._2} touch — merge incomplete")
      }
    }
  }

  test("t24 decontam spans: training docs only, in bounds, disjoint; eval slice untouched") {
    import org.apache.spark.sql.functions.{col, size, split}
    val spans = SparkEntry.queries("t24_decontam_spans")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(spans.nonEmpty, "no eval-overlapping spans at sf0.001 — fixture drifted")
    val lens = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    spans.foreach { case (d, _, a, b, n) =>
      assert(d % 20 != 7, s"doc $d is in the eval slice — decontam must cut training docs only")
      assert(a >= 1 && b <= lens(d) && n == b - a + 1, s"doc $d span [$a,$b] out of bounds")
    }
    spans.groupBy(_._1).foreach { case (d, ss) =>
      val ordered = ss.sortBy(_._2)
      assert(ordered.map(_._2).toSeq == (1L to ss.length).toSeq, s"doc $d span indices broken")
      ordered.zip(ordered.tail).foreach { case (x, y) =>
        assert(y._3 > x._4 + 1, s"doc $d spans touch — merge incomplete")
      }
    }
  }

  test("m12 segments tile each media's frames: contiguous spans, alternating classes") {
    val rows = SparkEntry.queries("m12_energy_segments")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getInt(4), r.getInt(5)))
    assert(rows.nonEmpty)
    assert(rows.exists(_._3 == "quiet") && rows.exists(_._3 == "active"),
      "corpus exercises only one energy class — threshold fixture drifted")
    rows.groupBy(_._1).foreach { case (m, segs) =>
      val ordered = segs.sortBy(_._2)
      assert(ordered.map(_._2).toSeq == (1L to segs.length).toSeq,
        s"media $m segment indices not contiguous")
      assert(ordered.head._5 == 0, s"media $m first segment does not start at frame 0")
      ordered.foreach { case (_, i, _, nf, st, en) =>
        assert(en - st + 1 == nf, s"media $m seg $i span != frame count")
      }
      ordered.zip(ordered.tail).foreach { case (a, b) =>
        assert(b._5 == a._6 + 1, s"media $m gap between segments ${a._2} and ${b._2}")
        assert(a._3 != b._3, s"media $m adjacent segments share class — runs not maximal")
      }
    }
  }

  test("m11 scene stats are internally consistent and total over the m02 frames") {
    import org.apache.spark.sql.functions.col
    val rows = SparkEntry.queries("m11_scene_segments")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (m, nf, nd, ns, ls) =>
      assert(nd <= nf && ns <= nf && ls <= nf, s"media $m: counts exceed frames")
      assert(nd <= ns, s"media $m: more distinct fingerprints than scenes")
      assert(ls >= 1 && ns >= 1, s"media $m: degenerate stats")
      // runs of identical frames: scenes x longest bounds the frame count
      assert(ns * ls >= nf, s"media $m: longest run cannot cover the frames")
    }
    val m02Frames = SparkEntry.queries("m02_frame_sample")(spark, sf).count()
    assert(rows.map(_._2).sum == m02Frames,
      "m11 frame totals drifted from the m02 sampling grid")
  }

  test("s07 multi-probe dominates s06 single-probe per rank (candidate-set containment)") {
    // s06 searches only the query's own cell — exactly s07's
    // probe_rank-1 cell — so s07's candidate set is a superset and its
    // rank-r cosine can never be worse. A refactor that breaks cell
    // sharing between the two queries (drifting seeds or assignment)
    // shows up here as a dominance violation.
    import org.apache.spark.sql.functions.col
    def byRank(q: String): Map[(Long, Long), Double] =
      SparkEntry.queries(q)(spark, sf)
        .select(col("q_id"), col("rnk"), col("cosine"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val single = byRank("s06_ann_ivf")
    val multi = byRank("s07_ann_ivf_multiprobe")
    assert(single.nonEmpty)
    single.foreach { case (key, cos6) =>
      val cos7 = multi.getOrElse(key,
        fail(s"s07 lost a (q_id, rnk) pair s06 has: $key"))
      assert(cos7 >= cos6,
        s"multi-probe rank ${key._2} for query ${key._1} got WORSE: $cos7 < $cos6")
    }
  }
}

object QueriesSpec {
  /** Total squared quantization error of codebooks `cb` over `e`
    * (vec_id, v): each subvector's distance to its nearest codeword,
    * summed. Uses SimilarityQueries' OWN subspace decomposition so the
    * probe can never drift from the decomposition it measures. */
  private[graft] def pqDistortion(vecsDf: org.apache.spark.sql.DataFrame,
      cb: org.apache.spark.sql.DataFrame): Double = {
    import org.apache.spark.sql.functions._
    graft.queries.SimilarityQueries.subvecs(vecsDf)
      .join(broadcast(cb), Seq("sub"))
      .withColumn("d2", expr(
        "graft_dot(sv, sv) - 2.0D * graft_dot(sv, cw) + graft_dot(cw, cw)"))
      .groupBy(col("vec_id"), col("sub")).agg(min(col("d2")).as("d2"))
      .agg(sum(col("d2"))).head().getDouble(0)
  }
}
