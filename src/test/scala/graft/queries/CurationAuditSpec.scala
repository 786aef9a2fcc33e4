package graft.queries

import org.apache.spark.sql.functions._

/** Semantic contracts for the round-13 curation-audit queries (d21,
  * s19, s20, t25, t26) — the invariants the value-level oracle can't
  * express because they relate a query's output to OTHER relations
  * (planted fixtures, sibling queries, the raw tables). */
class CurationAuditSpec extends graft.streaming.SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("d21: every Jaccard-verified pair is scored, similarity is the exact lev/max-len ratio") {
    val rows = q("d21_editdist_verify")
      .select("doc_a", "doc_b", "len_a", "len_b", "lev", "edit_sim", "confirmed")
      .collect()
    assert(rows.nonEmpty, "planted near-dups must produce verified pairs")
    rows.foreach { r =>
      val (lenA, lenB, lev, sim, confirmed) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5), r.getBoolean(6))
      assert(lev >= math.abs(lenA - lenB) && lev <= math.max(lenA, lenB),
        s"levenshtein out of its length bounds: $r")
      assert(sim == 1.0 - lev.toDouble / math.max(lenA, lenB),
        s"edit_sim is not the declared ratio: $r")
      assert(confirmed == (sim >= DedupQueries.EditSimTau))
    }
    // the cascade narrows: d21 scores exactly the pairs d07 clusters
    // (the unrounded memoized relation, not d04's display-rounded column)
    val nVerified = DedupQueries.jaccardPairs(spark, sf)
      .filter(col("jacc") >= DedupQueries.JaccThreshold).count()
    assert(rows.length.toLong == nVerified,
      s"d21 scored ${rows.length} pairs, Jaccard verified $nVerified")
  }

  test("s19: held-out and training sides are disjoint, top-k dense, leak flag is the tau cut") {
    val rows = q("s19_eval_decontamination").collect()
    assert(rows.nonEmpty)
    val evalIds = rows.map(_.getLong(0)).toSet
    val trainIds = rows.map(_.getLong(2)).toSet
    assert(evalIds.intersect(trainIds).isEmpty,
      "a doc appears on both sides of the split")
    // dense ranks 1..k per held-out doc, cosines non-increasing
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val byRank = rs.sortBy(_.getLong(1))
      assert(byRank.map(_.getLong(1)).toSeq ==
        (1L to SimilarityQueries.LeakTopK.toLong))
      val cosines = byRank.map(_.getDouble(3)).toSeq
      assert(cosines == cosines.sorted.reverse, "cosines not ranked")
    }
    rows.foreach { r =>
      assert(r.getBoolean(4) == (r.getDouble(3) >= SimilarityQueries.LeakTau))
    }
  }

  test("s20: per-label edge accounting is closed over the s16 graph") {
    val audit = q("s20_knn_label_consistency").collect()
    assert(audit.nonEmpty)
    audit.foreach { r =>
      val (nVec, nEdges, nSame, nMutual) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(5))
      assert(nEdges <= nVec * SimilarityQueries.KnnK,
        s"more edges than k per vector allows: $r")
      assert(nSame <= nEdges && nMutual <= nEdges)
      assert(r.getDouble(4) == nSame.toDouble / nEdges)
      assert(r.getDouble(6) == nMutual.toDouble / nEdges)
    }
    // edge totals must equal the s16 graph partitioned by query label
    val graphEdges = q("s16_knn_graph").count()
    assert(audit.map(_.getLong(2)).sum == graphEdges,
      "audit edge totals do not partition the s16 graph")
  }

  test("t25: planted PII is found exactly — one hit per planted span, all of it redacted") {
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id")).collect().map(_.getLong(0))
    val rows = q("t25_pii_redaction").collect()
    assert(rows.map(_.getLong(3)).sum == docs.count(_ % 7 == 0), "email hits")
    assert(rows.map(_.getLong(4)).sum == docs.count(_ % 11 == 0), "phone hits")
    assert(rows.map(_.getLong(5)).sum == docs.count(_ % 13 == 0), "ip hits")
    val expectAffected = docs.count(d => d % 7 == 0 || d % 11 == 0 || d % 13 == 0)
    assert(rows.map(_.getLong(2)).sum == expectAffected, "docs_with_pii")
    // redaction strictly shrinks every planted span (spans are longer
    // than their placeholders by construction)
    assert(rows.map(_.getLong(6)).sum > 0, "no characters removed")
  }

  test("t31: planted IPv6/SSN/card spans found exactly; Luhn rejects the invalid plants") {
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id")).collect().map(_.getLong(0))
    val rows = q("t31_pii_extended").collect()
    assert(rows.map(_.getAs[Long]("n_ipv6")).sum == docs.count(_ % 17 == 0), "ipv6 hits")
    assert(rows.map(_.getAs[Long]("n_ssns")).sum == docs.count(_ % 19 == 0), "ssn hits")
    // shaped = valid plants (% 23) + invalid plants (% 29); a doc can carry both
    val shaped = docs.count(_ % 23 == 0) + docs.count(_ % 29 == 0)
    assert(rows.map(_.getAs[Long]("n_cards_shaped")).sum == shaped, "card-shaped hits")
    // the checksum is computed, not assumed: exactly the valid plants
    // survive and every % 29 plant is rejected
    assert(rows.map(_.getAs[Long]("n_cards_valid")).sum == docs.count(_ % 23 == 0),
      "Luhn-valid count != planted valid cards")
    // boundary guard negative control: the % 31 20-digit runs must not
    // leak a 16-digit prefix into the card counts (already covered by
    // the exact shaped-count assertion above), and docs carrying ONLY
    // such a run must not count as PII-affected...
    val expectAffected =
      docs.count(d => d % 17 == 0 || d % 19 == 0 || d % 23 == 0 || d % 29 == 0)
    assert(rows.map(_.getAs[Long]("docs_with_pii")).sum == expectAffected, "docs_with_pii")
    // ...while conservative redaction still removes them: docs with a
    // % 31 plant and nothing else contribute removed chars (span is 20
    // + ' ref '/' x' framing minus '<CARD>' = strictly positive)
    assert(rows.map(_.getAs[Long]("chars_removed")).sum > 0, "no characters removed")
  }

  test("t26: novelty partitions the vocabulary — first sources sum to the distinct gram count") {
    val rows = q("t26_source_novelty").collect()
    assert(rows.nonEmpty)
    val firstSource = rows.map(_.getString(0)).min
    val first = rows.find(_.getString(0) == firstSource).get
    assert(first.getDouble(4) == 1.0,
      "the first-ingested source must be 100% novel")
    graft.functions.GraftFunctions.register(spark)
    val totalDistinct = graft.Tables.documents(spark, sf)
      .select(explode(expr("array_distinct(graft_gramhash(text))")).as("g"))
      .agg(countDistinct(col("g"))).collect().head.getLong(0)
    assert(rows.map(_.getLong(3)).sum == totalDistinct,
      "every distinct gram must be attributed to exactly one first source")
    rows.foreach { r =>
      assert(r.getLong(3) <= r.getLong(1), s"more new grams than grams: $r")
    }
  }

  test("t27: per-doc spans are internally consistent and tile the concatenated stream") {
    val rows = q("t27_sequence_packing").collect()
    assert(rows.nonEmpty)
    val ctx = TextQueries.SeqTokens
    rows.foreach { r =>
      val (n, off, first, last, nSeqs, split) = (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getBoolean(6))
      assert(off >= 0 && off < ctx, s"start_off out of range: $r")
      // the doc's local span re-derives its sequence count
      assert(last - first == (off + n - 1) / ctx, s"span inconsistent: $r")
      assert(nSeqs == last - first + 1 && split == (nSeqs > 1))
    }
    val total = rows.map(_.getLong(1)).sum
    assert(rows.map(_.getLong(4)).max == (total - 1) / ctx,
      "max seq_last must pin the total token stream length")
  }

  test("m13: card accounting closes over the m10 survivor manifest") {
    val card = q("m13_media_curation_card").collect()
    assert(card.nonEmpty)
    card.foreach { r =>
      val (n, kept, dropped) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(kept + dropped == n, s"kept/dropped do not partition: $r")
      assert(r.getLong(5) <= r.getLong(4) && r.getLong(7) <= r.getLong(6),
        s"kept totals exceed raw totals: $r")
      val share = r.getDouble(8)
      assert(share > 0.0 && share <= 1.0)
    }
    // the drop count is exactly the non-keeper cluster mass m10 reports
    val clusters = q("m10_media_survivors").collect()
    val expectDropped = clusters.map(_.getLong(1) - 1).sum
    assert(card.map(_.getLong(3)).sum == expectDropped,
      "card drop count disagrees with the m10 manifest")
  }

  test("t29: the manifest is total, stages compose in order, and train sequences tile") {
    val rows = q("t29_training_manifest").collect()
    val docs = graft.Tables.documents(spark, sf).count()
    assert(rows.length.toLong == docs, "manifest must be total over documents")
    val byStatus = rows.groupBy(_.getString(1))
    // packing only over train: everything else carries the -1 sentinel
    rows.foreach { r =>
      val (status, first, last) = (r.getString(1), r.getLong(3), r.getLong(4))
      if (status == "train") assert(first >= 0 && last >= first, s"unpacked train doc: $r")
      else assert(first == -1L && last == -1L, s"non-train doc packed: $r")
    }
    // drop statuses are exactly d15's document-domain drop set
    val d15Drops = q("d15_drop_manifest")
      .filter(col("item_type") === "document" && col("verdict") === "drop")
      .select("item_id").collect().map(_.getLong(0)).toSet
    val t29Drops = rows.filter(_.getString(1).startsWith("drop:")).map(_.getLong(0)).toSet
    assert(t29Drops == d15Drops, "t29 and d15 disagree on the document drop set")
    // the packed stream tiles the surviving train tokens exactly
    val train = byStatus("train")
    val trainTokens = train.map(_.getLong(2)).sum
    assert(train.map(_.getLong(4)).max == (trainTokens - 1) / TextQueries.SeqTokens,
      "train sequence ids do not tile the kept-token stream")
    assert(byStatus.keySet.intersect(Set("validation", "test")).nonEmpty,
      "expected held-out docs in the manifest")
  }

  test("s21: population accounting closes over s10 and dedup buys measurable diversity") {
    val r = q("s21_dedup_diversity").collect().head
    val (nFull, nKept, nDropped) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(nKept + nDropped == nFull, "kept/dropped do not partition the corpus")
    assert(nDropped == q("s10_semantic_dedup").count(),
      "drop count disagrees with the s10 drop list")
    assert(r.getLong(3) <= nFull && r.getLong(4) <= nKept,
      "more NN-bearing vectors than vectors")
    val (meanFull, meanKept, gain) = (r.getDouble(7), r.getDouble(8), r.getDouble(9))
    assert(meanFull >= -1.0 && meanFull <= 1.0 && meanKept >= -1.0 && meanKept <= 1.0)
    assert(gain == meanFull - meanKept, "gain is not the declared difference")
    // deterministic fixture: the s10 pass must spread the kept set out
    // (per-vector NN cosine can only shrink when candidates are
    // removed; on this corpus the mean moves the same way)
    assert(gain > 0.0, s"semantic dedup bought no diversity: $r")
  }

  test("t30: CMS estimates dominate exact counts and the sketch finds the true heaviest term") {
    val rows = q("t30_heavy_hitters").collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      assert(r.getBoolean(4), s"CMS underestimated: $r")
      assert(r.getLong(2) >= r.getLong(1) && r.getLong(3) == r.getLong(2) - r.getLong(1))
    }
    // independent argmax over the raw token stream
    val trueTop = graft.Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("x"))
      .groupBy("x").count().orderBy(col("count").desc, col("x"))
      .limit(1).collect().head
    assert(rows.head.getString(0) == trueTop.getString(0) &&
      rows.head.getLong(1) == trueTop.getLong(1),
      "sketch report disagrees with the brute-force heaviest term")
  }

  test("t28: weights normalize, the budget is exhausted, temperature flattens toward the mean") {
    val rows = q("t28_mixture_plan").collect()
    assert(rows.length > 1)
    val weightSum = rows.map(_.getDouble(4)).sum
    assert(math.abs(weightSum - 1.0) < 1e-9, s"sample weights sum to $weightSum")
    val drawn = rows.map(_.getLong(5)).sum
    val budget = TextQueries.MixBudgetTokens
    assert(drawn <= budget && drawn > budget - rows.length * 2,
      s"floor-rounded draws $drawn stray from budget $budget")
    // sqrt temperature flattens: the largest source loses share, the
    // smallest gains (strict unless all sources are equal-sized)
    val byTokens = rows.sortBy(_.getLong(2))
    assert(byTokens.last.getDouble(4) <= byTokens.last.getDouble(3),
      "largest source must not gain share under temperature")
    assert(byTokens.head.getDouble(4) >= byTokens.head.getDouble(3),
      "smallest source must not lose share under temperature")
  }

  test("m14 => m05: every arriving video the incremental pass drops is visible to the batch pass") {
    // If >= half an ingest video's frames exist in the base index, each
    // of those frames is shared by >= 2 media in the FULL corpus, so the
    // batch cross-video pass (m05) must report the video with
    // n_shared_frames >= its m14 hit count — the incremental verdict is
    // a restriction of the batch one, never a new claim.
    val m14 = q("m14_incremental_frame_dedup").collect()
      .filter(_.getAs[Boolean]("is_dup"))
    assert(m14.nonEmpty, "no arriving video flagged - the implication tests nothing")
    val m05 = q("m05_frame_dedup").collect()
      .map(r => r.getAs[Long]("media_id") -> r.getAs[Long]("n_shared_frames")).toMap
    m14.foreach { r =>
      val m = r.getAs[Long]("media_id")
      assert(m05.contains(m), s"m14 dropped media $m invisible to the batch pass")
      assert(m05(m) >= r.getAs[Long]("n_frames_in_index"),
        s"batch pass sees fewer shared frames than the incremental hits on $m")
    }
  }
}
