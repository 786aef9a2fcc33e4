package graft.queries

import graft.streaming.SparkTestBase
import org.apache.spark.sql.functions._

/** d23 contract: the arrival manifest's verdicts PARTITION each
  * family's routing rows exactly — every arriving item appears exactly
  * once, and its verdict/reason/keeper/cell are the composed family
  * rows (d09 exact over d22 near-dup for documents, m14 for media,
  * s23 ingest-assignment and s24 tombstones for embeddings), nothing
  * re-derived. A drift between the manifest and any family query is a
  * composition bug by definition — the families are the audited
  * sources of truth. */
class ArrivalManifestSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("document rows compose d09 (priority 1) and d22 (priority 2) exactly") {
    val man = q("d23_arrival_manifest").filter(col("item_type") === "document")
      .collect().map(r => r.getAs[Long]("item_id") ->
        (r.getAs[String]("verdict"), r.getAs[String]("reason"),
          r.getAs[Long]("keeper_id"), r.getAs[Long]("n_signals"),
          r.getAs[Long]("cell"))).toMap
    val d09 = q("d09_incremental_dedup").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Boolean]("is_dup"), r.getAs[Long]("index_doc"))).toMap
    val d22 = q("d22_incremental_lsh").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Boolean]("is_neardup"), r.getAs[Long]("index_doc"),
          r.getAs[Long]("n_verified"))).toMap
    assert(man.keySet == d09.keySet, "manifest documents != d09 arrival slice")
    assert(man.keySet == d22.keySet, "manifest documents != d22 arrival slice")
    man.foreach { case (id, (verdict, reason, keeper, nSig, cell)) =>
      val (exact, exKeeper) = d09(id)
      val (near, lshKeeper, nVerified) = d22(id)
      val expected =
        if (exact) ("drop", "exact_dup", exKeeper)
        else if (near) ("drop", "lexical_neardup", lshKeeper)
        else ("keep", "novel", -1L)
      assert((verdict, reason, keeper) == expected,
        s"doc $id: got ($verdict,$reason,$keeper), family rows say $expected")
      assert(nSig == (if (exact) 1L else 0L) + nVerified,
        s"doc $id: n_signals $nSig != exact+verified ${(if (exact) 1L else 0L) + nVerified}")
      assert(cell == -1L, s"doc $id carries a cell")
    }
    // non-vacuity: both verdict classes appear, and at least one doc
    // has BOTH families firing (priority contention — exact must win).
    // A lexical-only arrival does not exist in the driver corpus at
    // any SF (planted near-dups share their 16-word prefix, so d09
    // fires whenever d22 does — checked r17 at sf0.001 and sf0.01);
    // the d22-only branch is covered by the cell-level expectation
    // above, which derives the reason from the family rows.
    val reasons = man.values.map(_._2).toSet
    assert(Set("exact_dup", "novel").subsetOf(reasons),
      s"fixture exercises only $reasons")
    assert(man.keys.exists(id => d09(id)._1 && d22(id)._1),
      "no arrival with BOTH exact and near-dup signals — priority merge unexercised")
  }

  test("media rows partition ALL THREE families' routing rows by kind") {
    val man = q("d23_arrival_manifest").filter(col("item_type") === "media")
      .collect().map(r => r.getAs[Long]("item_id") ->
        (r.getAs[String]("verdict"), r.getAs[String]("reason"),
          r.getAs[Long]("keeper_id"), r.getAs[Long]("n_signals"))).toMap
    // the manifest's media domain is EVERY arriving media record —
    // kind decides the family, absence from a family's feature grain
    // (too short to frame/print/aHash) routes novel by absence
    val arriving = graft.multimodal.MediaPipeline.load(spark, sf)
      .filter(col("media_id") % 10 === 0)
      .toDF().select("media_id").collect().map(_.getLong(0)).toSet
    assert(man.keySet == arriving, "manifest media != arriving media records")
    val m14 = q("m14_incremental_frame_dedup").collect()
      .map(r => r.getAs[Long]("media_id") ->
        (r.getAs[Boolean]("is_dup"), r.getAs[Long]("index_media"),
          r.getAs[Long]("n_frames_in_index"))).toMap
    // m15's query output spans audio AND video (both carry audio
    // tracks); the manifest's audio leg must see only the audio rows
    val m15 = q("m15_incremental_audio_dedup").collect()
      .filter(_.getAs[String]("kind") == "audio")
      .map(r => r.getAs[Long]("media_id") ->
        (r.getAs[Boolean]("is_dup"), r.getAs[Long]("index_media"),
          r.getAs[Long]("n_partners"))).toMap
    val m16 = q("m16_incremental_image_dedup").collect()
      .map(r => r.getAs[Long]("media_id") ->
        (r.getAs[Boolean]("is_neardup"), r.getAs[Long]("index_media"),
          r.getAs[Long]("n_matches"))).toMap
    // each family's rows land in the manifest verbatim; kind = id % 3
    // (0 image / 1 audio / 2 video, the MediaPipeline convention)
    man.foreach { case (id, (verdict, reason, keeper, nSig)) =>
      val (family, dropReason) = (id % 3) match {
        case 2 => (m14.get(id), "video_frame_overlap")
        case 1 => (m15.get(id), "audio_print_overlap")
        case _ => (m16.get(id), "image_ahash_neardup")
      }
      val (dup, idx, sig) = family.getOrElse((false, -1L, 0L))
      if (dup) assert((verdict, reason, keeper) == ("drop", dropReason, idx),
        s"media $id: got ($verdict,$reason,$keeper), family says drop/$dropReason/$idx")
      else assert((verdict, reason, keeper) == ("keep", "novel", -1L),
        s"media $id: got ($verdict,$reason,$keeper), family says keep")
      assert(nSig == sig, s"media $id: n_signals $nSig != family's $sig")
    }
    // non-vacuity at this SF: a video drop exists; audio/image drops
    // are fixture-limited at sf0.001 (the image branch fires at sf0.01
    // — checked r18 — and the reason derivation above is pinned
    // per-row against the family either way)
    assert(man.values.exists(_._2 == "video_frame_overlap") &&
      man.values.exists(_._1 == "keep"))
    // every family contributes manifest rows (the audio/image legs are
    // not silently empty)
    assert(Set(0L, 1L, 2L).subsetOf(man.keySet.map(_ % 3)),
      "a media kind is missing from the manifest")
  }

  test("embedding rows are the s23 ingest assignment minus tombstones, " +
      "plus the s24 tombstoned cells (delete wins on overlap)") {
    val man = q("d23_arrival_manifest").filter(col("item_type") === "embedding")
      .collect().map(r => r.getAs[Long]("item_id") ->
        (r.getAs[String]("verdict"), r.getAs[String]("reason"),
          r.getAs[Long]("keeper_id"), r.getAs[Long]("cell"))).toMap
    val e = SimilarityQueries.vecs(spark, sf)
    val (_, _, iasg, _) = SimilarityQueries.ingestAssignments(spark, sf)
    val tomb = SimilarityQueries.tombstones(e).collect()
      .map(_.getAs[Long]("vec_id")).toSet
    val adds = iasg.collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cell")).toMap
    val asg = SimilarityQueries.ivfAssigned(spark, sf).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cell")).toMap
    // expDel is the FULL tombstone set — the engine's contract keeps
    // never-indexed delete ids with cell -1 (the totality fix), so the
    // expectation must not pre-filter on the fitted assignment (r17
    // ADVICE: a fixture with such an id would fail here misleadingly).
    val expDel = tomb
    val expAdd = adds.keySet -- tomb
    assert(man.keySet == expDel ++ expAdd,
      "manifest embedding ids != (tombstones ∪ ingest-assigned) with delete precedence")
    man.foreach { case (id, (verdict, reason, keeper, cell)) =>
      assert(keeper == -1L, s"vec $id carries a keeper")
      if (tomb(id)) {
        assert((verdict, reason) == ("index_delete", "tombstone"), s"vec $id")
        assert(cell == asg.getOrElse(id, -1L),
          s"vec $id: vacated cell $cell != fitted ${asg.getOrElse(id, -1L)}")
      } else {
        assert((verdict, reason) == ("index_add", "cell_assign"), s"vec $id")
        assert(cell == adds(id), s"vec $id: assigned cell $cell != s23 ${adds(id)}")
      }
    }
    // the fixture must exercise the delete-wins overlap (vec_id ≡ 0
    // mod 10 AND ≡ 3 mod 7, e.g. 10, 80, 150 …) or the precedence
    // assertion above is vacuous
    assert(tomb.exists(adds.contains), "no ingest∩tombstone overlap in fixture")
  }
}
