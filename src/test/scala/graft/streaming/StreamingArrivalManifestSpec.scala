package graft.streaming

import org.apache.spark.sql.functions._

/** d23's composition run as it would deploy: arrivals land in
  * micro-batches, each batch probes the FIXED materialized indexes
  * through [[graft.queries.DedupQueries.probeArrivalManifest]], and
  * the union of per-batch manifests must equal the one-shot d23
  * manifest exactly — across ALL THREE id domains at once.
  *
  * Each domain's real-stream mechanics (file source, maxFilesPerTrigger,
  * foreachBatch) are already pinned by the per-family specs
  * (`StreamingIncrLshSpec` docs, `StreamingFrameDedupSpec` media,
  * `StreamingAnnIngestSpec` vectors); what THIS spec pins is the
  * composition: batching documents, media, and vectors independently
  * — deliberately misaligned batch boundaries — cannot change any
  * verdict, because every manifest row depends only on its own
  * arrival row and index state. The tombstone set is INDEX STATE
  * (fixed across batches), which is what makes the delete-wins
  * precedence batch-invariant. */
class StreamingArrivalManifestSpec extends SparkTestBase {

  test("per-batch arrival manifests union to the one-shot d23 manifest exactly") {
    val s = spark
    val sf = "/root/testdata/sf0.001"
    type Row6 = (String, Long, String, String, Long, Long, Long)
    def key(r: org.apache.spark.sql.Row): Row6 =
      (r.getAs[String]("item_type"), r.getAs[Long]("item_id"),
        r.getAs[String]("verdict"), r.getAs[String]("reason"),
        r.getAs[Long]("keeper_id"), r.getAs[Long]("n_signals"),
        r.getAs[Long]("cell"))

    val docsAll = graft.Tables.documents(s, sf).filter(col("doc_id") % 10 === 0)
    val mediaAll = graft.multimodal.MediaPipeline.load(s, sf)
      .filter(col("media_id") % 10 === 0)
    val embAll = graft.Tables.embeddings(s, sf)
      .filter(col("vec_id") % graft.queries.SimilarityQueries.IngestMod === 0)
    val tomb = graft.queries.SimilarityQueries.tombstones(
      graft.queries.SimilarityQueries.vecs(s, sf))

    // deliberately misaligned batch boundaries per domain: docs split
    // 3 ways by id mod 3, media 2 ways, vectors 3 ways offset by one,
    // delete ARRIVALS 3 ways offset by two — no two domains' batches
    // line up. The tombstone STATE (add suppression) is the full set
    // in every batch, per the seam's contract.
    val streamed = (0 until 3).flatMap { b =>
      val docs = docsAll.filter(col("doc_id") % 3 === b)
      val media = mediaAll.filter(col("media_id") % 2 === (b % 2))
        .filter(lit(b < 2)) // media arrives in the first two batches only
      val emb = embAll.filter((col("vec_id") + 1) % 3 === b)
      val delBatch = tomb.filter((col("vec_id") + 2) % 3 === b)
      graft.queries.DedupQueries
        .probeArrivalManifest(s, sf, docs, media, emb,
          deleteIds = delBatch, tombstoneState = tomb, memo = false)
        .collect().map(key)
    }
    // every batching covers each item exactly once — assert the
    // multiplicity, then the set equality
    val grouped = streamed.groupBy(r => (r._1, r._2)).view.mapValues(_.length)
    assert(grouped.values.forall(_ == 1),
      s"an item appeared ${grouped.values.max} times across batches")

    val oneShot = graft.SparkEntry.queries("d23_arrival_manifest")(s, sf)
      .collect().map(key)
    assert(streamed.nonEmpty && streamed.sorted == oneShot.sorted.toSeq,
      s"batched manifest diverges from one-shot " +
        s"(${streamed.size} vs ${oneShot.length} rows)")
  }

  test("the seam is TOTAL: featureless media of every kind and " +
      "never-indexed delete ids still get rows") {
    // r17 review: a media arrival whose sampling yields no frames
    // vanished from the per-frame rollup, and a delete request for a
    // vec_id absent from the fitted assignment was dropped by an
    // inner join — a downstream consumer treating the manifest as
    // total never learned either item arrived. r18: all three media
    // kinds route through their own family now (video frames / audio
    // prints / image aHash), so totality must hold per kind — a
    // zero-frame video, an audio clip too short to fingerprint
    // (< 384 bytes), and an image too small to aHash (< 64 bytes)
    // each get their keep/novel row by absence.
    val s = spark
    val sf = "/root/testdata/sf0.001"
    import s.implicits._
    def rec(id: Long, kind: String, n: Int) = graft.multimodal.MediaRecord(
      id, kind, Array.fill[Byte](n)('x'.toByte),
      graft.multimodal.MediaMeta(s"application/x-graft-$kind", 16, 16, n * 10L))
    val featureless = Seq(
      rec(900000001L, "video", 0),
      rec(900000003L, "audio", 100),
      rec(900000004L, "image", 10)).toDS()
    val ghostDelete = Seq(900000002L).toDF("vec_id")
    val emptyDocs = graft.Tables.documents(s, sf).filter(lit(false))
    val emptyEmb = graft.Tables.embeddings(s, sf).filter(lit(false))
    val rows = graft.queries.DedupQueries
      .probeArrivalManifest(s, sf, emptyDocs, featureless, emptyEmb,
        deleteIds = ghostDelete, tombstoneState = ghostDelete, memo = false)
      .collect()
    assert(rows.length == 4, s"manifest not total: ${rows.mkString("; ")}")
    Seq(900000001L, 900000003L, 900000004L).foreach { id =>
      val m = rows.find(r => r.getAs[String]("item_type") == "media" &&
        r.getAs[Long]("item_id") == id).get
      assert(m.getAs[String]("verdict") == "keep" &&
        m.getAs[String]("reason") == "novel" &&
        m.getAs[Long]("keeper_id") == -1L &&
        m.getAs[Long]("n_signals") == 0L, s"media $id: $m")
    }
    val del = rows.find(_.getAs[String]("item_type") == "embedding").get
    assert(del.getAs[Long]("item_id") == 900000002L &&
      del.getAs[String]("verdict") == "index_delete" &&
      del.getAs[Long]("cell") == -1L)
  }
}
