package graft.multimodal

import org.apache.spark.sql.functions._

/** m14 contract: the incremental media pass routes on the same frame
  * digests the batch pass uses — every output row reproduces from an
  * independent set replica over the collected (media, digest) rows —
  * and the probed index is the disk materialization, not a base
  * re-decode. */
class IncrementalFrameDedupSpec extends graft.streaming.SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("m14: rows reproduce from an independent digest-set replica") {
    val rows = graft.SparkEntry.queries("m14_incremental_frame_dedup")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    val frames = MediaPipeline.sampleFrames(MediaPipeline.load(spark, sf)).toDF()
      .select(col("media_id"), col("frame_md5")).distinct()
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val index: Map[String, Long] = frames.filter(_._1 % 10 != 0)
      .groupBy(_._2).map { case (fh, xs) => fh -> xs.map(_._1).min }
    val ingest = frames.filter(_._1 % 10 == 0).groupBy(_._1)
    assert(rows.length == ingest.size)
    assert(rows.exists(_.getAs[Boolean]("is_dup")),
      "no arriving video flagged — the fixture measures nothing")
    rows.foreach { r =>
      val m = r.getAs[Long]("media_id")
      val digests = ingest(m).map(_._2)
      val hits = digests.flatMap(fh => index.get(fh))
      assert(r.getAs[Long]("n_frames") == digests.size)
      assert(r.getAs[Long]("n_frames_in_index") == hits.size)
      assert(r.getAs[Long]("index_media") ==
        (if (hits.isEmpty) -1L else hits.min))
      assert(r.getAs[Boolean]("is_dup") == (hits.size * 2 >= digests.size))
    }
  }

  test("m14: the probed index is the materialization, not a base re-decode") {
    val idx = graft.queries.MultimodalQueries.frameIndexBase(spark, sf)
    val plan = graft.PlanTestUtils.formatted(idx.queryExecution)
    assert(plan.contains("graft_memo"),
      "frame index is not served from the diskMemo materialization")
    assert(!plan.contains("documents"),
      "the probe path still carries the base-corpus decode lineage")
  }
}
