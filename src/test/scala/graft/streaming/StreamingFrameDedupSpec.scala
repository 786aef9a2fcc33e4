package graft.streaming

import org.apache.spark.sql.functions._

/** m14's arrival path run as it would actually deploy: micro-batches
  * of newly-ingested media decode and frame-sample ONLY themselves,
  * probe the MATERIALIZED digest→keeper index, and the union of
  * per-batch routing rows must equal the one-shot batch query
  * exactly. Third modality of the batch≡streaming property —
  * a39 (relational IVM), d22 (text near-dup), now media frames:
  * every arrival-probe operator in the incremental layer is pinned
  * independent of batch boundaries. */
class StreamingFrameDedupSpec extends SparkTestBase {

  test("micro-batched frame probes union to the batch m14 verdicts exactly") {
    val s = spark
    val sf = "/root/testdata/sf0.001"
    val ingestDocs = graft.Tables.documents(s, sf).filter(col("doc_id") % 10 === 0)
    val stagedRoot = java.nio.file.Files.createTempDirectory("graft-m14-stream")
    try {
      val staged = stagedRoot.resolve("ingest").toString
      ingestDocs.repartition(3).write.mode("overwrite").parquet(staged)
      val schema = s.read.parquet(staged).schema
      val acc = new java.util.concurrent.ConcurrentLinkedQueue[
        (Long, Long, Long, Double, Boolean, Long)]()
      // atomic: foreachBatch runs on the stream thread; a plain var
      // read from the test thread after processAllAvailable has no
      // happens-before edge
      val batches = new java.util.concurrent.atomic.AtomicInteger(0)
      val q = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(staged)
        .writeStream.foreachBatch {
          (batch: org.apache.spark.sql.DataFrame, _: Long) =>
            batches.incrementAndGet()
            graft.queries.MultimodalQueries
              .probeFrameIndex(s, sf, graft.multimodal.MediaPipeline.loadFrom(s, batch))
              .collect().foreach { r =>
                acc.add((r.getAs[Long]("media_id"), r.getAs[Long]("n_frames"),
                  r.getAs[Long]("n_frames_in_index"), r.getAs[Double]("hit_ratio"),
                  r.getAs[Boolean]("is_dup"), r.getAs[Long]("index_media")))
              }
            ()
        }
        .start()
      try {
        q.processAllAvailable()
      } finally q.stop()
      assert(batches.get() >= 3, s"expected >=3 micro-batches, got ${batches.get()}")
      val streaming = acc.toArray(Array.empty[(Long, Long, Long, Double, Boolean, Long)])
        .sortBy(_._1).toSeq
      val batchRows = graft.SparkEntry.queries("m14_incremental_frame_dedup")(s, sf)
        .collect().map { r =>
          (r.getAs[Long]("media_id"), r.getAs[Long]("n_frames"),
            r.getAs[Long]("n_frames_in_index"), r.getAs[Double]("hit_ratio"),
            r.getAs[Boolean]("is_dup"), r.getAs[Long]("index_media"))
        }.sortBy(_._1).toSeq
      assert(streaming.nonEmpty && streaming == batchRows,
        s"streaming verdicts diverge from batch m14 " +
          s"(${streaming.size} vs ${batchRows.size} rows)")
    } finally deleteTree(stagedRoot)
  }
}
