package graft.streaming

import org.apache.spark.sql.functions._

/** m15/m16's arrival paths under batching: arriving media probed
  * batch-by-batch through `probeAudioIndex` / `probeImageIndex` must
  * union to the one-shot m15/m16 verdicts exactly — each media's
  * routing row depends only on its own decoded prints/hash and the
  * fixed materialized index (the a39/d22/m14 batch≡streaming
  * property, completed for every near-dup modality). Real-stream
  * mechanics are pinned by `StreamingFrameDedupSpec` for the media
  * pipeline's decode path; this spec pins the two new probes'
  * batch-boundary independence. */
class StreamingMediaArrivalSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("batched audio probes union to the one-shot m15 verdicts exactly") {
    val s = spark
    val all = graft.multimodal.MediaPipeline.load(s, sf)
      .filter(col("media_id") % 10 === 0)
    val batched = (0 until 3).flatMap { b =>
      graft.queries.MultimodalQueries
        .probeAudioIndex(s, sf, all.filter(col("media_id") % 3 === b))
        .collect().map(_.toString)
    }.sorted
    val oneShot = graft.SparkEntry
      .queries("m15_incremental_audio_dedup")(s, sf)
      .collect().map(_.toString).sorted.toSeq
    assert(batched.nonEmpty && batched == oneShot,
      s"audio arrival batching changed verdicts (${batched.size} vs ${oneShot.size})")
  }

  test("batched image probes union to the one-shot m16 verdicts exactly") {
    val s = spark
    val all = graft.multimodal.MediaPipeline.load(s, sf)
      .filter(col("media_id") % 10 === 0)
    val batched = (0 until 3).flatMap { b =>
      graft.queries.MultimodalQueries
        .probeImageIndex(s, sf, all.filter((col("media_id") + 1) % 3 === b))
        .collect().map(_.toString)
    }.sorted
    val oneShot = graft.SparkEntry
      .queries("m16_incremental_image_dedup")(s, sf)
      .collect().map(_.toString).sorted.toSeq
    assert(batched.nonEmpty && batched == oneShot,
      s"image arrival batching changed verdicts (${batched.size} vs ${oneShot.size})")
  }
}
