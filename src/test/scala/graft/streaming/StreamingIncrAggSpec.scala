package graft.streaming

import org.apache.spark.sql.functions._

/** a39's maintained view run as it would actually deploy: the partial
  * aggregate (exact DECIMAL sums + counts per group) is ALGEBRAIC, so
  * the same plan runs as a Structured Streaming aggregation — each
  * micro-batch's partials merge into state — and the converged state
  * must equal the batch partials bit-for-bit. This is the streaming
  * half of the IVM story `IncrementalAggSpec` pins for batch deltas:
  * arrival order and batch boundaries cannot drift the view. */
class StreamingIncrAggSpec extends SparkTestBase {

  test("streaming-maintained partials converge to the batch view exactly") {
    val s = spark
    val sf = "/root/testdata/sf0.001"
    val li = graft.Tables.lineitem(s, sf)
    // stage as multiple files so maxFilesPerTrigger=1 forces real
    // cross-batch state merges (the StreamingCmsSpec discipline)
    val stagedRoot = java.nio.file.Files.createTempDirectory("graft-li-stream")
    try {
    val staged = {
      li.repartition(3).write.mode("overwrite").parquet(stagedRoot.resolve("li").toString)
      stagedRoot.resolve("li").toString
    }
    val stream = s.readStream.schema(li.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(staged)
    val q = graft.queries.AnalyticsQueries.incrAggPartials(stream)
      .writeStream.format("memory").queryName("ivm_out")
      .outputMode("complete")
      .start()
    try {
      q.processAllAvailable()
      assert(q.lastProgress.batchId >= 2,
        s"expected >=3 micro-batches, got batchId ${q.lastProgress.batchId} — " +
          "the cross-batch merge was not exercised")
      def key(r: org.apache.spark.sql.Row) =
        (r.getAs[String]("l_returnflag"), r.getAs[String]("l_linestatus"))
      val streaming = s.sql("SELECT * FROM ivm_out").collect()
        .map(r => key(r) -> (r.getAs[java.math.BigDecimal]("p_qty"),
          r.getAs[java.math.BigDecimal]("p_price"), r.getAs[Long]("p_cnt"))).toMap
      val batch = graft.queries.AnalyticsQueries.incrAggPartials(li).collect()
        .map(r => key(r) -> (r.getAs[java.math.BigDecimal]("p_qty"),
          r.getAs[java.math.BigDecimal]("p_price"), r.getAs[Long]("p_cnt"))).toMap
      assert(streaming.nonEmpty && streaming.keySet == batch.keySet)
      streaming.keySet.foreach { k =>
        assert(streaming(k) == batch(k),
          s"streaming view diverged from batch on $k: ${streaming(k)} vs ${batch(k)}")
      }
    } finally q.stop()
    } finally deleteTree(stagedRoot) // covers mid-staging failure too
  }
}
