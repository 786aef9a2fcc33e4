package graft.streaming

/** Streaming windowed aggregation must agree with the batch answer over
  * the same events (complete mode ⇒ all windows comparable). */
class EventStreamSpec extends SparkTestBase {

  test("watermarked hourly window agg matches the batch aggregation") {
    val s = spark
    val sf = "/root/testdata/sf0.001"

    val q = EventStream.hourlyCounts(s, sf)
      .writeStream
      .format("memory").queryName("hourly_out")
      .outputMode("complete")
      .start()
    try {
      q.processAllAvailable()
      val streaming = s.sql(
        "SELECT hour, event_type, n_events FROM hourly_out ORDER BY hour, event_type")
        .collect().toSeq

      val batch = graft.Tables.events(s, sf)
        .groupBy(org.apache.spark.sql.functions.date_trunc("hour",
            org.apache.spark.sql.functions.col("ts")).as("hour"),
          org.apache.spark.sql.functions.col("event_type"))
        .count().withColumnRenamed("count", "n_events")
        .orderBy("hour", "event_type")
        .collect().toSeq

      assert(streaming.nonEmpty)
      assert(streaming == batch, "streaming window agg diverged from batch")
    } finally q.stop()
  }
}
