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

  test("dropDuplicatesWithinWatermark drops redelivered ids, keeps state bounded") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(java.sql.Timestamp, Long, String)]
    def ts(minute: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

    val deduped = EventStream.dedupWithinWatermark(
      input.toDF().toDF("ts", "event_id", "payload"), "event_id",
      watermark = "10 minutes")
    val q = deduped.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      input.addData((ts(0), 1L, "a"), (ts(1), 2L, "b"), (ts(1), 2L, "b-retry"))
      q.processAllAvailable()
      // an at-least-once redelivery in a later micro-batch, still within
      // the watermark: dropped
      input.addData((ts(2), 1L, "a-retry"))
      q.processAllAvailable()
      input.addData((ts(9), 3L, "c"))
      q.processAllAvailable()
      val ids = s.sql("SELECT event_id FROM dedup_out").collect().map(_.getLong(0)).sorted
      assert(ids.toSeq == Seq(1L, 2L, 3L), s"duplicates leaked: ${ids.toSeq}")
    } finally q.stop()
  }

  test("dedupedEvents file-stream wiring emits each event_id once") {
    val s = spark
    val sf = "/root/testdata/sf0.001"
    val q = EventStream.dedupedEvents(s, sf)
      .writeStream.format("memory").queryName("dedup_events_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val n = s.sql("SELECT COUNT(*) FROM dedup_events_out").collect().head.getLong(0)
      val distinct = s.sql(
        "SELECT COUNT(DISTINCT event_id) FROM dedup_events_out").collect().head.getLong(0)
      val batch = graft.Tables.events(s, sf).select("event_id").distinct().count()
      assert(n == distinct && n == batch,
        s"deduped stream must emit each id once: n=$n distinct=$distinct batch=$batch")
    } finally q.stop()
  }
}
