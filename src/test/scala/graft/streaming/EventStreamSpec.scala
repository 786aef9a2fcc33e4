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

  test("session_window sessionization merges across batches and matches batch gaps") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(java.sql.Timestamp, Long)]
    def ts(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

    val sessions = EventStream.sessionize(
      input.toDF().toDF("ts", "user_id"), gap = "30 minutes", watermark = "1 hour")
    val q = sessions.writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try {
      // user 1: events at 10:00 and 10:20 land in DIFFERENT micro-batches
      // but the same session (gap 20 min < 30); 11:30 starts a new one.
      // user 2: one single-event session.
      input.addData((ts(10, 0), 1L), (ts(10, 5), 2L))
      q.processAllAvailable()
      input.addData((ts(10, 20), 1L), (ts(11, 30), 1L))
      q.processAllAvailable()
      // watermark push: 14:00 - 1h = 13:00 closes every session above
      input.addData((ts(14, 0), 99L))
      q.processAllAvailable()
      val rows = s.sql(
        """SELECT user_id, session_start, session_end, n_events FROM sess_out
           WHERE user_id < 99 ORDER BY user_id, session_start""")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
      assert(rows.toSeq == Seq(
        (1L, ts(10, 0), ts(10, 50), 2L),  // merged across batches; end = last + gap
        (1L, ts(11, 30), ts(12, 0), 1L),
        (2L, ts(10, 5), ts(10, 35), 1L)),
        s"unexpected sessions: ${rows.toSeq}")
    } finally q.stop()
  }

  test("sessionizedEvents file-stream emits closed sessions consistent with batch a10") {
    val s = spark
    val sf = "/root/testdata/sf0.001"
    val q = EventStream.sessionizedEvents(s, sf)
      .writeStream.format("memory").queryName("sess_events_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // Append mode only emits sessions the final watermark passed; every
      // emitted session must agree with the batch gap-sessionization on
      // (user, start, count).
      val emitted = s.sql(
        "SELECT user_id, session_start, n_events FROM sess_events_out")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
      val f = org.apache.spark.sql.functions
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts", "event_id")
      // > gap, the a10 rule: session_window merges touching windows,
      // so an event exactly `gap` later stays in the SAME session —
      // the batch twin's strict-inequality split matches it exactly
      // (pinned by data in the composed-pipeline test below).
      val batch = graft.Tables.events(s, sf)
        .withColumn("prev", f.lag("ts", 1).over(w))
        .withColumn("new_sess",
          f.when(f.col("prev").isNull.or(
            f.col("ts").cast("long") - f.col("prev").cast("long") > 1800), 1L).otherwise(0L))
        .withColumn("sess_id", f.sum("new_sess").over(
          w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
        .groupBy("user_id", "sess_id")
        .agg(f.min("ts").as("session_start"), f.count(f.lit(1)).as("n_events"))
        .select("user_id", "session_start", "n_events")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
      assert(emitted.nonEmpty, "no sessions emitted — watermark never advanced?")
      assert(emitted.subsetOf(batch),
        s"streaming sessions disagree with batch: ${(emitted -- batch).take(3)}")
    } finally q.stop()
  }

  test("stream-stream interval join attributes purchases to in-horizon clicks only") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val clicks = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(java.sql.Timestamp, Long, Long)]
    val purchases = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(java.sql.Timestamp, Long, Long)]
    def ts(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

    val joined = EventStream.attributionJoin(
      clicks.toDF().toDF("ts", "user_id", "event_id"),
      purchases.toDF().toDF("ts", "user_id", "event_id"),
      horizon = "30 minutes", watermark = "1 hour")
    val q = joined.writeStream.format("memory").queryName("attr_out")
      .outputMode("append").start()
    try {
      // user 1: click 10:00 (in horizon of 10:20 purchase), click 9:40
      // (40 min before — outside), and the sides arrive in DIFFERENT
      // micro-batches. user 2's click must never match user 1's purchase.
      clicks.addData((ts(9, 40), 1L, 100L), (ts(10, 0), 1L, 101L), (ts(10, 10), 2L, 200L))
      q.processAllAvailable()
      purchases.addData((ts(10, 20), 1L, 900L))
      q.processAllAvailable()
      // advance both watermarks so results flush
      clicks.addData((ts(13, 0), 9L, 999L))
      purchases.addData((ts(13, 0), 9L, 998L))
      q.processAllAvailable()
      val rows = s.sql(
        "SELECT purchase_id, user_id, click_id FROM attr_out WHERE user_id = 1 ORDER BY click_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(rows.toSeq == Seq((900L, 1L, 101L)),
        s"expected only the in-horizon same-user click: ${rows.toSeq}")
    } finally q.stop()
  }

  test("left-outer interval join emits unattributed purchases with null clicks") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val clicks = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(java.sql.Timestamp, Long, Long)]
    val purchases = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(java.sql.Timestamp, Long, Long)]
    def ts(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

    val joined = EventStream.attributionJoin(
      clicks.toDF().toDF("ts", "user_id", "event_id"),
      purchases.toDF().toDF("ts", "user_id", "event_id"),
      horizon = "30 minutes", watermark = "1 hour", joinType = "left_outer")
    val q = joined.writeStream.format("memory").queryName("attr_outer_out")
      .outputMode("append").start()
    try {
      // user 1 purchases WITH a prior click; user 2 purchases organically.
      clicks.addData((ts(10, 0), 1L, 101L))
      purchases.addData((ts(10, 20), 1L, 900L), (ts(10, 25), 2L, 901L))
      q.processAllAvailable()
      // The unmatched row may only flush after the watermark proves no
      // in-horizon click can still arrive — push it far past.
      clicks.addData((ts(14, 0), 9L, 999L))
      purchases.addData((ts(14, 0), 9L, 998L))
      q.processAllAvailable()
      val rows = s.sql(
        """SELECT purchase_id, user_id, click_id FROM attr_outer_out
           WHERE user_id IN (1, 2) ORDER BY purchase_id""")
        .collect().map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) -1L else r.getLong(2)))
      assert(rows.toSeq == Seq((900L, 1L, 101L), (901L, 2L, -1L)),
        s"expected one attributed and one null-click purchase: ${rows.toSeq}")
    } finally q.stop()
  }

  /** The composed ingest chain a real deployment runs as ONE query:
    * at-least-once events → watermark dedup → sessionization. Two
    * stacked stateful operators is exactly where watermark propagation
    * can surprise (the session agg sees the DEDUP's output watermark),
    * so this pins (a) duplicates never inflate session counts even when
    * the replay lands in a later micro-batch, (b) the final answer is
    * INDEPENDENT of micro-batch boundaries (same data, two different
    * splits, identical sessions), and (c) the exact-gap boundary rule
    * by data: session_window merges TOUCHING windows, so an event
    * arriving exactly `gap` after the previous one stays in the SAME
    * session — agreeing with a10's `ts - prev > gap` split. Round 4
    * documented the opposite from the window extent alone; this
    * fixture is what makes the boundary claim empirical. */
  test("composed dedup→sessionize pipeline: duplicate-proof, batch-split independent, exact-gap pinned") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    def ts(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    // (ts, user_id, event_id): u1 has two sessions split by a 40-min
    // silence and a replayed event per session; u3's second event lands
    // EXACTLY gap (30 min) after the first. Arrival order keeps every
    // event (replays included) within the 1-hour watermark of the max
    // event time seen before it — batch-split independence is only
    // promised for non-late data; a replay older than the watermark is
    // DROPPED by design, which is the state bound, not a bug.
    val all = Seq(
      (ts(10, 0), 1L, 101L), (ts(10, 0), 3L, 301L), (ts(10, 20), 1L, 102L),
      (ts(10, 0), 1L, 101L), // replay of 101, arriving batches later
      (ts(10, 20), 1L, 102L), // replay of 102
      (ts(10, 30), 3L, 302L), (ts(11, 0), 1L, 103L))
    val closer = (ts(16, 0), 99L, 999L)

    def run(name: String, batches: Seq[Seq[(java.sql.Timestamp, Long, Long)]]): Seq[(Long, java.sql.Timestamp, java.sql.Timestamp, Long)] = {
      val input = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(java.sql.Timestamp, Long, Long)]
      val pipeline = EventStream.sessionize(
        EventStream.dedupWithinWatermark(
          input.toDF().toDF("ts", "user_id", "event_id"),
          "event_id", watermark = "1 hour"),
        gap = "30 minutes", watermark = "1 hour")
      val q = pipeline.writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
        input.addData(closer); q.processAllAvailable()
        s.sql(s"SELECT user_id, session_start, session_end, n_events FROM $name WHERE user_id < 99")
          .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
          .sortBy(r => (r._1, r._2.getTime)).toSeq
      } finally q.stop()
    }

    val expected = Seq(
      (1L, ts(10, 0), ts(10, 50), 2L),  // replays deduped: 2 events, not 3
      (1L, ts(11, 0), ts(11, 30), 1L),
      // exact-gap pair: windows [10:00,10:30) and [10:30,11:00) touch
      // and MERGE — one session, end = last + gap
      (3L, ts(10, 0), ts(11, 0), 2L))

    // Split A: one event per micro-batch (replays in LATER batches than
    // their originals). Split B: everything in a single batch.
    val a = run("pipe_a", all.map(Seq(_)))
    val b = run("pipe_b", Seq(all))
    assert(a == expected, s"split-A sessions wrong: $a")
    assert(b == expected, s"split-B sessions wrong: $b")

    // The a10 batch rule (`ts - prev > gap`) on the SAME deduped data
    // also keeps u3's exact-gap pair in ONE session — streaming and
    // batch agree at the boundary, and a drift in either rule (a
    // strict-overlap session merge, or a `>=` batch split) fails here.
    val f = org.apache.spark.sql.functions
    val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id").orderBy("ts", "event_id")
    val batchSessions = all.distinct.toDF("ts", "user_id", "event_id")
      .withColumn("prev", f.lag("ts", 1).over(w))
      .withColumn("new_sess", f.when(f.col("prev").isNull.or(
        f.col("ts").cast("long") - f.col("prev").cast("long") > 1800), 1L).otherwise(0L))
      .withColumn("sess_id", f.sum("new_sess").over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy("user_id", "sess_id").agg(f.count(f.lit(1)).as("n"))
      .filter(f.col("user_id") === 3L).collect().map(_.getLong(2))
    assert(batchSessions.toSeq == Seq(2L),
      s"a10's > rule must keep the exact-gap pair together: ${batchSessions.toSeq}")
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
