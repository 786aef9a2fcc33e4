package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream


/** E2E of the Structured Streaming PEL state machine over a
  * MemoryStream (live Redis replaced by the in-test source, per the
  * port strategy in SURVEY.md §5). */
class StreamingPelSpec extends SparkTestBase {

  test("deliver/ack commands maintain per-consumer PEL state across micro-batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val input = MemoryStream[PelCommand]
    val snapshots = StreamingPel.attach(s, input.toDS())
    val q = snapshots.writeStream
      .format("memory").queryName("pel_out")
      .outputMode("update")
      .start()
    try {
      // batch 1: deliver 3 to c1, 1 to c2
      input.addData(
        PelCommand("c1", "1-0", "deliver", 1000),
        PelCommand("c1", "1-1", "deliver", 1001),
        PelCommand("c1", "1-2", "deliver", 1002),
        PelCommand("c2", "1-3", "deliver", 1003))
      q.processAllAvailable()
      // batch 2: c1 acks one, one message is redelivered (retry)
      input.addData(
        PelCommand("c1", "1-0", "ack", 2000),
        PelCommand("c1", "1-1", "deliver", 2001))
      q.processAllAvailable()

      val rows = s.sql(
        """SELECT consumer, pendingCount, timesDeliveredMax FROM (
           SELECT *, ROW_NUMBER() OVER (PARTITION BY consumer ORDER BY lastActivityMs DESC) rn
           FROM pel_out) WHERE rn = 1 ORDER BY consumer""").collect()
      assert(rows.map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSeq ==
        Seq(("c1", 2, 2), ("c2", 1, 1)))
    } finally q.stop()
  }

  test("processing-time timeout emits idle-flagged snapshots for quiet consumers") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val input = MemoryStream[PelCommand]
    // Paced trigger: with ProcessingTimeTimeout the engine keeps running
    // batches to check timers; an unpaced trigger busy-loops (and
    // processAllAvailable never quiesces), so poll the sink instead.
    val q = StreamingPel.attach(s, input.toDS(), idleTimeoutMs = 300L)
      .writeStream.format("memory").queryName("pel_idle").outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("500 milliseconds"))
      .start()

    def pollUntil(cond: => Boolean, timeoutMs: Long = 30000): Boolean = {
      val deadline = System.currentTimeMillis + timeoutMs
      while (System.currentTimeMillis < deadline) {
        if (cond) return true
        Thread.sleep(100)
      }
      false
    }

    try {
      input.addData(PelCommand("quiet", "1-0", "deliver", 1000))
      assert(pollUntil(s.sql("SELECT 1 FROM pel_idle WHERE consumer = 'quiet'").count() > 0),
        "initial snapshot never arrived")
      val gotIdle = pollUntil(
        s.sql("SELECT 1 FROM pel_idle WHERE consumer = 'quiet' AND idle = true").count() > 0)
      assert(gotIdle, "quiet consumer never emitted an idle snapshot")
      val idleRows = s.sql(
        "SELECT consumer, pendingCount FROM pel_idle WHERE idle = true").collect()
      assert(idleRows.map(r => (r.getString(0), r.getInt(1))).toSeq == Seq(("quiet", 1)),
        "idle snapshot must carry the pending state intact")
    } finally q.stop()
  }

  test("idle timeout removes churned consumers' state; the store keeps only live keys") {
    // The reference library's default consumer ids are pid+thread —
    // high churn. Every churned key checkpointed forever is linear
    // state growth; the timeout branch drops a consumer that went idle
    // with nothing pending. Asserted against the CHECKPOINT itself via
    // the state data source, not against emitted snapshots.
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val ckpt = java.nio.file.Files.createTempDirectory("pel-churn-ckpt").toString
    val input = MemoryStream[PelCommand]
    val q = StreamingPel.attach(s, input.toDS(), idleTimeoutMs = 300L)
      .writeStream.format("memory").queryName("pel_churn").outputMode("update")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("500 milliseconds"))
      .start()

    def pollUntil(cond: => Boolean, timeoutMs: Long = 30000): Boolean = {
      val deadline = System.currentTimeMillis + timeoutMs
      while (System.currentTimeMillis < deadline) {
        if (cond) return true
        Thread.sleep(100)
      }
      false
    }

    try {
      // 4 churning consumers fully drain (deliver+ack); 1 live consumer
      // goes idle WITH a pending entry — its state must survive.
      (1 to 4).foreach { i =>
        input.addData(
          PelCommand(s"churn$i", "1-0", "deliver", 1000L + i),
          PelCommand(s"churn$i", "1-0", "ack", 2000L + i))
      }
      input.addData(PelCommand("live", "9-9", "deliver", 1500L))
      val allIdle = pollUntil(s.sql(
        "SELECT COUNT(DISTINCT consumer) FROM pel_churn WHERE idle = true")
        .head().getLong(0) == 5)
      assert(allIdle, "not every consumer reached its idle timeout")
    } finally q.stop()

    val keys = s.read.format("statestore").load(ckpt)
      .selectExpr("key.value AS consumer").collect().map(_.getString(0)).toSet
    assert(keys == Set("live"),
      s"churned consumers must leave no state behind; store holds: $keys")
  }

  test("PEL state machine runs under the RocksDB state store (the 100 TB provider)") {
    // The default HDFSBackedStateStore keeps every key on-heap — at
    // production consumer counts the store must be RocksDB
    // (incremental checkpoints, off-heap, spill-free). The state
    // machine must be provider-agnostic; this pins it end-to-end on
    // RocksDB including the idle-timeout remove path.
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("pel-rocksdb-ckpt").toString
    val input = MemoryStream[PelCommand]
    // providerClass is a session conf captured at query START (a
    // writeStream option would not carry it); restored in finally.
    val confKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = s.conf.getOption(confKey)
    s.conf.set(confKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val q = StreamingPel.attach(s, input.toDS())
      .writeStream.format("memory").queryName("pel_rocks").outputMode("update")
      .option("checkpointLocation", ckpt)
      .start()
    try {
      input.addData(
        PelCommand("r1", "1-0", "deliver", 1000),
        PelCommand("r1", "1-1", "deliver", 1001),
        PelCommand("r2", "2-0", "deliver", 1002))
      q.processAllAvailable()
      input.addData(PelCommand("r1", "1-0", "ack", 2000))
      q.processAllAvailable()
      val rows = s.sql(
        """SELECT consumer, pendingCount FROM (
           SELECT *, ROW_NUMBER() OVER (PARTITION BY consumer ORDER BY lastActivityMs DESC) rn
           FROM pel_rocks) WHERE rn = 1 ORDER BY consumer""").collect()
      assert(rows.map(r => (r.getString(0), r.getInt(1))).toSeq ==
        Seq(("r1", 1), ("r2", 1)))
      // the checkpoint must actually contain RocksDB artifacts, not
      // the default provider's delta files
      val stateDir = java.nio.file.Paths.get(ckpt, "state")
      val rocks = java.nio.file.Files.walk(stateDir).iterator().asInstanceOf[java.util.Iterator[java.nio.file.Path]]
      var sawRocks = false
      while (rocks.hasNext) {
        val p = rocks.next().toString
        if (p.contains(".zip") || p.contains("rocksdb") || p.endsWith(".sst")) sawRocks = true
      }
      assert(sawRocks, s"no RocksDB artifacts under $stateDir — provider option ignored?")
    } finally {
      q.stop()
      prev match {
        case Some(v) => s.conf.set(confKey, v)
        case None    => s.conf.unset(confKey)
      }
    }
  }

  test("state machine also runs in plain batch mode (same code path)") {
    val s = spark
    import s.implicits._
    val cmds = Seq(
      PelCommand("c1", "1-0", "deliver", 1L),
      PelCommand("c1", "1-0", "ack", 2L),
      PelCommand("c1", "1-1", "deliver", 3L)).toDS()
    val out = StreamingPel.attach(s, cmds).collect()
    assert(out.toSeq == Seq(PelSnapshot("c1", 1, 1, 3L)))
  }

  test("same-ms deliver+ack in one batch applies causally: entry acked, not wedged") {
    // ms-granularity clocks make equal atMs routine for fast consumers.
    // The sort key's action rank must order deliver before ack — the
    // post-shuffle arrival order previously decided, and ack-first
    // re-inserted the entry as pending-forever (no ack ever coming).
    val s = spark
    import s.implicits._
    val sameMs = Seq(
      PelCommand("c1", "5-0", "ack", 10L),      // deliberately ack FIRST
      PelCommand("c1", "5-0", "deliver", 10L)).toDS()
    val out = StreamingPel.attach(s, sameMs).collect()
    assert(out.toSeq == Seq(PelSnapshot("c1", 0, 0, 10L)),
      s"same-ms deliver+ack must leave nothing pending: ${out.toSeq}")
  }
}
