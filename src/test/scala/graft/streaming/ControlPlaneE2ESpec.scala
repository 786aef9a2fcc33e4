package graft.streaming

import java.util.concurrent.CountDownLatch
import RespCodec._

/** The reference's PURPOSE composed end to end: a monitor and a scaler
  * steering real consumers (`monitor.py` + `scaler.py` over live
  * groups). Every piece is verified separately elsewhere; this spec is
  * the interoperation proof:
  *
  *  - messages are produced over a REAL TCP socket (RespClient →
  *    RespServer → the engine's StreamLog);
  *  - two wire consumers split the backlog via XREADGROUP; one acks
  *    its slice (XACK) and stays live, the other dies holding its PEL;
  *  - a [[Monitor]] over the loopback's own live [[ConsumerGroup]]
  *    classifies the death (M3 pending-warn wins), claims the dead
  *    consumer's PEL for the healthy argmin target (M5/M6) and deletes
  *    the consumer (G3) — all wire-visible afterwards;
  *  - the SAME wire-produced log feeds a Structured Streaming query
  *    through the DSv2 source, and the [[StreamingScaler]] reads the
  *    query's real offsets: OUT while the backlog sits undelivered,
  *    NO_SCALE once the query drains it.
  */
class ControlPlaneE2ESpec extends SparkTestBase {

  private def ok(r: Reply): Reply = r match {
    case e: ErrorReply => fail(s"wire error: $e")
    case other         => other
  }

  test("wire produce -> consumer death -> monitor rebalance -> streaming drain flips the scaler") {
    val s = spark
    val clock = new ManualClock(1700000000000L)
    val server = new RespServer(new RespLoopback(clock))
    val client = new RespClient(server.host, server.port)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-cp-ckpt").toFile
    var key: String = null
    var q: org.apache.spark.sql.streaming.StreamingQuery = null
    try {
      // ---- data in: 6 messages over actual wire bytes
      val ids = (1 to 6).map { i =>
        val id = ok(client.call(StreamCommands.xadd("jobs", Seq("i" -> i.toString)))).text
        clock.advance(1); id
      }
      assert(ok(client.call(StreamCommands.xlen("jobs"))) == IntReply(6))

      // ---- two wire consumers split the stream: 3 + 3, in id order
      ok(client.call(StreamCommands.xgroupCreate("jobs", "g")))
      def readIds(consumer: String): Seq[String] =
        parseXRead(ok(client.call(
          StreamCommands.xreadgroup("g", consumer, "jobs", count = 3, blockMs = 0))))
          .flatMap(_._2).map(_.msgid)
      val deadSlice = readIds("cdead")
      val liveSlice = readIds("clive")
      assert(deadSlice == ids.take(3) && liveSlice == ids.slice(3, 6),
        s"wire delivery split: $deadSlice / $liveSlice")

      // clive processes and acks its slice; cdead dies holding 3 pending
      assert(ok(client.call(StreamCommands.xack("jobs", "g", liveSlice))) == IntReply(3))
      clock.advance(60000) // past any idle threshold
      assert(readIds("clive").isEmpty) // live consumer keeps polling (touches idle)

      // ---- control plane: monitor sweep over the loopback's live group
      val g = server.loopback.consumerGroup("jobs", "g")
        .getOrElse(fail("wire-created group not visible to the control plane"))
      val monitor = new Monitor(Seq(g), batchSize = 2,
        idleTimeThresholdMs = 30000L, minWaitTimeMs = 0L)
      val metrics = monitor.collectMonitoringData(autoCleanup = true)
        .map(m => m.consumerId -> m.status).toMap
      assert(metrics == Map(
        "cdead" -> ConsumerStatus.PendingWarn, // pending 3 > batchSize wins over idle
        "clive" -> ConsumerStatus.Ok), s"sweep classification: $metrics")
      assert(monitor.lastCleanup == Seq(("cdead", 3, 0)),
        s"rebalance must claim all 3, lose none: ${monitor.lastCleanup}")

      // wire-visible aftermath: cdead is gone, clive owns the claimed PEL
      val consumersReply = ok(client.call(StreamCommands.xinfoConsumers("jobs", "g")))
      val consumerNames = consumersReply match {
        case ArrayReply(Some(rows)) => rows.collect {
          case ArrayReply(Some(kv)) => kv.grouped(2).collectFirst {
            case Seq(k, v) if k.text == "name" => v.text
          }.get
        }
        case other => fail(s"unexpected XINFO CONSUMERS shape: $other")
      }
      assert(consumerNames == Seq("clive"), s"consumers after cleanup: $consumerNames")
      val pendingRows = ok(client.call(
        StreamCommands.xpendingRange("jobs", "g", "-", "+", 100))) match {
        case ArrayReply(Some(rows)) => rows.collect {
          case ArrayReply(Some(Seq(id, owner, _, _))) => id.text -> owner.text
        }
        case other => fail(s"unexpected XPENDING shape: $other")
      }
      assert(pendingRows == deadSlice.map(_ -> "clive"),
        s"claimed PEL must be exactly cdead's slice, owned by clive: $pendingRows")

      // ---- data plane: the SAME wire-produced log drains through the
      // DSv2 source; the scaler reads the query's real offsets.
      key = StreamLogRegistry.register(server.loopback.streamLog("jobs"))
      val scaler = new StreamingScaler(key)
      val gate = new CountDownLatch(1)
      val holdEpoch0: (org.apache.spark.sql.DataFrame, Long) => Unit =
        (df, epochId) => { df.count(); if (epochId == 0) gate.await() }
      q = s.readStream
        .format("graft.streaming.StreamLogSourceProvider")
        .option("log", key).option("batchSize", "2")
        .load()
        .writeStream
        .option("checkpointLocation", ckpt.getAbsolutePath)
        .foreachBatch(holdEpoch0)
        .start()

      // epoch 0 in flight: 2 delivered-uncommitted, 4 backlogged → OUT
      val wal0 = new java.io.File(ckpt, "offsets/0")
      val deadline = System.currentTimeMillis() + 30000
      while (!wal0.exists() && System.currentTimeMillis() < deadline) Thread.sleep(25)
      assert(wal0.exists(), "epoch-0 offset WAL never appeared")
      val src0 = scala.io.Source.fromFile(wal0)
      val delivered0 = try src0.getLines().toList.last.trim finally src0.close()
      assert(delivered0 == ids(1), s"epoch-0 cursor: $delivered0")
      assert(scaler.getScaleDecision(delivered0, consumers = 1) == ((100.0, Scale.Out)),
        "undrained backlog must suggest OUT")

      // release and drain: the delivered cursor reaches the tip and the
      // suggestion flips to NO_SCALE (rate 0, backlog 0)
      gate.countDown()
      q.processAllAvailable()
      val lastEpoch = new java.io.File(ckpt, "offsets").listFiles()
        .map(_.getName).filter(_.forall(_.isDigit)).map(_.toLong).max
      val srcN = scala.io.Source.fromFile(new java.io.File(ckpt, s"offsets/$lastEpoch"))
      val deliveredTip = try srcN.getLines().toList.last.trim finally srcN.close()
      assert(deliveredTip == ids.last, s"drained cursor must sit at the tip: $deliveredTip")
      assert(scaler.getScaleDecision(deliveredTip, consumers = 1) == ((0.0, Scale.NoScale)),
        "drained backlog must suggest NO_SCALE")
    } finally {
      if (q != null) q.stop()
      if (key != null) StreamLogRegistry.unregister(key)
      client.close()
      server.close()
    }
  }

  test("monitor rebalances spend the poison budget; the DLQ terminates the loop; dead letters drain as data") {
    val s = spark
    val clock = new ManualClock(1700000000000L)
    val server = new RespServer(new RespLoopback(clock))
    val client = new RespClient(server.host, server.port)
    var key: String = null
    var q: org.apache.spark.sql.streaming.StreamingQuery = null
    try {
      // ---- 4 wire-produced tasks; c1 takes all, acks 3, dies on the 4th
      val ids = (1 to 4).map { i =>
        val id = ok(client.call(StreamCommands.xadd("tasks", Seq("i" -> i.toString)))).text
        clock.advance(1); id
      }
      ok(client.call(StreamCommands.xgroupCreate("tasks", "g")))
      def readIds(consumer: String): Seq[String] =
        parseXRead(ok(client.call(
          StreamCommands.xreadgroup("g", consumer, "tasks", count = 10, blockMs = 0))))
          .flatMap(_._2).map(_.msgid)
      assert(readIds("c1") == ids)
      val poison = ids.head
      assert(ok(client.call(StreamCommands.xack("tasks", "g", ids.tail))) == IntReply(3))

      // ---- the reference's redeliver-forever loop, driven by the REAL
      // monitor: each sweep rebalances the poison to a fresh healthy
      // consumer, which also fails — times_delivered climbs 1 -> 2 -> 3.
      val g = server.loopback.consumerGroup("tasks", "g")
        .getOrElse(fail("wire-created group not visible to the control plane"))
      val monitor = new Monitor(Seq(g), batchSize = 2,
        idleTimeThresholdMs = 30000L, minWaitTimeMs = 0L)
      for (next <- Seq("c2", "c3")) {
        clock.advance(60000)           // current owner goes idle-dead
        assert(readIds(next).isEmpty)  // the replacement registers, healthy
        monitor.collectMonitoringData(autoCleanup = true)
        assert(monitor.lastCleanup.map(c => (c._2, c._3)) == Seq((1, 0)),
          s"rebalance to $next must claim the poison, lose nothing")
      }
      val pel = g.consumers.flatMap(g.pendingOf(_))
      assert(pel.map(e => (e.msgid, e.consumer, e.timesDelivered)) ==
        Seq((poison, "c3", 3)), s"budget spent by real rebalances: $pel")

      // ---- the terminal state the reference never ships: route to a
      // DLQ stream ON THE SERVER (wire-visible like any other stream)
      val dlqLog = server.loopback.streamLog("tasks:dlq")
      val routed = new DeadLetterRouter(g, dlqLog, maxDeliveries = 3).sweep()
      assert(routed.map(_._1) == Seq(poison))
      assert(g.pendingCount == 0, "the group is fully terminal: 3 acked + 1 routed")
      assert(ok(client.call(StreamCommands.xlen("tasks"))) == IntReply(4),
        "routing acks the group; it never deletes source entries")
      assert(ok(client.call(StreamCommands.xlen("tasks:dlq"))) == IntReply(1))

      // ---- dead letters are a stream like any other: the DSv2 source
      // drains the DLQ into a DataFrame for offline poison analysis.
      key = StreamLogRegistry.register(dlqLog)
      q = s.readStream
        .format("graft.streaming.StreamLogSourceProvider")
        .option("log", key).option("batchSize", "10")
        .load()
        .writeStream.format("memory").queryName("dead_letters")
        .start()
      q.processAllAvailable()
      val rows = s.sql("SELECT msgid, content FROM dead_letters").collect()
      assert(rows.length == 1)
      val dead = rows.head.getMap[String, String](1).toMap
      assert(dead("i") == "1", "the original body survives the route")
      assert(dead("dlq-source-id") == poison && dead("dlq-consumer") == "c3")
      assert(dead("dlq-times-delivered") == "3" &&
        dead("dlq-reason") == DeadLetterRouter.Reason)
    } finally {
      if (q != null) q.stop()
      if (key != null) StreamLogRegistry.unregister(key)
      client.close()
      server.close()
    }
  }
}
