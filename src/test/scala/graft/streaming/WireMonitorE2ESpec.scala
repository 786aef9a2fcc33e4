package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import RespCodec._

/** [[WireMonitor]] — the reference Monitor as a RESP client — driving a
  * live [[RespServer]] over TCP: the ports of `test_monitor.py` (which
  * barely asserts; these pin the observable wire effects too), plus
  * behavioral pins of the two reference quirks the class reproduces
  * (last-healthy-wins target `monitor.py:161-166`; own-group-only
  * cleanup `common.py:48-85`). With [[WireScaler]]/[[WireConsumer]]
  * (`WireE2ESpec`) this completes the quartet: every reference role
  * runs against the server through sockets alone. */
class WireMonitorE2ESpec extends AnyFunSuite {

  private val Stream = "test_stream"
  private val Group  = "test_group"

  private def withWire(clock: Clock, preload: Int = 2)(f: RespClient => Unit): Unit = {
    val server = new RespServer(new RespLoopback(clock))
    try {
      val client = new RespClient(server.host, server.port)
      try {
        (1 to preload).foreach { i =>
          clock match { case m: ManualClock => m.advance(1); case _ => () }
          client.call(StreamCommands.xadd(Stream, Seq("test" -> s"data$i"))) match {
            case e: ErrorReply => fail(s"preload failed: $e")
            case _             => ()
          }
        }
        f(client)
      } finally client.close()
    } finally server.close()
  }

  private def wireConsumer(client: RespClient, clock: Clock, id: String,
      batch: Int, group: String = Group): WireConsumer =
    new WireConsumer(client.call, Stream, group, consumerId = id,
      batchSize = batch, maxWaitTimeMs = 100, pollTimeMs = 10, clock = clock)

  /** (name, pending, idle) rows of XINFO CONSUMERS as the wire reports
    * them — every assertion about post-cleanup state goes through this,
    * not engine internals. */
  private def consumersOnWire(client: RespClient, group: String = Group): Seq[(String, Long)] =
    WireReplies.ok(client.call(StreamCommands.xinfoConsumers(Stream, group))) match {
      case ArrayReply(Some(rows)) => rows.map(WireReplies.pairMap).map(m =>
        (m("name").text, WireReplies.int(m("pending"))))
      case other => fail(s"bad XINFO CONSUMERS reply: $other")
    }

  test("monitor flags too-many-pending, then rebalances onto the healthy consumer (test_monitor.py:12-42)") {
    val clock = new ManualClock(1000)
    withWire(clock) { client =>
      assert(wireConsumer(client, clock, "pending_c1", batch = 2).getItems().length == 2)
      val monitor = new WireMonitor(client.call, Stream, Group,
        batchSize = 1, minWaitTimeMs = 1, idleTimeThresholdMs = 10)
      val sweep1 = monitor.collectMonitoringData(autoCleanup = false)
      assert(sweep1.map(m => (m.consumerId, m.pendingItems, m.status)) ==
        Seq(("pending_c1", 2, ConsumerStatus.PendingWarn)))
      assert(monitor.targetConsumer.isEmpty) // no healthy consumer yet
      assert(consumersOnWire(client).map(_._1) == Seq("pending_c1")) // no cleanup ran

      // second consumer arrives; everything is pending on c1 so it gets
      // nothing — but it registers, healthy, and becomes the target
      assert(wireConsumer(client, clock, "pending_c2", batch = 2).getItems().isEmpty)
      val sweep2 = monitor.collectMonitoringData() // auto_cleanup=True
      assert(sweep2.map(_.consumerId) == Seq("pending_c1", "pending_c2"))
      assert(monitor.targetConsumer == "pending_c2")
      assert(monitor.lastCleanup == Seq(("pending_c1", 2, 0))) // claimed 2, lost 0
      assert(consumersOnWire(client) == Seq(("pending_c2", 2L)))
    }
  }

  test("monitor flags long idle; with no healthy consumer cleanup is skipped (test_monitor.py:69-93, monitor.py:182-185)") {
    val clock = new ManualClock(1000)
    withWire(clock) { client =>
      assert(wireConsumer(client, clock, "idle_c1", batch = 2).getItems().length == 2)
      clock.advance(1000)
      val monitor = new WireMonitor(client.call, Stream, Group,
        batchSize = 2, minWaitTimeMs = 1, idleTimeThresholdMs = 10)
      // pending 2 is NOT > batch 2, so the idle rule fires instead
      val sweep = monitor.collectMonitoringData() // auto_cleanup on
      assert(sweep.map(m => (m.consumerId, m.status)) ==
        Seq(("idle_c1", ConsumerStatus.IdleWarn)))
      assert(sweep.head.idleTimeMs >= 1000L)
      // no healthy consumer to assign to -> the no-cleanup branch
      assert(monitor.targetConsumer.isEmpty && monitor.lastCleanup.isEmpty)
      assert(consumersOnWire(client).map(_._1) == Seq("idle_c1"))
    }
  }

  test("monitor report renders over the wire (test_monitor.py:44-67)") {
    val clock = new ManualClock(1000)
    withWire(clock) { client =>
      assert(wireConsumer(client, clock, "print_c1", batch = 2).getItems().length == 2)
      val monitor = new WireMonitor(client.call, Stream, Group,
        batchSize = 1, minWaitTimeMs = 1, idleTimeThresholdMs = 10)
      monitor.collectMonitoringData(autoCleanup = false)
      val table = monitor.renderTable()
      assert(table.contains("Consumer id") && table.contains("print_c1")
        && table.contains(ConsumerStatus.PendingWarn))
      val out = new java.lang.StringBuilder
      monitor.printMonitoringData(out)
      assert(out.length > 0 && out.toString.startsWith(table))
      // identical grid from the engine-side renderer - one shared R1
      assert(table == Monitor.renderTable(monitor.collectMonitoringData(autoCleanup = false)))
    }
  }

  test("quirk pin: LAST healthy consumer wins the target even with more pending (monitor.py:161-166)") {
    val clock = new ManualClock(1000)
    withWire(clock) { client =>
      val c1 = wireConsumer(client, clock, "quirk_c1", batch = 1)
      val got = c1.getItems()
      assert(got.length == 1)
      c1.removeItemFromConsumerGroup(got.head.msgid) // c1 pending -> 0
      assert(wireConsumer(client, clock, "quirk_c2", batch = 1).getItems().length == 1)
      val monitor = new WireMonitor(client.call, Stream, Group,
        batchSize = 2, minWaitTimeMs = 1, idleTimeThresholdMs = 1000000)
      val sweep = monitor.collectMonitoringData(autoCleanup = false)
      assert(sweep.map(m => (m.consumerId, m.pendingItems, m.status)) ==
        Seq(("quirk_c1", 0, ConsumerStatus.Ok), ("quirk_c2", 1, ConsumerStatus.Ok)))
      // the clean argmin (engine Monitor) would pick quirk_c1 (0 < 1);
      // the reference's zeroed comparison picks the last one seen
      assert(monitor.targetConsumer == "quirk_c2")
    }
  }

  test("min-idle guard can claim nothing: messages lost is surfaced, not swallowed (monitor.py:125-127)") {
    val clock = new ManualClock(1000)
    withWire(clock) { client =>
      assert(wireConsumer(client, clock, "lost_c1", batch = 3).getItems().length == 2)
      assert(wireConsumer(client, clock, "lost_c2", batch = 1).getItems().isEmpty)
      val monitor = new WireMonitor(client.call, Stream, Group,
        batchSize = 1, minWaitTimeMs = 1000000000L, idleTimeThresholdMs = 10)
      monitor.collectMonitoringData()
      // XCLAIM's min-idle rejected every entry; DELCONSUMER dropped them
      assert(monitor.lastCleanup == Seq(("lost_c1", 0, 2)))
      assert(consumersOnWire(client) == Seq(("lost_c2", 0L)))
      WireReplies.ok(client.call(StreamCommands.xpendingRange(Stream, Group))) match {
        case ArrayReply(Some(rows)) => assert(rows.isEmpty) // gone for good
        case other                  => fail(s"bad XPENDING reply: $other")
      }
    }
  }

  test("quirk pin: cleanup only touches the monitor's OWN group (common.py:48-85)") {
    val clock = new ManualClock(1000)
    withWire(clock, preload = 3) { client =>
      // other_group's consumer goes unhealthy (pending 3 > batch 2)...
      assert(wireConsumer(client, clock, "other_c", batch = 3,
        group = "other_group").getItems().length == 3)
      // ...while the monitor's group has a healthy target (pending 2)
      assert(wireConsumer(client, clock, "own_c", batch = 2).getItems().length == 2)
      val monitor = new WireMonitor(client.call, Stream, Group,
        batchSize = 2, minWaitTimeMs = 1, idleTimeThresholdMs = 1000000)
      val sweep = monitor.collectMonitoringData()
      // the sweep SEES both groups' consumers (XINFO GROUPS-wide, M1/M2)
      assert(sweep.map(m => (m.consumerId, m.status)).toSet ==
        Set(("other_c", ConsumerStatus.PendingWarn), ("own_c", ConsumerStatus.Ok)))
      // ...but cleanup ran against the monitor's own group, where
      // other_c owns nothing: nothing claimed, nothing lost, and the
      // unhealthy consumer survives untouched in ITS group
      assert(monitor.lastCleanup == Seq(("other_c", 0, 0)))
      assert(consumersOnWire(client, "other_group") == Seq(("other_c", 3L)))
      assert(consumersOnWire(client) == Seq(("own_c", 2L)))
    }
  }
}
