package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import RespCodec._

/** End-to-end protocol cycles driven entirely through WIRE BYTES:
  * client builders encode, the loopback decodes + executes against the
  * real StreamLog/ConsumerGroup, the reply bytes decode back through
  * the client parser — the complete reference workflow
  * (produce → consume → ack → monitor → claim) minus only the socket. */
class RespLoopbackSpec extends AnyFunSuite {

  private def wire(lb: RespLoopback, args: Seq[String]): Reply = {
    val Some((r, consumed)) = decode(lb.call(encodeStrings(args))): @unchecked
    r match { case e: ErrorReply => fail(s"wire error for $args: $e"); case _ => }
    r
  }

  test("produce -> consume -> ack cycle over wire bytes") {
    val clock = new ManualClock(1000)
    val lb = new RespLoopback(clock)

    val id1 = wire(lb, StreamCommands.xadd("jobs", Seq("task" -> "a", "n" -> "1"))).text
    clock.advance(5)
    val id2 = wire(lb, StreamCommands.xadd("jobs", Seq("task" -> "b", "n" -> "2"))).text
    assert(MsgId.lt(id1, id2))
    assert(wire(lb, StreamCommands.xlen("jobs")) == IntReply(2))

    wire(lb, StreamCommands.xgroupCreate("jobs", "g1"))
    val read = parseXRead(wire(lb,
      StreamCommands.xreadgroup("g1", "c1", "jobs", count = 10, blockMs = 1000)))
    assert(read == Seq("jobs" -> Seq(
      StreamMessage(id1, Map("task" -> "a", "n" -> "1")),
      StreamMessage(id2, Map("task" -> "b", "n" -> "2")))))

    // nothing new: Redis replies nil (null array) on '>' with no data
    val Some((empty, _)) = decode(lb.call(encodeStrings(
      StreamCommands.xreadgroup("g1", "c1", "jobs", 10, 0)))): @unchecked
    assert(empty == ArrayReply(None))

    // XREADGROUP 0 re-reads the owned PEL
    val owned = parseXRead(wire(lb,
      StreamCommands.xreadgroup("g1", "c1", "jobs", 10, 0, newOnly = false)))
    assert(owned.head._2.map(_.msgid) == Seq(id1, id2))

    assert(wire(lb, StreamCommands.xack("jobs", "g1", Seq(id1))) == IntReply(1))
    assert(wire(lb, StreamCommands.xack("jobs", "g1", Seq(id1))) == IntReply(0)) // already acked
    val pending = wire(lb, StreamCommands.xpendingRange("jobs", "g1")) match {
      case ArrayReply(Some(rows)) => rows
      case other                  => fail(s"bad XPENDING reply: $other")
    }
    assert(pending.length == 1)
    val ArrayReply(Some(Vector(pid, pconsumer, _, ptimes))) = pending.head: @unchecked
    assert(pid.text == id2 && pconsumer.text == "c1" && ptimes == IntReply(1))
  }

  test("failure rebalance over the wire: idle consumer's work claimed, then autoclaim sweeps") {
    val clock = new ManualClock(0)
    val lb = new RespLoopback(clock)
    clock.advance(10)
    val ids = (1 to 4).map { i =>
      clock.advance(1)
      wire(lb, StreamCommands.xadd("s", Seq("i" -> i.toString))).text
    }
    wire(lb, StreamCommands.xgroupCreate("s", "g"))
    wire(lb, StreamCommands.xreadgroup("g", "dead", "s", 4, 0)) // dead consumer takes all
    clock.advance(60001)

    // XCLAIM two ids explicitly; entries come back with their fields
    val claimed = wire(lb, StreamCommands.xclaim("s", "g", "live", 60000, ids.take(2))) match {
      case ArrayReply(Some(entries)) => entries.map(parseEntry)
      case other                     => fail(s"bad XCLAIM reply: $other")
    }
    assert(claimed.map(_.msgid) == ids.take(2))
    assert(claimed.head.content == Map("i" -> "1"))

    // XAUTOCLAIM sweeps the rest; cursor wraps to 0-0 when done. The
    // two explicitly claimed ids had their delivery clock reset by the
    // XCLAIM, so only the OTHER two are idle enough to sweep.
    val ArrayReply(Some(Vector(cursor, ArrayReply(Some(swept))))) =
      wire(lb, StreamCommands.xautoclaim("s", "g", "live", 60000, "0-0", 100)): @unchecked
    assert(cursor.text == MsgId.Zero)
    assert(swept.map(parseEntry).map(_.msgid) == ids.drop(2))

    // XINFO CONSUMERS reflects ownership
    val info = wire(lb, StreamCommands.xinfoConsumers("s", "g")) match {
      case ArrayReply(Some(rows)) => rows.map {
        case ArrayReply(Some(Vector(_, name, _, pending, _, _))) =>
          name.text -> pending.asInstanceOf[IntReply].v
        case other => fail(s"bad consumer row: $other")
      }.toMap
      case other => fail(s"bad XINFO reply: $other")
    }
    assert(info("live") == 4L && info("dead") == 0L)

    // DELCONSUMER on the dead consumer loses nothing (all claimed away)
    assert(wire(lb, StreamCommands.xgroupDelConsumer("s", "g", "dead")) == IntReply(0))
  }

  test("trim and delete over the wire; claimed-but-trimmed entries answer nil fields") {
    val clock = new ManualClock(100)
    val lb = new RespLoopback(clock)
    val ids = (1 to 6).map { i =>
      clock.advance(1)
      wire(lb, StreamCommands.xadd("t", Seq("v" -> i.toString))).text
    }
    wire(lb, StreamCommands.xgroupCreate("t", "g"))
    wire(lb, StreamCommands.xreadgroup("g", "c", "t", 6, 0))
    // trim the stream under the PEL: 4 oldest physically removed
    assert(wire(lb, StreamCommands.xtrimMaxlen("t", 2, approximate = false)) == IntReply(4))
    assert(wire(lb, StreamCommands.xlen("t")) == IntReply(2))
    clock.advance(60001)
    // claiming a trimmed id returns the id with NIL fields (tombstone)
    val ArrayReply(Some(entries)) =
      wire(lb, StreamCommands.xclaim("t", "g", "c2", 60000, Seq(ids.head))): @unchecked
    assert(entries.map(parseEntry) == Seq(StreamMessage(ids.head, Map.empty)))
    // XDEL removes by id
    assert(wire(lb, StreamCommands.xdel("t", ids.takeRight(1))) == IntReply(1))
    assert(wire(lb, StreamCommands.xlen("t")) == IntReply(1))
  }

  test("XINFO STREAM answers the full Redis >=7 field set (r11 ask #7)") {
    val clock = new ManualClock(500)
    val lb = new RespLoopback(clock)
    def info(): Map[String, Reply] = {
      val ArrayReply(Some(kv)) = wire(lb, StreamCommands.xinfoStream("s")): @unchecked
      kv.grouped(2).map { case Vector(k, v) => k.text -> v }.toMap
    }
    // never-written stream: zero everything, nil first/last entries
    val virgin = info()
    assert(virgin("entries-added") == IntReply(0))
    assert(virgin("max-deleted-entry-id").text == MsgId.Zero)
    assert(virgin("first-entry") == BulkReply(None))

    // emptied-by-XDEL stream: lifetime add count survives
    val id0 = wire(lb, StreamCommands.xadd("s", Seq("v" -> "0"))).text
    wire(lb, StreamCommands.xdel("s", Seq(id0)))
    val empty = info()
    assert(empty("length") == IntReply(0))
    assert(empty("first-entry") == BulkReply(None))
    assert(empty("last-entry") == BulkReply(None))
    assert(empty("entries-added") == IntReply(1)) // lifetime count survives XDEL

    val ids = (1 to 4).map { i =>
      clock.advance(1)
      wire(lb, StreamCommands.xadd("s", Seq("v" -> i.toString))).text
    }
    wire(lb, StreamCommands.xgroupCreate("s", "g"))
    val full = info()
    assert(full("length") == IntReply(4))
    assert(full("entries-added") == IntReply(5))
    assert(full("last-generated-id").text == ids.last)
    assert(full("groups") == IntReply(1))
    assert(parseEntry(full("first-entry")) == StreamMessage(ids.head, Map("v" -> "1")))
    assert(parseEntry(full("last-entry")) == StreamMessage(ids.last, Map("v" -> "4")))

    // XDEL moves max-deleted-entry-id; an exact trim moves it further
    // (greatest trimmed id), and first-entry advances past the trim
    wire(lb, StreamCommands.xdel("s", Seq(ids(1))))
    assert(info()("max-deleted-entry-id").text == ids(1))
    wire(lb, StreamCommands.xtrimMaxlen("s", 1, approximate = false))
    val trimmed = info()
    assert(trimmed("max-deleted-entry-id").text == ids(2))
    assert(parseEntry(trimmed("first-entry")) == StreamMessage(ids.last, Map("v" -> "4")))
    assert(trimmed("length") == IntReply(1))
  }

  test("wire-produced entries flow into a Structured Streaming query (loopback -> DSv2 source)") {
    // The two halves joined: a client XADDs over wire bytes, the
    // loopback's backing log registers with the DSv2 source, and a
    // Structured Streaming query consumes the same entries — ingest by
    // protocol, process by engine, with nothing hand-copied between.
    val s = graft.streaming.SparkTestBase.session
    val clock = new ManualClock(1700000000000L)
    val lb = new RespLoopback(clock)
    (1 to 5).foreach { i =>
      clock.advance(1)
      wire(lb, StreamCommands.xadd("pipe", Seq("i" -> i.toString)))
    }
    val key = StreamLogRegistry.register(lb.streamLog("pipe"))
    val seen = scala.collection.mutable.ArrayBuffer.empty[String]
    val q = s.readStream
      .format("graft.streaming.StreamLogSourceProvider")
      .option("log", key).option("batchSize", "10")
      .load()
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        seen.synchronized { seen ++= df.collect().map(_.getMap[String, String](1)("i")) }
        ()
      }
      .start()
    try {
      q.processAllAvailable()
      // produce MORE over the wire mid-query: the next micro-batch picks it up
      clock.advance(1)
      wire(lb, StreamCommands.xadd("pipe", Seq("i" -> "6")))
      q.processAllAvailable()
      assert(seen.synchronized(seen.toSeq) == (1 to 6).map(_.toString))
    } finally {
      q.stop()
      StreamLogRegistry.unregister(key)
    }
  }

  test("unknown commands and malformed bytes answer RESP errors, not exceptions") {
    val lb = new RespLoopback(new ManualClock(0))
    val Some((e1, _)) = decode(lb.call(encodeStrings(Seq("GET", "k")))): @unchecked
    assert(e1.isInstanceOf[ErrorReply])
    val Some((e2, _)) = decode(lb.call(":42\r\n".getBytes)): @unchecked
    assert(e2.isInstanceOf[ErrorReply])
  }

  test("group commands on a missing group answer NOGROUP; only CREATE creates; DESTROY reports 0/1") {
    val lb = new RespLoopback(new ManualClock(0))
    lb.call(encodeStrings(StreamCommands.xadd("s", Seq("k" -> "v"))))
    // XREADGROUP before CREATE: Redis's NOGROUP, and no phantom group state
    val Some((err, _)) = decode(lb.call(encodeStrings(
      StreamCommands.xreadgroup("nope", "c", "s", 10, 0)))): @unchecked
    err match {
      case ErrorReply(m) => assert(m.startsWith("NOGROUP"), s"wrong error: $m")
      case other         => fail(s"expected NOGROUP error, got $other")
    }
    assert(lb.execute(StreamCommands.xack("s", "nope", Seq("1-1")))
      .isInstanceOf[ErrorReply])
    // destroying a group that never existed reports 0, as Redis does
    assert(lb.execute(StreamCommands.xgroupDestroy("s", "nope")) == IntReply(0))
    lb.execute(StreamCommands.xgroupCreate("s", "g"))
    assert(lb.execute(StreamCommands.xgroupDestroy("s", "g")) == IntReply(1))
  }

  test("XADD exact MAXLEN form trims exactly; error text with CRLF cannot desync the wire") {
    val clock = new ManualClock(5)
    val lb = new RespLoopback(clock)
    (1 to 5).foreach { i =>
      clock.advance(1)
      // exact trim form: MAXLEN 3 with no '~'
      lb.execute(Seq("XADD", "x", "MAXLEN", "3", "*", "v", i.toString))
    }
    assert(lb.execute(StreamCommands.xlen("x")) == IntReply(3))
    // response-injection probe: the quoted command name carries CRLF;
    // the reply must decode as ONE error with no stray bytes after it
    val wireBytes = lb.call(encodeStrings(Seq("BAD\r\nCMD")))
    val Some((reply, consumed)) = decode(wireBytes): @unchecked
    assert(consumed == wireBytes.length, "stray bytes after error reply (injection)")
    assert(reply.isInstanceOf[ErrorReply])
  }
}
