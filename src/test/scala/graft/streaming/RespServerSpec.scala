package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import RespCodec._

/** The reference's defining trait — a client talking the wire protocol
  * to a server over a REAL TCP socket (`common.py:13-18`) — exercised
  * end to end: [[RespClient]] connects to a live [[RespServer]] on
  * 127.0.0.1 and runs the `test_producer.py:31-48` produce→consume
  * flow, then failure claim, fragmentation, pipelining and
  * protocol-garbage handling, all over actual sockets. */
class RespServerSpec extends AnyFunSuite {

  private def withServer(f: (RespServer, RespClient) => Unit): Unit = {
    val server = new RespServer()
    try {
      val client = new RespClient(server.host, server.port)
      try f(server, client) finally client.close()
    } finally server.close()
  }

  private def ok(r: Reply): Reply = r match {
    case e: ErrorReply => fail(s"wire error: $e")
    case other         => other
  }

  test("produce -> consume -> ack over a real TCP socket (test_producer.py:31-48 flow)") {
    withServer { (_, client) =>
      // producer.add({"source": ..., "value": "42"}) → id with '-'
      val id = ok(client.call(StreamCommands.xadd("stream",
        Seq("source" -> "producer_test", "value" -> "42")))).text
      assert(id.contains("-"))
      assert(ok(client.call(StreamCommands.xlen("stream"))) == IntReply(1))

      // consumer.get_items(): group-create + XREADGROUP '>'
      ok(client.call(StreamCommands.xgroupCreate("stream", "g")))
      val read = parseXRead(ok(client.call(
        StreamCommands.xreadgroup("g", "c1", "stream", count = 10, blockMs = 500))))
      assert(read == Seq("stream" -> Seq(
        StreamMessage(id, Map("source" -> "producer_test", "value" -> "42")))))

      // remove_item_from_stream: XACK (the v0.3.0 semantics — PEL only)
      assert(ok(client.call(StreamCommands.xack("stream", "g", Seq(id)))) == IntReply(1))
      assert(ok(client.call(StreamCommands.xlen("stream"))) == IntReply(1))
    }
  }

  test("two clients, one group: claim flows between real sockets") {
    val clock = new ManualClock(1000)
    val server = new RespServer(new RespLoopback(clock))
    try {
      val dead = new RespClient(server.host, server.port)
      val live = new RespClient(server.host, server.port)
      try {
        val ids = (1 to 3).map { i =>
          clock.advance(1)
          ok(dead.call(StreamCommands.xadd("s", Seq("i" -> i.toString)))).text
        }
        ok(dead.call(StreamCommands.xgroupCreate("s", "g")))
        ok(dead.call(StreamCommands.xreadgroup("g", "dead", "s", 10, 0)))
        clock.advance(60001)

        // the live client (separate socket) claims the dead one's PEL
        val claimed = ok(live.call(
          StreamCommands.xclaim("s", "g", "live", 60000, ids))) match {
          case ArrayReply(Some(entries)) => entries.map(parseEntry)
          case other                     => fail(s"bad XCLAIM reply: $other")
        }
        assert(claimed.map(_.msgid) == ids)

        // and acks them; the dead consumer's PEL view is now empty
        assert(ok(live.call(StreamCommands.xack("s", "g", ids))) == IntReply(3))
        val pending = ok(dead.call(StreamCommands.xpendingRange("s", "g")))
        assert(pending == ArrayReply(Some(Vector())))
      } finally { dead.close(); live.close() }
    } finally server.close()
  }

  test("fragmentation: a command delivered one byte at a time still executes") {
    withServer { (_, client) =>
      val bytes = encodeStrings(StreamCommands.xadd("frag", Seq("k" -> "v")))
      bytes.foreach(b => client.send(Array(b))) // worst-case TCP fragmentation
      assert(ok(client.readReply()).text.contains("-"))
      assert(ok(client.call(StreamCommands.xlen("frag"))) == IntReply(1))
    }
  }

  test("pipelining: three commands in one write get three replies in order") {
    withServer { (_, client) =>
      client.send(
        encodeStrings(StreamCommands.xadd("p", Seq("a" -> "1"))) ++
        encodeStrings(StreamCommands.xadd("p", Seq("b" -> "2"))) ++
        encodeStrings(StreamCommands.xlen("p")))
      val id1 = ok(client.readReply()).text
      val id2 = ok(client.readReply()).text
      assert(MsgId.lt(id1, id2))
      assert(ok(client.readReply()) == IntReply(2))
    }
  }

  test("framed-but-bad command answers ERR and the connection survives") {
    withServer { (_, client) =>
      client.call(Seq("NOSUCHCMD", "x")) match {
        case ErrorReply(m) => assert(m.startsWith("ERR"))
        case other         => fail(s"expected ERR, got $other")
      }
      // same socket still works
      assert(ok(client.call(StreamCommands.xlen("p"))) == IntReply(0))
    }
  }

  test("unframeable garbage answers one ERR and the server drops the connection") {
    withServer { (server, client) =>
      client.send("!!!garbage\r\n".getBytes("UTF-8"))
      client.readReply() match {
        case ErrorReply(m) => assert(m.contains("protocol error"))
        case other         => fail(s"expected protocol error, got $other")
      }
      assert(client.isClosedByServer)
      // the server itself is fine: a fresh connection works
      val again = new RespClient(server.host, server.port)
      try assert(ok(again.call(StreamCommands.xlen("s"))) == IntReply(0))
      finally again.close()
    }
  }

  test("deep array nesting answers ERR instead of overflowing the stack") {
    withServer { (_, client) =>
      client.send(Array.fill(RespCodec.MaxDepth + 8)("*1\r\n".getBytes("UTF-8")).flatten)
      client.readReply() match {
        case ErrorReply(_) => ()
        case other         => fail(s"expected ERR, got $other")
      }
    }
  }

  test("XREADGROUP treats 'count' as an opaque consumer name; COUNT caps PEL re-reads") {
    withServer { (_, client) =>
      (1 to 5).foreach(i => ok(client.call(StreamCommands.xadd("s", Seq("i" -> i.toString)))))
      ok(client.call(StreamCommands.xgroupCreate("s", "g")))
      // a consumer literally named "count" must not bind the COUNT clause
      val read = parseXRead(ok(client.call(
        Seq("XREADGROUP", "GROUP", "g", "count", "STREAMS", "s", ">"))))
      assert(read.head._2.length == 5)
      // COUNT applies to the '0' PEL re-read too (r9 ADVICE)
      val own = parseXRead(ok(client.call(
        Seq("XREADGROUP", "GROUP", "g", "count", "COUNT", "2", "STREAMS", "s", "0"))))
      assert(own.head._2.length == 2)
      // COUNT 0 = no limit (Redis checks `count && entries >= count`),
      // never an empty read — a consumer configured with 0 must drain
      val all = parseXRead(ok(client.call(
        Seq("XREADGROUP", "GROUP", "g", "count", "COUNT", "0", "STREAMS", "s", "0"))))
      assert(all.head._2.length == 5)
      client.call(Seq("XREADGROUP", "GROUP", "g", "count", "COUNT", "-1",
        "STREAMS", "s", "0")) match {
        case _: ErrorReply => ()
        case other         => fail(s"negative COUNT must error, got $other")
      }
    }
  }

  test("maxClients: connection max+1 is refused with Redis's maxclients error; a freed slot readmits") {
    val server = new RespServer(new RespLoopback(), maxClients = 2)
    try {
      val c1 = new RespClient(server.host, server.port)
      val c2 = new RespClient(server.host, server.port)
      try {
        // both admitted connections actually serve
        assert(ok(c1.call(StreamCommands.xlen("s"))) == IntReply(0))
        assert(ok(c2.call(StreamCommands.xlen("s"))) == IntReply(0))
        val c3 = new RespClient(server.host, server.port)
        try {
          c3.readReply() match {
            case ErrorReply(m) => assert(m.contains("max number of clients"))
            case other         => fail(s"expected maxclients refusal, got $other")
          }
          assert(c3.isClosedByServer)
        } finally c3.close()
        // closing an admitted client frees its slot (the handler's
        // finally deregisters); a fresh connection is eventually served
        c2.close()
        val deadline = System.currentTimeMillis() + 5000
        var served = false
        while (!served && System.currentTimeMillis() < deadline) {
          val c4 = new RespClient(server.host, server.port)
          try {
            c4.call(StreamCommands.xlen("s")) match {
              case IntReply(0) => served = true
              case _           => Thread.sleep(20)
            }
          } catch { case _: Exception => Thread.sleep(20) }
          finally c4.close()
        }
        assert(served, "freed slot was never reused within 5s")
      } finally c1.close()
    } finally server.close()
  }

  test("a 1 MiB frame fed one byte at a time decodes in linear time (framer, r10 ask #5)") {
    val big = "x" * (1024 * 1024)
    val bytes = encodeStrings(StreamCommands.xadd("big", Seq("payload" -> big)))
    val framer = new RespCommandFramer(RespServer.MaxFrameBytes)
    val t0 = System.nanoTime()
    var commands = Vector.empty[Either[String, Seq[String]]]
    var i = 0
    while (i < bytes.length) { // worst-case fragmentation: 1 byte per feed
      val (done, fatal) = framer.feed(bytes, i, 1)
      assert(fatal.isEmpty, s"unexpected fatal: $fatal")
      commands ++= done
      i += 1
    }
    val elapsedMs = (System.nanoTime() - t0) / 1e6
    assert(commands == Vector(Right(StreamCommands.xadd("big", Seq("payload" -> big)))))
    // the old re-append/re-decode path is O(n^2): ~10^12 byte ops here,
    // minutes. Linear framing does ~2 MiB of work; even a cold JIT and
    // a loaded CI box stay orders of magnitude under this bound.
    assert(elapsedMs < 10000, f"1 MiB one-byte-at-a-time took $elapsedMs%.0f ms - not linear")
  }

  test("1 MiB binary-safe value round-trips over the socket in odd-sized fragments") {
    withServer { (_, client) =>
      // CR/LF-riddled payload: framing must come from lengths, not scanning
      val big = Array.tabulate(1024 * 1024)(i => (i % 256).toByte)
      val bigStr = new String(big.map(b => (('a' + (b & 15)).toChar)))
      val bytes = encodeStrings(StreamCommands.xadd("big", Seq("v" -> ("\r\n" + bigStr))))
      var at = 0
      var step = 1
      while (at < bytes.length) { // 1,2,3,... byte fragments across the frame
        val n = math.min(step, bytes.length - at)
        client.send(java.util.Arrays.copyOfRange(bytes, at, at + n))
        at += n
        step = if (step >= 4096) 1 else step * 3
      }
      val id = ok(client.readReply()).text
      assert(id.contains("-"))
      val got = ok(client.call(StreamCommands.xrange("big"))) match {
        case ArrayReply(Some(entries)) => entries.map(parseEntry)
        case other                     => fail(s"bad XRANGE reply: $other")
      }
      assert(got == Seq(StreamMessage(id, Map("v" -> ("\r\n" + bigStr)))))
    }
  }

  test("a command past MaxFrameBytes answers the cap error and loses the connection") {
    withServer { (server, client) =>
      // honest header, oversized payload: the framer's cap pre-check
      // fires on the bulk length BEFORE any allocation
      val n = RespServer.MaxFrameBytes + 1
      client.send(s"*3\r\n$$4\r\nXADD\r\n$$1\r\ns\r\n$$$n\r\n".getBytes("UTF-8"))
      client.readReply() match {
        case ErrorReply(m) => assert(m.contains("exceeds"))
        case other         => fail(s"expected cap error, got $other")
      }
      assert(client.isClosedByServer)
      // server unaffected
      val again = new RespClient(server.host, server.port)
      try assert(ok(again.call(StreamCommands.xlen("s"))) == IntReply(0))
      finally again.close()
    }
  }

  test("null array, empty array and null bulk are framed-but-malformed: ERR, connection lives") {
    withServer { (_, client) =>
      client.send("*-1\r\n*0\r\n*2\r\n$4\r\nXLEN\r\n$-1\r\n".getBytes("UTF-8"))
      (1 to 3).foreach { _ =>
        client.readReply() match {
          case ErrorReply(m) => assert(m.contains("malformed"))
          case other         => fail(s"expected ERR, got $other")
        }
      }
      assert(ok(client.call(StreamCommands.xlen("s"))) == IntReply(0)) // still serving
    }
  }

  test("XTRIM rejects MINID; XADD rejects zero field-value pairs (r9 ADVICE)") {
    withServer { (_, client) =>
      (1 to 4).foreach(i => ok(client.call(StreamCommands.xadd("s", Seq("i" -> i.toString)))))
      client.call(Seq("XTRIM", "s", "MINID", "5")) match {
        case ErrorReply(m) => assert(m.contains("MAXLEN"))
        case other         => fail(s"expected ERR, got $other")
      }
      assert(ok(client.call(StreamCommands.xlen("s"))) == IntReply(4)) // nothing trimmed
      client.call(Seq("XADD", "s", "*")) match {
        case ErrorReply(m) => assert(m.contains("wrong number of arguments"))
        case other         => fail(s"expected ERR, got $other")
      }
    }
  }
}
