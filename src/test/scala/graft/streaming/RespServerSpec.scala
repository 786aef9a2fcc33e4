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
