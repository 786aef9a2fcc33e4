package graft.streaming

import java.nio.charset.StandardCharsets.UTF_8

/** RESP2 wire codec + Streams command builders — the layer between
  * this library and the wire (the reference speaks TCP via redis-py,
  * `redis_streams/common.py:13-18`; [[RespServer]] is our server half,
  * [[RespClient]] the client half). The codec is transport-agnostic:
  * bytes in, bytes out, incremental decode over partial buffers (TCP
  * delivers fragments), so it is fully unit-tested against the public
  * protocol spec's golden byte sequences (redis.io protocol-spec;
  * RESP2, which every server version speaks) and then reused verbatim
  * by the socket loop.
  *
  * Commands are RESP arrays of bulk strings; replies are the five
  * RESP2 types. [[StreamCommands]] builds exactly the command set the
  * reference client issues (XADD `producer.py:44-48`, XREADGROUP
  * `consumer.py:146`, XACK `consumer.py:191`, XPENDING range
  * `common.py:66`, XCLAIM `monitor.py:132`, XINFO GROUPS/CONSUMERS
  * `monitor.py:146-149`, XINFO STREAM + XLEN `scaler.py:47-50`,
  * XGROUP CREATE/DELCONSUMER `common.py:28,80`, XDEL
  * `consumer.py:186`), plus XAUTOCLAIM/XTRIM/XGROUP DESTROY for the
  * library's own M6/P3/G4 surface.
  */
object RespCodec {

  /** RESP2 reply ADT. Bulk strings stay bytes (binary-safe — a value
    * may contain \r\n); [[Reply.text]] decodes on demand. */
  sealed trait Reply {
    /** UTF-8 text of a simple or bulk string reply (protocol errors
      * for other types — caller knows the expected shape). */
    def text: String = this match {
      case SimpleReply(s)           => s
      case BulkReply(Some(b))       => new String(b, UTF_8)
      case other                    => sys.error(s"not a string reply: $other")
    }
  }
  final case class SimpleReply(s: String) extends Reply
  final case class ErrorReply(msg: String) extends Reply
  final case class IntReply(v: Long) extends Reply
  /** None = RESP null bulk string (`$-1`). */
  final case class BulkReply(bytes: Option[Array[Byte]]) extends Reply
  /** None = RESP null array (`*-1`). */
  final case class ArrayReply(items: Option[Vector[Reply]]) extends Reply

  private val Crlf = Array[Byte]('\r', '\n')

  /** Encode one command as a RESP array of bulk strings. */
  def encode(args: Seq[Array[Byte]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write('*'); out.write(args.length.toString.getBytes(UTF_8)); out.write(Crlf)
    args.foreach { a =>
      out.write('$'); out.write(a.length.toString.getBytes(UTF_8)); out.write(Crlf)
      out.write(a); out.write(Crlf)
    }
    out.toByteArray
  }

  def encodeStrings(args: Seq[String]): Array[Byte] =
    encode(args.map(_.getBytes(UTF_8)))

  /** Encode a reply — the server half of the wire ([[RespLoopback]]);
    * exact inverse of [[decode]] for every VALID reply shape. Simple
    * and error strings are line-framed by the protocol, so embedded
    * CR/LF (reachable through error messages that quote wire input —
    * the classic RESP response-injection vector) are replaced with
    * spaces rather than corrupting the framing; Redis itself forbids
    * newlines in these types. */
  def encodeReply(r: Reply): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def line(s: String): Array[Byte] =
      s.map(c => if (c == '\r' || c == '\n') ' ' else c).getBytes(UTF_8)
    def go(x: Reply): Unit = x match {
      case SimpleReply(s) =>
        out.write('+'); out.write(line(s)); out.write(Crlf)
      case ErrorReply(m) =>
        out.write('-'); out.write(line(m)); out.write(Crlf)
      case IntReply(v) =>
        out.write(':'); out.write(v.toString.getBytes(UTF_8)); out.write(Crlf)
      case BulkReply(None) => out.write("$-1\r\n".getBytes(UTF_8))
      case BulkReply(Some(b)) =>
        out.write('$'); out.write(b.length.toString.getBytes(UTF_8)); out.write(Crlf)
        out.write(b); out.write(Crlf)
      case ArrayReply(None) => out.write("*-1\r\n".getBytes(UTF_8))
      case ArrayReply(Some(items)) =>
        out.write('*'); out.write(items.length.toString.getBytes(UTF_8)); out.write(Crlf)
        items.foreach(go)
    }
    go(r)
    out.toByteArray
  }

  /** A bulk-string reply from text. */
  def bulk(s: String): Reply = BulkReply(Some(s.getBytes(UTF_8)))

  /** Nesting bound for [[decode]]: a buffer of repeated `*1\r\n`
    * frames would otherwise recurse once per level and overflow the
    * stack — a remote-crash vector once the codec sits behind a real
    * socket. Redis's own protocol nests at most a few levels; 64 is
    * generous for every legal Streams reply. */
  val MaxDepth = 64

  /** Incremental decode: one reply starting at `from`. Returns the
    * reply and the index just past it, or None when the buffer does
    * not yet hold a complete reply (read more bytes and retry — the
    * TCP-fragmentation contract). Malformed input throws. */
  def decode(buf: Array[Byte], from: Int = 0): Option[(Reply, Int)] =
    decodeBounded(buf, from, 0)

  private def decodeBounded(buf: Array[Byte], from: Int, depth: Int): Option[(Reply, Int)] = {
    require(depth < MaxDepth, s"RESP nesting exceeds $MaxDepth levels")
    if (from >= buf.length) return None
    def line(start: Int): Option[(String, Int)] = {
      var i = start
      while (i + 1 < buf.length && !(buf(i) == '\r' && buf(i + 1) == '\n')) i += 1
      if (i + 1 >= buf.length) None
      else Some((new String(buf, start, i - start, UTF_8), i + 2))
    }
    buf(from) match {
      case '+' => line(from + 1).map { case (s, next) => (SimpleReply(s), next) }
      case '-' => line(from + 1).map { case (s, next) => (ErrorReply(s), next) }
      case ':' => line(from + 1).map { case (s, next) => (IntReply(s.toLong), next) }
      case '$' =>
        line(from + 1).flatMap { case (lenStr, next) =>
          val len = lenStr.toInt
          require(len >= -1, s"malformed bulk length: $len")
          if (len == -1) Some((BulkReply(None), next))
          else if (next + len + 2 > buf.length) None // payload + CRLF not yet arrived
          else {
            require(buf(next + len) == '\r' && buf(next + len + 1) == '\n',
              "bulk string not CRLF-terminated")
            Some((BulkReply(Some(java.util.Arrays.copyOfRange(buf, next, next + len))), next + len + 2))
          }
        }
      case '*' =>
        line(from + 1).flatMap { case (nStr, next0) =>
          val n = nStr.toInt
          require(n >= -1, s"malformed array length: $n")
          if (n == -1) Some((ArrayReply(None), next0))
          else {
            var at = next0
            val items = Vector.newBuilder[Reply]
            var i = 0
            while (i < n) {
              decodeBounded(buf, at, depth + 1) match {
                case Some((r, nxt)) => items += r; at = nxt; i += 1
                case None           => return None // an element is incomplete
              }
            }
            Some((ArrayReply(Some(items.result())), at))
          }
        }
      case b => sys.error(s"unknown RESP type byte: ${b.toChar}")
    }
  }

  /** Parse one stream entry `[id, [f1, v1, f2, v2, …]]` into the
    * library's normalized [[StreamMessage]] (the C6 normalization the
    * reference does in `consumer.py:160-176`). A null field array
    * (trimmed entry in an XCLAIM reply) yields an empty content map. */
  def parseEntry(r: Reply): StreamMessage = r match {
    case ArrayReply(Some(Vector(id, fields))) =>
      val content = fields match {
        case ArrayReply(Some(fv)) =>
          require(fv.length % 2 == 0, "odd field/value list")
          fv.grouped(2).map { case Vector(f, v) => f.text -> v.text }.toMap
        case ArrayReply(None) => Map.empty[String, String]
        case other            => sys.error(s"bad field list: $other")
      }
      StreamMessage(id.text, content)
    case other => sys.error(s"bad stream entry: $other")
  }

  /** Parse an XREADGROUP / XREAD reply:
    * `[[stream, [entry…]], …]` → per-stream message lists; a null
    * array (no data before block timeout) → empty result. */
  def parseXRead(r: Reply): Seq[(String, Seq[StreamMessage])] = r match {
    case ArrayReply(None) => Seq.empty
    case ArrayReply(Some(streams)) =>
      streams.map {
        case ArrayReply(Some(Vector(name, ArrayReply(Some(entries))))) =>
          name.text -> entries.map(parseEntry)
        case other => sys.error(s"bad XREAD stream block: $other")
      }
    case other => sys.error(s"bad XREAD reply: $other")
  }
}

/** Builders for the Streams command set the reference issues — each
  * returns the argument vector [[RespCodec.encodeStrings]] puts on the
  * wire. Kept as data (not sockets) so they are testable here and
  * transport-wirable in production. */
object StreamCommands {

  /** XADD with the reference's optional approximate MAXLEN trim
    * (`producer.py:44-48`: `maxlen=…, approximate=True`). Fields are
    * a Seq, not a Map: Redis stores XADD field order verbatim in the
    * entry, and the reference producer writes insertion-ordered dict
    * fields — a hash-ordered Map would reorder 5+ fields on the wire. */
  def xadd(stream: String, fields: Seq[(String, String)],
      maxlen: Option[Long] = None, id: String = "*"): Seq[String] = {
    val trim = maxlen.toSeq.flatMap(m => Seq("MAXLEN", "~", m.toString))
    Seq("XADD", stream) ++ trim ++ Seq(id) ++ fields.flatMap(kv => Seq(kv._1, kv._2))
  }

  /** XREADGROUP (`consumer.py:146-151`: COUNT + BLOCK + `>` or `0`). */
  def xreadgroup(group: String, consumer: String, stream: String,
      count: Int, blockMs: Long, newOnly: Boolean = true): Seq[String] =
    Seq("XREADGROUP", "GROUP", group, consumer,
      "COUNT", count.toString, "BLOCK", blockMs.toString,
      "STREAMS", stream, if (newOnly) ">" else "0")

  def xack(stream: String, group: String, ids: Seq[String]): Seq[String] =
    Seq("XACK", stream, group) ++ ids

  /** XPENDING range form, optionally filtered to one consumer — the
    * trailing consumername redis-py appends (`common.py:66-73`). */
  def xpendingRange(stream: String, group: String,
      min: String = "-", max: String = "+", count: Int = 100,
      consumer: Option[String] = None): Seq[String] =
    Seq("XPENDING", stream, group, min, max, count.toString) ++ consumer

  /** XRANGE — the scaler's backlog probe (`scaler.py:56-62`). */
  def xrange(stream: String, min: String = "-", max: String = "+",
      count: Option[Int] = None): Seq[String] =
    Seq("XRANGE", stream, min, max) ++ count.toSeq.flatMap(n => Seq("COUNT", n.toString))

  /** XCLAIM (`monitor.py:132-137`: min-idle-time + ids). */
  def xclaim(stream: String, group: String, consumer: String,
      minIdleMs: Long, ids: Seq[String]): Seq[String] =
    Seq("XCLAIM", stream, group, consumer, minIdleMs.toString) ++ ids

  /** XAUTOCLAIM (the reference's named future work; M6). */
  def xautoclaim(stream: String, group: String, consumer: String,
      minIdleMs: Long, start: String, count: Int): Seq[String] =
    Seq("XAUTOCLAIM", stream, group, consumer, minIdleMs.toString,
      start, "COUNT", count.toString)

  /** XGROUP CREATE with MKSTREAM. The default start id is `0-0` —
    * deliver from the beginning — because that is what the reference
    * client sends (`common.py:28-31`: `id="0-0", mkstream=True`; its
    * own docstring quotes the `$` form and then deliberately uses
    * `0-0`). */
  def xgroupCreate(stream: String, group: String, startId: String = "0-0"): Seq[String] =
    Seq("XGROUP", "CREATE", stream, group, startId, "MKSTREAM")

  def xgroupDelConsumer(stream: String, group: String, consumer: String): Seq[String] =
    Seq("XGROUP", "DELCONSUMER", stream, group, consumer)

  def xgroupDestroy(stream: String, group: String): Seq[String] =
    Seq("XGROUP", "DESTROY", stream, group)

  def xinfoGroups(stream: String): Seq[String] = Seq("XINFO", "GROUPS", stream)
  def xinfoConsumers(stream: String, group: String): Seq[String] =
    Seq("XINFO", "CONSUMERS", stream, group)
  def xinfoStream(stream: String): Seq[String] = Seq("XINFO", "STREAM", stream)
  def xlen(stream: String): Seq[String] = Seq("XLEN", stream)
  def xdel(stream: String, ids: Seq[String]): Seq[String] = Seq("XDEL", stream) ++ ids
  def xtrimMaxlen(stream: String, maxlen: Long, approximate: Boolean): Seq[String] =
    Seq("XTRIM", stream, "MAXLEN") ++ (if (approximate) Seq("~") else Nil) :+ maxlen.toString
}
