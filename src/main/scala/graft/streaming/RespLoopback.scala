package graft.streaming

import scala.collection.mutable
import RespCodec._

/** In-process RESP endpoint: decode a command off the wire, execute it
  * against the library's own [[StreamLog]]/[[ConsumerGroup]], encode
  * the reply. [[RespServer]] wraps this in a real localhost TCP accept
  * loop — the full client-socket-server path the reference runs on
  * (`common.py:13-18`) — while the in-process [[call]] form keeps the
  * protocol tests transport-free and fast; the tests drive
  * produce→consume→ack→claim cycles through both.
  *
  * Semantics notes:
  *  - BLOCK is accepted and ignored — a loopback answers immediately;
  *    blocking is a transport concern, not a protocol one.
  *  - XGROUP CREATE is idempotent (the library's G1 semantics — the
  *    reference client swallows BUSYGROUP anyway, `common.py:33-41`).
  *  - XADD supports auto ids (`*`) only, which is all the reference
  *    producer ever sends (`producer.py:44-48`).
  */
final class RespLoopback(clock: Clock = SystemClock) {

  private val logs = mutable.Map.empty[String, StreamLog]
  private val groups = mutable.Map.empty[(String, String), ConsumerGroup]

  private def logOf(stream: String): StreamLog =
    synchronized(logs.getOrElseUpdate(stream, new StreamLog(clock)))

  /** The backing log of a stream — the handoff point to the DSv2
    * source: register it with [[StreamLogRegistry]] and wire-produced
    * entries flow straight into a Structured Streaming query. */
  def streamLog(stream: String): StreamLog = logOf(stream)

  /** The live group created by a wire XGROUP CREATE, if any — the
    * handoff point to the control plane: a [[Monitor]] built over it
    * sweeps/rebalances the same PEL that wire XREADGROUP/XACK mutate. */
  def consumerGroup(stream: String, group: String): Option[ConsumerGroup] =
    synchronized(groups.get((stream, group)))

  /** Only XGROUP CREATE creates; every other group command on a
    * missing group answers Redis's NOGROUP error — auto-creating here
    * would turn a typo'd group name into silent phantom state. */
  private def groupOf(stream: String, group: String): ConsumerGroup = synchronized {
    groups.getOrElse((stream, group),
      sys.error(s"NOGROUP No such consumer group '$group' for key name '$stream'"))
  }

  private def createGroup(stream: String, group: String): ConsumerGroup = synchronized {
    groups.getOrElseUpdate((stream, group),
      ConsumerGroup.create(logOf(stream), group, clock))
  }

  /** One request→reply exchange on wire bytes. Decode failures (unknown
    * type byte, bad lengths, non-bulk array elements) answer a RESP
    * error like every other protocol fault — never a JVM exception,
    * which behind a socket would kill the connection handler. */
  def call(request: Array[Byte]): Array[Byte] =
    encodeReply(
      try RespCodec.decode(request) match {
        case Some((ArrayReply(Some(parts)), _)) => execute(parts.map(_.text))
        case _ => ErrorReply("ERR malformed command")
      } catch { case _: Exception => ErrorReply("ERR malformed command") })

  /** Execute one parsed command. Protocol errors come back as RESP
    * errors, never as exceptions across the wire boundary; messages
    * that already carry a Redis error code (NOGROUP) keep it as their
    * prefix, everything else gets the generic ERR. */
  def execute(args: Seq[String]): Reply =
    try dispatch(args)
    catch { case e: Exception =>
      val m = String.valueOf(e.getMessage)
      ErrorReply(if (m.startsWith("NOGROUP")) m else s"ERR $m")
    }

  private def entryReply(m: StreamMessage): Reply =
    ArrayReply(Some(Vector(bulk(m.msgid),
      ArrayReply(Some(m.content.toVector.flatMap(kv => Vector(bulk(kv._1), bulk(kv._2))))))))

  /** Entry reply for a PEL id whose message may have been trimmed from
    * the stream — Redis answers nil fields for those (the readOwn
    * tombstone rule). */
  private def entryById(log: StreamLog, id: String): Reply =
    log.range(id, id).headOption.map(entryReply).getOrElse(
      ArrayReply(Some(Vector(bulk(id), ArrayReply(None)))))

  private def dispatch(args: Seq[String]): Reply = args.head.toUpperCase match {
    case "XADD" =>
      // XADD stream [MAXLEN [~] n] id field value … — both the
      // approximate ('~') and the exact trim forms are legal Redis.
      val stream = args(1)
      val (maxlen, approx, rest) =
        if (args(2).equalsIgnoreCase("MAXLEN")) {
          if (args(3) == "~") (Some(args(4).toInt), true, args.drop(5))
          else (Some(args(3).toInt), false, args.drop(4))
        } else (None, true, args.drop(2))
      require(rest.head == "*", "only auto ids ('*') are supported")
      // Redis rejects XADD with no field-value pairs, and an odd list
      // would otherwise crash the grouped-pairs match below.
      require(rest.tail.nonEmpty && rest.tail.length % 2 == 0,
        "wrong number of arguments for 'xadd' command")
      val fields = rest.tail.grouped(2).map { case Seq(f, v) => f -> v }.toSeq
      // ListMap preserves wire field order (the xadd builder contract)
      val id = logOf(stream).add(
        scala.collection.immutable.ListMap(fields: _*), maxlen, approximate = approx)
      bulk(id)

    case "XLEN" => IntReply(logOf(args(1)).len.toLong)

    case "XRANGE" =>
      // XRANGE key start end [COUNT n] — inclusive id range, '-'/'+'
      // open ends. This is the reference scaler's backlog probe:
      // xrange(min=last_delivered, max=last_generated), scaler.py:56-62.
      require(args.length == 4 ||
        (args.length == 6 && args(4).equalsIgnoreCase("COUNT")),
        "expected XRANGE <key> <start> <end> [COUNT <n>]")
      val count = if (args.length == 6) args(5).toInt else Int.MaxValue
      ArrayReply(Some(
        logOf(args(1)).range(args(2), args(3)).take(count).toVector.map(entryReply)))

    case "XREADGROUP" =>
      // XREADGROUP GROUP g c [COUNT n] [BLOCK ms] STREAMS s (>|0) —
      // optional clauses are consumed positionally after the fixed
      // GROUP g c prefix (Redis treats those three positions as opaque
      // names: a consumer literally called "count" must not bind the
      // COUNT clause). BLOCK is accepted and ignored: a loopback
      // answers immediately.
      require(args(1).equalsIgnoreCase("GROUP"), "expected GROUP clause")
      val (g, c) = (args(2), args(3))
      var count = Int.MaxValue
      var i = 4
      var done = false
      while (!done && i < args.length) args(i).toUpperCase match {
        // Redis: COUNT 0 disables the limit (t_stream.c checks
        // `count && entries >= count`), it does NOT mean "zero rows" —
        // a consumer configured with COUNT 0 must drain, not spin.
        case "COUNT" =>
          val n = args(i + 1).toInt
          require(n >= 0, "COUNT must be >= 0")
          count = if (n == 0) Int.MaxValue else n
          i += 2
        case "BLOCK" => args(i + 1).toLong; i += 2 // validated, ignored
        case "STREAMS" => done = true
        case other => sys.error(s"syntax error near '$other'")
      }
      require(done && args.length == i + 3, "expected STREAMS <key> <id>")
      val stream = args(i + 1)
      val msgs = args(i + 2) match {
        case ">" => groupOf(stream, g).readNew(c, count)
        case "0" => groupOf(stream, g).readOwn(c, count)
        case other => sys.error(s"unsupported XREADGROUP id: $other")
      }
      if (msgs.isEmpty && args(i + 2) == ">") ArrayReply(None) // Redis nil on no data
      else ArrayReply(Some(Vector(ArrayReply(Some(Vector(
        bulk(stream), ArrayReply(Some(msgs.toVector.map(entryReply)))))))))

    case "XACK" =>
      val g = groupOf(args(1), args(2))
      IntReply(args.drop(3).map(g.ack).sum.toLong)

    case "XPENDING" =>
      // range form: XPENDING s g min max count [consumer] →
      // [id, consumer, idle, times]. The optional trailing consumer
      // filter is what redis-py's xpending_range(consumername=…) sends
      // — the reference consumer counts its own assigned items with it
      // (`common.py:66-73`, called from `consumer.py:113-119`).
      require(args.length == 6 || args.length == 7,
        "expected XPENDING <key> <group> <min> <max> <count> [consumer]")
      val g = groupOf(args(1), args(2))
      val (min, max, count) = (args(3), args(4), args(5).toInt)
      val byConsumer = args.lift(6)
      val now = clock.nowMs
      val rows = g.consumers.flatMap(c => g.pendingOf(c))
        .filter(e => byConsumer.forall(_ == e.consumer))
        .filter(e => (min == "-" || MsgId.lte(min, e.msgid)) &&
                     (max == "+" || MsgId.lte(e.msgid, max)))
        .sortBy(e => MsgId.parse(e.msgid)).take(count)
      ArrayReply(Some(rows.toVector.map(e => ArrayReply(Some(Vector(
        bulk(e.msgid), bulk(e.consumer),
        IntReply(e.timeSinceDelivered(now)), IntReply(e.timesDelivered.toLong)))))))

    case "XCLAIM" =>
      // XCLAIM s g c minIdle id … → full entries of the claimed ids
      val log = logOf(args(1))
      val claimed = groupOf(args(1), args(2))
        .claim(args.drop(5), args(3), args(4).toLong)
      ArrayReply(Some(claimed.toVector.map(entryById(log, _))))

    case "XAUTOCLAIM" =>
      // XAUTOCLAIM s g c minIdle start COUNT n → [cursor, entries] (6.2 shape)
      val log = logOf(args(1))
      val (cursor, ids) = groupOf(args(1), args(2))
        .autoClaim(args(3), args(4).toLong, args(5), args(7).toInt)
      ArrayReply(Some(Vector(bulk(cursor),
        ArrayReply(Some(ids.toVector.map(entryById(log, _)))))))

    case "XGROUP" => args(1).toUpperCase match {
      case "CREATE" =>
        // The library's ConsumerGroup always starts at 0-0 (the
        // reference's own choice, `common.py:28-31`); the '$' form
        // would need a from-now cursor it deliberately lacks.
        require(args(4) == "0-0" || args(4) == "0",
          s"only start id 0-0 is supported (the reference's form), got ${args(4)}")
        createGroup(args(2), args(3)); SimpleReply("OK")
      case "DELCONSUMER" => IntReply(groupOf(args(2), args(3)).delConsumer(args(4)).toLong)
      case "DESTROY" =>
        // Redis replies with the number of groups destroyed: 1 or 0.
        val removed = synchronized(groups.remove((args(2), args(3))))
        removed.foreach(_.destroy())
        IntReply(if (removed.isDefined) 1L else 0L)
      case other => ErrorReply(s"ERR unknown XGROUP subcommand: $other")
    }

    case "XINFO" => args(1).toUpperCase match {
      case "GROUPS" =>
        val stream = args(2)
        val gs = synchronized(groups.collect { case ((s, _), g) if s == stream => g }.toVector)
        ArrayReply(Some(gs.map(g => ArrayReply(Some(Vector(
          bulk("name"), bulk(g.name),
          bulk("consumers"), IntReply(g.consumers.size.toLong),
          bulk("pending"), IntReply(g.pendingCount.toLong),
          bulk("last-delivered-id"), bulk(g.lastDelivered)))))))
      case "CONSUMERS" =>
        val g = groupOf(args(2), args(3))
        ArrayReply(Some(g.consumerInfo.toVector.map { case (name, pending, idle) =>
          ArrayReply(Some(Vector(
            bulk("name"), bulk(name),
            bulk("pending"), IntReply(pending.toLong),
            bulk("idle"), IntReply(idle))))
        }))
      case "STREAM" =>
        // XINFO STREAM s — flat key/value pair list like Redis. The
        // reference only consumes length + last-generated-id
        // (`scaler.py:47-48`), but the full Redis ≥7 field set rides
        // along (entries-added, max-deleted-entry-id, first-entry,
        // last-entry — entries encoded like XRANGE rows, nil when the
        // stream is empty) so redis-py's dict parse sees the same keys
        // against either server.
        val log = logOf(args(2))
        val stream = args(2)
        val nGroups = synchronized(groups.keysIterator.count(_._1 == stream))
        def entryOrNil(e: Option[StreamMessage]): Reply =
          e.map(entryReply).getOrElse(BulkReply(None))
        ArrayReply(Some(Vector(
          bulk("length"), IntReply(log.len.toLong),
          bulk("last-generated-id"), bulk(log.lastGeneratedId),
          bulk("max-deleted-entry-id"), bulk(log.maxDeletedEntryId),
          bulk("entries-added"), IntReply(log.entriesAdded),
          bulk("groups"), IntReply(nGroups.toLong),
          bulk("first-entry"), entryOrNil(log.firstEntry),
          bulk("last-entry"), entryOrNil(log.lastEntry))))
      case other => ErrorReply(s"ERR unknown XINFO subcommand: $other")
    }

    case "XDEL"  => IntReply(logOf(args(1)).delete(args.drop(2): _*).toLong)

    case "XTRIM" =>
      // XTRIM s MAXLEN [~] n — MAXLEN is the only supported strategy;
      // MINID (or anything else) must fail loudly, not silently trim
      // to the wrong semantics.
      require(args(2).equalsIgnoreCase("MAXLEN"),
        s"unsupported trim strategy: ${args(2)} (only MAXLEN)")
      require(args.length == 4 || (args.length == 5 && args(3) == "~"),
        "expected XTRIM <key> MAXLEN [~] <n>")
      IntReply(logOf(args(1)).trim(args.last.toInt).toLong)

    case other => ErrorReply(s"ERR unknown command: $other")
  }
}
