package graft.streaming

import scala.collection.mutable
import RespCodec._

/** In-process RESP endpoint: decode a command off the wire, execute it
  * against the library's own [[StreamLog]]/[[ConsumerGroup]], encode
  * the reply — the full protocol path minus the TCP socket (which the
  * sandbox cannot open: no server exists; SURVEY §2.2). A production
  * deployment swaps [[call]]'s byte arrays for a socket channel and
  * nothing else changes; the tests drive produce→consume→ack→claim
  * cycles entirely through wire bytes.
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

  private def groupOf(stream: String, group: String): ConsumerGroup = synchronized {
    groups.getOrElseUpdate((stream, group),
      ConsumerGroup.create(logOf(stream), group, clock))
  }

  /** One request→reply exchange on wire bytes. */
  def call(request: Array[Byte]): Array[Byte] =
    RespCodec.decode(request) match {
      case Some((ArrayReply(Some(parts)), _)) =>
        encodeReply(execute(parts.map(_.text)))
      case _ => encodeReply(ErrorReply("ERR malformed command"))
    }

  /** Execute one parsed command. Protocol errors come back as RESP
    * errors (`-ERR …`), never as exceptions across the wire boundary. */
  def execute(args: Seq[String]): Reply =
    try dispatch(args)
    catch { case e: Exception => ErrorReply(s"ERR ${e.getMessage}") }

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
      // XADD stream [MAXLEN ~ n] id field value …
      val stream = args(1)
      val (maxlen, rest) =
        if (args(2).equalsIgnoreCase("MAXLEN"))
          (Some(args(4).toInt), args.drop(5)) // args(3) is the '~'
        else (None, args.drop(2))
      require(rest.head == "*", "only auto ids ('*') are supported")
      val fields = rest.tail.grouped(2).map { case Seq(f, v) => f -> v }.toSeq
      // ListMap preserves wire field order (the xadd builder contract)
      val id = logOf(stream).add(
        scala.collection.immutable.ListMap(fields: _*), maxlen)
      bulk(id)

    case "XLEN" => IntReply(logOf(args(1)).len.toLong)

    case "XREADGROUP" =>
      // XREADGROUP GROUP g c COUNT n BLOCK ms STREAMS s (>|0)
      val (g, c) = (args(2), args(3))
      val count = args(5).toInt // args(6-7) = BLOCK ms, ignored
      val stream = args(9)
      val msgs = args(10) match {
        case ">" => groupOf(stream, g).readNew(c, count)
        case "0" => groupOf(stream, g).readOwn(c)
        case other => sys.error(s"unsupported XREADGROUP id: $other")
      }
      if (msgs.isEmpty && args(10) == ">") ArrayReply(None) // Redis nil on no data
      else ArrayReply(Some(Vector(ArrayReply(Some(Vector(
        bulk(stream), ArrayReply(Some(msgs.toVector.map(entryReply)))))))))

    case "XACK" =>
      val g = groupOf(args(1), args(2))
      IntReply(args.drop(3).map(g.ack).sum.toLong)

    case "XPENDING" =>
      // range form: XPENDING s g min max count → [id, consumer, idle, times]
      val g = groupOf(args(1), args(2))
      val (min, max, count) = (args(3), args(4), args(5).toInt)
      val now = clock.nowMs
      val rows = g.consumers.flatMap(c => g.pendingOf(c))
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
      case "CREATE"      => groupOf(args(2), args(3)); SimpleReply("OK")
      case "DELCONSUMER" => IntReply(groupOf(args(2), args(3)).delConsumer(args(4)).toLong)
      case "DESTROY" =>
        synchronized(groups.remove((args(2), args(3)))).foreach(_.destroy())
        IntReply(1L)
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
      case other => ErrorReply(s"ERR unknown XINFO subcommand: $other")
    }

    case "XDEL"  => IntReply(logOf(args(1)).delete(args.drop(2): _*).toLong)

    case "XTRIM" =>
      // XTRIM s MAXLEN [~] n
      val n = args.last.toInt
      IntReply(logOf(args(1)).trim(n).toLong)

    case other => ErrorReply(s"ERR unknown command: $other")
  }
}
