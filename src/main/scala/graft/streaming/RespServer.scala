package graft.streaming

import java.io.BufferedOutputStream
import java.net.{InetAddress, ServerSocket, Socket, SocketException}
import java.util.concurrent.atomic.AtomicBoolean
import scala.collection.mutable
import RespCodec._

/** A real localhost TCP endpoint around [[RespLoopback]] — the last
  * piece of the reference's defining trait: a client speaking the wire
  * protocol to a server over a socket (`redis_streams/common.py:13-18`
  * constructs exactly such a connection). [[RespCodec]] was built
  * transport-agnostic and incremental for precisely this moment: the
  * per-connection loop below feeds it raw TCP fragments and it yields
  * complete commands as they frame up, so pipelining (several commands
  * in one segment) and fragmentation (one command across many
  * segments) both fall out of the same decode loop with no extra code.
  *
  * Concurrency: one daemon acceptor thread, one daemon handler thread
  * per connection. All command execution funnels into
  * [[RespLoopback.execute]], whose engine objects ([[StreamLog]],
  * [[ConsumerGroup]]) are internally synchronized — concurrent clients
  * interleave at command granularity exactly like Redis's own
  * single-threaded command loop.
  *
  * Error surface: malformed-but-framed commands answer `-ERR …` and
  * the connection lives on; an unframeable byte stream (unknown type
  * byte, bad length) answers one `-ERR protocol error` and closes the
  * connection, because resynchronizing an unframed stream is
  * impossible — Redis does the same.
  */
final class RespServer(val loopback: RespLoopback = new RespLoopback())
    extends AutoCloseable {

  // port 0 = ephemeral: the OS picks a free port, tests never collide
  private val server = new ServerSocket(0, 50, InetAddress.getLoopbackAddress)
  private val running = new AtomicBoolean(true)
  private val connections = mutable.Set.empty[Socket]

  def port: Int = server.getLocalPort
  def host: String = server.getInetAddress.getHostAddress

  private val acceptor = new Thread(() => {
    while (running.get) {
      try {
        val sock = server.accept()
        // Registration re-checks `running` INSIDE the lock close() also
        // takes: a connection accepted in the accept()/close() window
        // would otherwise register after close() cleared the set and
        // keep its handler thread serving a shut-down engine.
        val admitted = connections.synchronized {
          if (running.get) { connections += sock; true } else false
        }
        if (admitted) {
          val t = new Thread(() => handle(sock), s"resp-conn-${sock.getPort}")
          t.setDaemon(true)
          t.start()
        } else {
          try sock.close() catch { case _: Exception => () }
        }
      } catch {
        case _: SocketException => () // server closed — loop exits via flag
        case _: Exception       => ()
      }
    }
  }, "resp-accept")
  acceptor.setDaemon(true)
  acceptor.start()

  /** One connection's lifetime: accumulate fragments, decode every
    * complete command in the buffer, execute, reply, compact.
    *
    * The receive buffer is HARD-CAPPED at [[RespServer.MaxFrameBytes]]
    * (Redis's proto-max-bulk-len analog): a client streaming a huge
    * length header and trickling elements must exhaust its cap, answer
    * one ERR and lose the connection — never grow the heap until OOM
    * (the same remote-crash class the decoder's nesting bound closes).
    * Within the cap the per-fragment re-append/re-decode is O(n²) in
    * the worst case — bounded at cap² bytes touched, accepted for this
    * accept-loop's scale; a production front-end would length-prefix
    * off the bulk headers before buffering. */
  private def handle(sock: Socket): Unit = {
    val in = sock.getInputStream
    val out = new BufferedOutputStream(sock.getOutputStream)
    var buf = Array.emptyByteArray
    val chunk = new Array[Byte](8192)
    try {
      var open = true
      while (open) {
        val n = in.read(chunk)
        if (n < 0) open = false
        else if (buf.length + n > RespServer.MaxFrameBytes) {
          out.write(encodeReply(ErrorReply(
            s"ERR frame exceeds ${RespServer.MaxFrameBytes} bytes")))
          out.flush()
          open = false
        }
        else {
          buf = buf ++ java.util.Arrays.copyOfRange(chunk, 0, n)
          var at = 0
          var draining = true
          while (draining && open) {
            (try Right(RespCodec.decode(buf, at))
             catch { case e: Exception => Left(e) }) match {
              case Right(Some((ArrayReply(Some(parts)), next))) =>
                // .text throws on non-bulk elements — that is a framed
                // but malformed command: ERR, keep the connection.
                val reply =
                  try loopback.execute(parts.map(_.text))
                  catch { case _: Exception => ErrorReply("ERR malformed command") }
                out.write(encodeReply(reply))
                at = next
              case Right(Some((_, next))) =>
                out.write(encodeReply(ErrorReply("ERR malformed command")))
                at = next
              case Right(None) => draining = false // partial — await more bytes
              case Left(_) =>
                out.write(encodeReply(ErrorReply("ERR protocol error")))
                open = false // unframeable stream: cannot resync, drop it
            }
          }
          out.flush()
          buf = java.util.Arrays.copyOfRange(buf, at, buf.length)
        }
      }
    } catch { case _: Exception => () } // peer reset — just clean up
    finally {
      try sock.close() catch { case _: Exception => () }
      connections.synchronized(connections -= sock)
    }
  }

  override def close(): Unit = if (running.compareAndSet(true, false)) {
    try server.close() catch { case _: Exception => () }
    // `running` is already false, so the acceptor's locked admission
    // check (above) refuses any connection racing this cleanup.
    connections.synchronized {
      connections.foreach(s => try s.close() catch { case _: Exception => () })
      connections.clear()
    }
  }
}

object RespServer {
  /** Hard cap on one connection's buffered frame bytes — Redis's
    * proto-max-bulk-len analog (512 MiB there; 8 MiB here, generous
    * for stream commands whose values are message fields). */
  val MaxFrameBytes: Int = 8 * 1024 * 1024
}

/** Minimal blocking RESP client — the role redis-py plays for the
  * reference (`common.py:13-18`): encode a command array, write it to
  * the socket, incrementally decode one reply (re-reading while the
  * buffer holds only a fragment). Test-path simplicity over pooling —
  * one socket, one in-flight command. */
final class RespClient(host: String, port: Int) extends AutoCloseable {
  private val sock = new Socket(host, port)
  private val in = sock.getInputStream
  private val out = sock.getOutputStream
  private var buf = Array.emptyByteArray

  /** Raw bytes out — lets tests exercise deliberate fragmentation and
    * pipelining below the command abstraction. */
  def send(bytes: Array[Byte]): Unit = { out.write(bytes); out.flush() }

  /** One complete reply off the wire, blocking across fragments. */
  def readReply(): Reply = {
    var decoded = RespCodec.decode(buf)
    val chunk = new Array[Byte](8192)
    while (decoded.isEmpty) {
      val n = in.read(chunk)
      require(n >= 0, "connection closed mid-reply")
      buf = buf ++ java.util.Arrays.copyOfRange(chunk, 0, n)
      decoded = RespCodec.decode(buf)
    }
    val (reply, next) = decoded.get
    buf = java.util.Arrays.copyOfRange(buf, next, buf.length)
    reply
  }

  /** One request→reply exchange. */
  def call(args: Seq[String]): Reply = {
    send(RespCodec.encodeStrings(args))
    readReply()
  }

  /** Whether the peer has closed: probes with one read. A byte that
    * arrives instead of EOF (an unread pipelined reply's first byte)
    * is APPENDED to the decode buffer, not swallowed — the next
    * readReply stays frame-aligned — and the probe timeout is restored
    * afterwards so a later blocking readReply doesn't inherit a 2 s
    * SocketTimeoutException. Only a probe TIMEOUT means "still open";
    * any other I/O failure (connection reset surfaces as a
    * SocketException, not a -1 read) is a dead connection. */
  def isClosedByServer: Boolean = {
    val prev = try sock.getSoTimeout catch { case _: Exception => 0 }
    try {
      sock.setSoTimeout(2000)
      val b = in.read()
      if (b >= 0) { buf = buf :+ b.toByte; false } else true
    }
    catch {
      case _: java.net.SocketTimeoutException => false
      case _: Exception                       => true
    }
    finally { try sock.setSoTimeout(prev) catch { case _: Exception => () } }
  }

  override def close(): Unit = try sock.close() catch { case _: Exception => () }
}
