package graft.streaming

import scala.collection.mutable

/** Append-only message log with Redis-stream semantics: monotonic
  * `ms-seq` ids, XLEN/XRANGE, approximate MAXLEN trimming, XDEL.
  *
  * Plays the role Redis itself plays for the reference library (the
  * reference owns no storage; SURVEY.md §1.3). In this engine the log
  * backs the protocol state machine in tests and feeds the Structured
  * Streaming source; the 100 TB batch path reads the same shape from
  * parquet (`events` table).
  *
  * Operators: P1 XADD (reference `producer.py:37-51`), P2 MAXLEN~ trim
  * (`producer.py:26-35,47-48`), P3 XTRIM (`base.py:15,21`), P4 XDEL
  * (documented escape hatch, `consumer.py:185-187`).
  */
final class StreamLog(clock: Clock = SystemClock) {

  private val buf = mutable.ArrayBuffer.empty[StreamMessage]
  private var lastMs  = -1L
  private var lastSeq = -1L
  private var nAdded  = 0L
  private var maxDeleted = MsgId.Zero

  /** XADD: append one field-map message; values are stringified on write
    * (`producer.py:37`); returns the assigned monotonic id. With
    * `maxlen`, trims approximately (only once `macroNode` excess rows
    * accumulate — Redis's `~` macro-node behavior: length may exceed
    * maxlen, `test_producer.py:50-56`). */
  def add(
      content: Map[String, Any],
      maxlen: Option[Int] = None,
      approximate: Boolean = true,
      macroNode: Int = 16): String = synchronized {
    val ms = math.max(clock.nowMs, lastMs)
    val seq0 = if (ms == lastMs) lastSeq + 1 else 0L
    // Redis forbids entry id 0-0 (the before-everything sentinel; our
    // MsgId.Zero plays the same role, and cursors read STRICTLY after
    // it) — a clock at 0 mints 0-1 first, never an undeliverable 0-0.
    val seq = if (ms == 0L && seq0 == 0L) 1L else seq0
    lastMs = ms; lastSeq = seq
    val id = MsgId.format(ms, seq)
    buf += StreamMessage(id, content.map { case (k, v) => k -> String.valueOf(v) })
    nAdded += 1
    maxlen.foreach { m =>
      if (!approximate) trim(m)
      else if (buf.length >= m + macroNode) trim(m)
    }
    id
  }

  /** XLEN. */
  def len: Int = synchronized(buf.length)

  /** XTRIM maxlen: keep only the newest `maxlen` messages. */
  def trim(maxlen: Int): Int = synchronized {
    val removed = math.max(buf.length - maxlen, 0)
    if (removed > 0) {
      // trimmed prefix is id-ordered: its last element is its max
      noteDeleted(buf(removed - 1).msgid)
      buf.dropInPlace(removed)
    }
    removed
  }

  /** XDEL: physically delete acked message ids. */
  def delete(ids: String*): Int = synchronized {
    val set = ids.toSet
    val before = buf.length
    buf.iterator.filter(m => set.contains(m.msgid))
      .foreach(m => noteDeleted(m.msgid))
    buf.filterInPlace(m => !set.contains(m.msgid))
    before - buf.length
  }

  // Redis's max-deleted-entry-id contract: the greatest id ever removed
  // by XDEL or trimming (only ids that existed count — unknown XDEL ids
  // never move it, hence noteDeleted fires per matched message).
  private def noteDeleted(id: String): Unit =
    if (MsgId.lt(maxDeleted, id)) maxDeleted = id

  /** XRANGE [min, max] inclusive by id order; `-`/`+` = open ends. */
  def range(min: String = "-", max: String = "+"): Seq[StreamMessage] = synchronized {
    buf.iterator
      .filter(m => (min == "-" || MsgId.lte(min, m.msgid)) &&
                   (max == "+" || MsgId.lte(m.msgid, max)))
      .toSeq
  }

  /** Messages with id strictly greater than `after` (delivery order). */
  def after(after: String, count: Int): Seq[StreamMessage] = synchronized {
    buf.iterator.filter(m => MsgId.lt(after, m.msgid)).take(count).toSeq
  }

  /** XINFO STREAM last-generated-id (`scaler.py:47-48`) — survives
    * trims: it tracks the last id ever assigned, not the buffer tail. */
  def lastGeneratedId: String = synchronized {
    if (lastMs < 0) MsgId.Zero else MsgId.format(lastMs, lastSeq)
  }

  /** XINFO STREAM max-deleted-entry-id: greatest id ever removed by
    * XDEL or trim; 0-0 if nothing was ever deleted (Redis ≥7 field). */
  def maxDeletedEntryId: String = synchronized(maxDeleted)

  /** XINFO STREAM entries-added: lifetime XADD count (trim/XDEL never
    * decrement it — Redis ≥7 field). */
  def entriesAdded: Long = synchronized(nAdded)

  /** XINFO STREAM first-entry / last-entry (None on an empty stream). */
  def firstEntry: Option[StreamMessage] = synchronized(buf.headOption)
  def lastEntry: Option[StreamMessage]  = synchronized(buf.lastOption)

  def all: Seq[StreamMessage] = synchronized(buf.toSeq)
}
