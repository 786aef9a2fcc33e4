package graft.streaming

import scala.collection.mutable

/** Consumer-group state: a named cursor (`last-delivered-id`) over a
  * [[StreamLog]] plus the group PEL — the at-least-once core of the
  * reference (SURVEY.md §1.1).
  *
  * Operators: G1 idempotent create (reference `common.py:20-41`),
  * C2/C4 XREADGROUP `>`/`0` (`consumer.py:121-162,26-33`), C5/G2
  * XPENDING (`common.py:48-73`), C7 XACK (`consumer.py:180-191`),
  * M6 XCLAIM min-idle (`monitor.py:129-138`), G3 XGROUP DELCONSUMER
  * (`common.py:75-85`), G4 DESTROY (`base.py:22-23`), M1/M2 XINFO.
  */
final class ConsumerGroup private (
    val log: StreamLog,
    val name: String,
    val clock: Clock) {

  private var lastDeliveredId: String = MsgId.Zero
  // msgid → entry, ordered by msgid: XPENDING/XAUTOCLAIM scan in id
  // order, and a sorted map makes autoClaim's cursor seek O(log PEL)
  // + O(scanned) instead of sort-the-world per call.
  private val pel = mutable.TreeMap.empty[String, PelEntry](MsgId.ordering)
  private val lastSeenMs = mutable.LinkedHashMap.empty[String, Long]       // consumer → last fetch

  /** C2: XREADGROUP `>` — deliver up to `count` never-delivered messages
    * to `consumer`; each enters the PEL (at-least-once, noack=false). */
  def readNew(consumer: String, count: Int): Seq[StreamMessage] = synchronized {
    touch(consumer)
    if (count <= 0) return Seq.empty
    val msgs = log.after(lastDeliveredId, count)
    val now = clock.nowMs
    msgs.foreach { m =>
      lastDeliveredId = m.msgid
      pel(m.msgid) = PelEntry(m.msgid, consumer, now, 1)
    }
    msgs
  }

  /** C4: XREADGROUP `0` — re-read everything currently owned by
    * `consumer` (crash-retry redelivery), in id order. PEL entries whose
    * message has been trimmed/deleted from the stream are returned as
    * id-only tombstones (empty content), matching Redis's nil-fields
    * reply — the caller can still ack them, so a trim can never wedge a
    * consumer behind unackable ghosts. */
  def readOwn(consumer: String, count: Int = Int.MaxValue): Seq[StreamMessage] = synchronized {
    // Wire COUNT 0 means "no limit" and the loopback maps it before
    // calling here, but direct API callers get the same contract:
    // count <= 0 = unlimited, never take(negative) = silently empty.
    val limit = if (count <= 0) Int.MaxValue else count
    touch(consumer)
    val owned = pel.valuesIterator.filter(_.consumer == consumer).map(_.msgid).toSet
    val live = log.all.filter(m => owned.contains(m.msgid))
    val liveIds = live.map(_.msgid).toSet
    val ghosts = (owned -- liveIds).toSeq.sorted(MsgId.ordering)
      .map(id => StreamMessage(id, Map.empty))
    // Redis applies COUNT to PEL re-reads too — a recovering consumer
    // paces its redelivery with the same batch size as fresh reads.
    (live ++ ghosts).sortBy(m => MsgId.parse(m.msgid)).take(limit)
  }

  /** G2/C5: XPENDING_RANGE — up to `count` PEL entries of one consumer
    * over the full id range, in id order. */
  def pendingOf(consumer: String, count: Int = Int.MaxValue): Seq[PelEntry] = synchronized {
    pel.valuesIterator.filter(_.consumer == consumer).toSeq
      .sortBy(e => MsgId.parse(e.msgid)).take(count)
  }

  /** C7: XACK — remove from the group PEL; does NOT delete from the
    * stream (the v0.3.0 doc fix, reference `consumer.py:182-190`).
    * Returns 1 if the id was pending, else 0. */
  def ack(msgid: String): Int = synchronized {
    if (pel.remove(msgid).isDefined) 1 else 0
  }

  /** M6: XCLAIM — reassign `ids` to `newConsumer` iff idle ≥ `minIdleMs`
    * (guard against stealing in-flight work, `monitor.py:65-68`); resets
    * the delivery clock and bumps `times_delivered`. Returns claimed ids. */
  def claim(ids: Seq[String], newConsumer: String, minIdleMs: Long): Seq[String] = synchronized {
    // Redis XCLAIM auto-creates the claiming consumer in the group
    // (it appears in XINFO CONSUMERS immediately, before it ever
    // reads) — without the touch, a monitor that rebalanced onto a
    // fresh consumer wouldn't see the new owner in its own report.
    touch(newConsumer)
    val now = clock.nowMs
    ids.flatMap { id =>
      pel.get(id) match {
        case Some(e) if e.timeSinceDelivered(now) >= minIdleMs =>
          pel(id) = PelEntry(id, newConsumer, now, e.timesDelivered + 1)
          Some(id)
        case _ => None
      }
    }
  }

  /** XAUTOCLAIM — the one-call sweep the reference names as the future
    * simplification of its list→claim→delete rebalance dance
    * (`monitor.py:101`) but never implements: atomically claim up to
    * `count` PEL entries idle ≥ `minIdleMs` for `newConsumer`, in msgid
    * order starting at `start` (exclusive of nothing — Redis semantics:
    * inclusive scan cursor). Returns (nextStart, claimed ids): callers
    * loop with the returned cursor until it wraps to "0-0", exactly the
    * Redis 6.2 contract, so a monitor sweeps an arbitrarily large PEL
    * in bounded batches instead of one unbounded XPENDING read. */
  def autoClaim(newConsumer: String, minIdleMs: Long, start: String = "0-0",
      count: Int = 100): (String, Seq[String]) = synchronized {
    // Redis requires COUNT > 0; count = 0 here would return the scan
    // START as the next cursor without claiming — the documented
    // loop-until-"0-0" caller would spin forever on it.
    require(count > 0, s"autoClaim count must be positive, got $count")
    touch(newConsumer) // XAUTOCLAIM auto-creates the consumer, as XCLAIM does
    val now = clock.nowMs
    // Scan in msgid order from `start` (the PEL is a TreeMap, so the
    // seek is O(log PEL)) and stop once `count` eligible entries are
    // collected — per-call work proportional to entries SCANNED, and
    // the cursor is the first unscanned msgid, as in Redis 6.2 (not
    // the next ELIGIBLE id, which would cost a full eligibility sweep
    // exactly when the PEL is large and mostly busy).
    val it = pel.iteratorFrom(start)
    val batch = Seq.newBuilder[PelEntry]
    var taken = 0
    var nextStart = MsgId.Zero
    while (it.hasNext && nextStart == MsgId.Zero) {
      val (id, e) = it.next()
      if (taken == count) nextStart = id
      else if (e.timeSinceDelivered(now) >= minIdleMs) { batch += e; taken += 1 }
    }
    val claimed = batch.result()
    claimed.foreach(e =>
      pel(e.msgid) = PelEntry(e.msgid, newConsumer, now, e.timesDelivered + 1))
    (nextStart, claimed.map(_.msgid))
  }

  /** G3: XGROUP DELCONSUMER — destroy a consumer; unclaimed PEL entries
    * are lost. Returns the number of lost (pending) messages. */
  def delConsumer(consumer: String): Int = synchronized {
    val owned = pel.valuesIterator.filter(_.consumer == consumer).map(_.msgid).toList
    owned.foreach(pel.remove)
    lastSeenMs.remove(consumer)
    owned.size
  }

  /** G4: XGROUP DESTROY — clears state and deregisters, so the next
    * create() starts fresh and the registry does not pin the log. */
  def destroy(): Unit = {
    synchronized { pel.clear(); lastSeenMs.clear(); lastDeliveredId = MsgId.Zero }
    ConsumerGroup.deregister(log, name)
  }

  // ---- introspection (M1 XINFO GROUPS / M2 XINFO CONSUMERS) ----

  def lastDelivered: String = synchronized(lastDeliveredId)
  def pendingCount: Int = synchronized(pel.size)
  def consumers: Seq[String] = synchronized(lastSeenMs.keys.toSeq)

  /** M2: per-consumer (name, pending, idle-ms-since-last-fetch). */
  def consumerInfo: Seq[(String, Int, Long)] = synchronized {
    val now = clock.nowMs
    lastSeenMs.toSeq.map { case (c, seen) =>
      (c, pel.valuesIterator.count(_.consumer == c), now - seen)
    }
  }

  private def touch(consumer: String): Unit = lastSeenMs(consumer) = clock.nowMs
}

object ConsumerGroup {
  private val registry = mutable.Map.empty[(StreamLog, String), ConsumerGroup]

  /** G1: idempotent group creation from stream start (`0-0`), MKSTREAM
    * implied, BUSYGROUP swallowed (reference `common.py:20-41`) —
    * repeated creation returns the existing group unchanged. Passing a
    * DIFFERENT clock for an existing group is rejected: silently keeping
    * the first clock would give the caller wall-clock idle times under a
    * manual test clock. */
  def create(log: StreamLog, name: String, clock: Clock = SystemClock): ConsumerGroup =
    registry.synchronized {
      val g = registry.getOrElseUpdate((log, name), new ConsumerGroup(log, name, clock))
      require(g.clock eq clock,
        s"consumer group '$name' already exists with a different clock")
      g
    }

  private[streaming] def deregister(log: StreamLog, name: String): Unit =
    registry.synchronized { registry.remove((log, name)); () }
}
