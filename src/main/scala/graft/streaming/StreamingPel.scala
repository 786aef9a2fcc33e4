package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Delivery/ack command into the streaming group state machine. */
final case class PelCommand(consumer: String, msgid: String, action: String, atMs: Long)

/** Keyed state: one consumer's slice of the group PEL. */
final case class ConsumerPelState(
    pending: Map[String, PelEntry],
    lastActivityMs: Long)

/** Emitted on every update: the consumer-state snapshot the Monitor
  * consumes (pending count + idle basis). `idle` is true when the
  * snapshot was produced by a processing-time timeout firing (M3's
  * idle-warning condition detected inside the state machine) rather
  * than by new commands. */
final case class PelSnapshot(
    consumer: String,
    pendingCount: Int,
    timesDeliveredMax: Int,
    lastActivityMs: Long,
    idle: Boolean = false)

/** Structured Streaming PEL: the reference's consumer-group state
  * (SURVEY.md §1.1 rows "Consumer group"/"PEL entry") as keyed state in
  * `flatMapGroupsWithState` — delivery inserts a PEL entry, ack removes
  * it, redelivery bumps `times_delivered`. The checkpointed offset log
  * plays `last-delivered-id`; this operator plays the per-consumer PEL.
  *
  * At scale the state is partitioned by consumer across executors and
  * incrementally checkpointed by the state store — no global state, no
  * driver bottleneck.
  */
object StreamingPel {

  def updateState(
      consumer: String,
      commands: Iterator[PelCommand],
      state: GroupState[ConsumerPelState]): Iterator[PelSnapshot] =
    updateStateWithIdle(0L)(consumer, commands, state)

  /** As [[updateState]], but with M3 idle detection inside the state
    * machine: when `idleTimeoutMs > 0`, a processing-time timeout is
    * armed after every update; if it fires (no commands for that
    * consumer within the window), an `idle = true` snapshot is emitted —
    * the streaming form of the monitor's idle-warning
    * (reference `monitor.py:85-91`, idle branch). */
  def updateStateWithIdle(idleTimeoutMs: Long)(
      consumer: String,
      commands: Iterator[PelCommand],
      state: GroupState[ConsumerPelState]): Iterator[PelSnapshot] = {
    var st = state.getOption.getOrElse(ConsumerPelState(Map.empty, 0L))
    if (state.hasTimedOut) {
      // Emit the idle warning ONCE and do not re-arm: re-arming here
      // would make the engine schedule timeout batches forever (and
      // processAllAvailable would never quiesce). The next real command
      // for this consumer re-arms the timer below.
      //
      // A consumer that went idle with NOTHING pending is DONE — drop
      // its state entirely. Without the remove, every consumer key ever
      // seen (the library's own default ids are pid+thread — high churn)
      // is checkpointed forever: linear state growth with consumer
      // churn. A reappearing consumer starts fresh, which is exactly
      // how Redis treats a consumer recreated after DELCONSUMER.
      val timesMax =
        if (st.pending.isEmpty) 0 else st.pending.valuesIterator.map(_.timesDelivered).max
      if (st.pending.isEmpty) state.remove()
      return Iterator.single(
        PelSnapshot(consumer, st.pending.size, timesMax, st.lastActivityMs, idle = true))
    }
    // Sort key carries an action rank so a deliver and its ack landing
    // in one micro-batch with the SAME ms timestamp apply in causal
    // order (deliver, then ack). Without it the post-shuffle arrival
    // order decided: ack-before-deliver removed nothing and then
    // re-inserted the entry — wedged pending forever, no ack coming.
    commands.toSeq
      .sortBy(c => (c.atMs, c.msgid, if (c.action == "deliver") 0 else 1))
      .foreach { c =>
      c.action match {
        case "deliver" =>
          val times = st.pending.get(c.msgid).map(_.timesDelivered + 1).getOrElse(1)
          st = ConsumerPelState(
            st.pending + (c.msgid -> PelEntry(c.msgid, consumer, c.atMs, times)),
            math.max(st.lastActivityMs, c.atMs))
        case "ack" =>
          st = ConsumerPelState(st.pending - c.msgid, math.max(st.lastActivityMs, c.atMs))
        case other =>
          throw new IllegalArgumentException(s"unknown PEL action: $other")
      }
    }
    state.update(st)
    if (idleTimeoutMs > 0) state.setTimeoutDuration(idleTimeoutMs)
    val timesMax = if (st.pending.isEmpty) 0 else st.pending.valuesIterator.map(_.timesDelivered).max
    Iterator.single(PelSnapshot(consumer, st.pending.size, timesMax, st.lastActivityMs))
  }

  /** Attach the state machine to a (streaming or batch) command Dataset;
    * emits one [[PelSnapshot]] per touched consumer per micro-batch.
    * With `idleTimeoutMs > 0`, consumers that go quiet additionally emit
    * idle-flagged snapshots via processing-time timeouts. */
  def attach(
      spark: SparkSession,
      commands: Dataset[PelCommand],
      idleTimeoutMs: Long = 0L): Dataset[PelSnapshot] = {
    import spark.implicits._
    val timeout =
      if (idleTimeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    commands
      .groupByKey(_.consumer)
      .flatMapGroupsWithState(OutputMode.Update, timeout)(updateStateWithIdle(idleTimeoutMs))
  }

  /** Batch-mode M1-style rollup over the latest snapshots. */
  def groupSummary(snapshots: Dataset[PelSnapshot]): DataFrame = {
    import org.apache.spark.sql.functions._
    snapshots.groupBy()
      .agg(count(lit(1)).as("consumers"),
        sum(col("pendingCount")).as("pending"),
        max(col("lastActivityMs")).as("last_activity_ms"))
  }
}
