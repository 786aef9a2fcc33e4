package graft.streaming

import scala.collection.mutable

/** Consumer-group health monitor: classification, sweep, failure
  * rebalance, report rendering — reference `monitor.py` (M1-M7, R1).
  */
final class Monitor(
    groups: Seq[ConsumerGroup],
    batchSize: Int = 2,               // pending-warn threshold, monitor.py:53-54
    idleTimeThresholdMs: Long = 30000L, // idle-warn threshold, monitor.py:55
    minWaitTimeMs: Long = 0L) {       // XCLAIM min-idle guard, monitor.py:65-68

  private val metrics = mutable.ArrayBuffer.empty[ConsumerMetrics]
  private val unhealthy = mutable.Map.empty[ConsumerGroup, List[String]]
  private val targets = mutable.Map.empty[ConsumerGroup, (String, Int)]

  /** M3: pure health classification — pending-warning wins over
    * idle-warning (reference `monitor.py:85-91`). */
  def statusByMetrics(pending: Int, idleMs: Long): String =
    Monitor.statusByMetrics(pending, idleMs, batchSize, idleTimeThresholdMs)

  /** M4: the monitoring sweep — classify every consumer of every group
    * with consumers > 0, remember unhealthy ones, and pick PER GROUP the
    * healthy consumer with minimum pending as reassignment target (the
    * clean argmin; the reference's first-healthy seeding quirk at
    * `monitor.py:163-164` is documented in SURVEY §7.3 as a deviation —
    * a single cross-group target would leave other groups uncleaned).
    * With `autoCleanup`, rebalances failures before returning. */
  def collectMonitoringData(autoCleanup: Boolean = true): Seq[ConsumerMetrics] = {
    metrics.clear(); unhealthy.clear(); targets.clear()
    groups.filter(_.consumers.nonEmpty).foreach { g =>
      g.consumerInfo.foreach { case (cid, pending, idleMs) =>
        val status = statusByMetrics(pending, idleMs)
        metrics += ConsumerMetrics(cid, pending, idleMs, status)
        if (status == ConsumerStatus.Ok) {
          if (targets.get(g).forall { case (_, p) => pending < p }) targets(g) = (cid, pending)
        } else {
          unhealthy(g) = cid :: unhealthy.getOrElse(g, Nil)
        }
      }
    }
    if (autoCleanup) cleanup()
    metrics.toSeq
  }

  /** Outcome of the last [[cleanup]] pass: (deadConsumer, claimed,
    * lost) per rebalanced consumer. `lost > 0` is the reference's
    * logged-error condition (`monitor.py:125-127`) — this library has
    * no logging dependency, so the loss is surfaced as DATA instead of
    * silently discarded: operators read it here or from cleanup()'s
    * return value. */
  private var lastCleanupResults: Seq[(String, Int, Int)] = Nil
  def lastCleanup: Seq[(String, Int, Int)] = lastCleanupResults

  /** M5 driver loop (reference `monitor.py:186-193`); returns one
    * (deadConsumer, claimed, lost) row per rebalanced consumer. */
  def cleanup(): Seq[(String, Int, Int)] = {
    val results = for {
      (g, consumers) <- unhealthy.toSeq
      (tc, _) <- targets.get(g).toSeq
      dead <- consumers.reverse
    } yield {
      val (claimed, lost) = cleanupUnhealthyConsumer(g, dead, tc)
      (dead, claimed, lost)
    }
    lastCleanupResults = results
    results
  }

  /** M5: failure rebalance — list the dead consumer's PEL (G2), claim
    * for the target (M6), then delete the consumer (G3); lost>0 is the
    * reference's logged-error condition (`monitor.py:93-127`). Returns
    * (claimed, lost). */
  def cleanupUnhealthyConsumer(
      g: ConsumerGroup, dead: String, targetConsumer: String): (Int, Int) = {
    val ids = g.pendingOf(dead).map(_.msgid)
    val claimed = g.claim(ids, targetConsumer, minWaitTimeMs)        // M6
    val lost = g.delConsumer(dead)                                   // G3
    (claimed.size, lost)
  }

  /** R1: grid-style report (reference `monitor.py:195-209`). */
  def renderTable(): String = Monitor.renderTable(metrics.toSeq)

  def printMonitoringData(out: Appendable = System.out): Unit = {
    out.append(renderTable()).append("\n")
    ()
  }
}

/** The M3 classification table and R1 rendering as pure functions —
  * ONE definition shared by the engine-side [[Monitor]] and the
  * wire-speaking [[WireMonitor]], so the two roles can never disagree
  * on what "unhealthy" means or how the report reads. */
object Monitor {
  /** M3 (reference `monitor.py:85-91`): pending-warning wins. */
  def statusByMetrics(pending: Int, idleMs: Long,
      batchSize: Int, idleTimeThresholdMs: Long): String =
    if (pending > batchSize) ConsumerStatus.PendingWarn
    else if (idleMs > idleTimeThresholdMs) ConsumerStatus.IdleWarn
    else ConsumerStatus.Ok

  /** R1 (reference `monitor.py:195-209`). */
  def renderTable(metrics: Seq[ConsumerMetrics]): String = {
    val header = Seq("Consumer id", "Idle time", "Pending items", "Status")
    val rows = metrics.map(m =>
      Seq(m.consumerId, m.idleTimeMs.toString, m.pendingItems.toString, m.status))
    val widths = (header +: rows).transpose.map(_.map(_.length).max)
    def line(cells: Seq[String]) =
      cells.zip(widths).map { case (c, w) => c.padTo(w, ' ') }.mkString("| ", " | ", " |")
    val sep = widths.map("-" * _).mkString("+-", "-+-", "-+")
    (Seq(sep, line(header), sep) ++ rows.map(line) :+ sep).mkString("\n")
  }
}
