package graft.queries

import graft.{Portable => P, QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Batch twins of the reference's stream-protocol operators
  * (SURVEY.md §2: P*, C*, G*, M*, S* rows), expressed over the
  * `events` table: `user_id % 8` plays the consumer assignment,
  * `event_id % 3 == 0` plays the still-pending (delivered, unacked)
  * flag, and `max(ts)` plays "now".
  *
  * Semantics preserved from the reference:
  *  - M3 health classification: pending-warning wins over idle-warning
  *    (`monitor.py:85-91`), with the exact status strings.
  *  - M4 target selection: healthy consumer with min pending, the clean
  *    argmin (reference seeding quirk at `monitor.py:163-164` documented
  *    in SURVEY §7.3 as a deviation).
  *  - S1 backlog: exclusive `>` count, reproducing the *intended* value
  *    of the reference's off-by-one interval scan (`scaler.py:56-62`).
  *  - S2 rate: `round(clamp(backlog/pending*100, 1, 100), 4)`, 0 when
  *    pending is 0 (`scaler.py:74-83`).
  *  - S3 decision table evaluated in reference order (`scaler.py:85-97`).
  */
object ProtocolQueries {

  private val NumConsumers = 8
  private val BatchSize    = 100L      // C1 bucketing quota
  private val PendingMod   = 3         // event_id % 3 == 0 → pending
  private val DeadConsumer = 5L        // M5 rebalance scenario
  private val MaxDeliveries = 4L       // DLQ delivery budget (p14)

  val StatusOk          = "OK"
  val StatusPendingWarn = "WARNING - too many pending items"
  val StatusIdleWarn    = "WARNING - idle for long time"

  private def events(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)

  private def consumer: org.apache.spark.sql.Column = col("user_id") % NumConsumers
  private def isPending: org.apache.spark.sql.Column = col("event_id") % PendingMod === 0

  /** Per-consumer state snapshot with M3 classification. Thresholds are
    * data-adaptive (1.05× mean pending, 1.2× mean idle) so every scale
    * factor exercises all three statuses. */
  def monitorBase(s: SparkSession, dir: String): DataFrame = {
    // ONE scan of events: aggregate to per-consumer rows, then derive
    // "now" and the fleet-wide thresholds with window functions over the
    // POST-aggregation rows. The unpartitioned window only ever sees
    // #consumers rows (tiny — the reduction already happened); computing
    // the thresholds as separate scalar aggregates instead would make
    // Catalyst re-plan the events aggregation per reference, scanning
    // the 100 TB fact table multiple times.
    val per = events(s, dir)
      .groupBy(consumer.as("consumer_id"))
      .agg(
        max(col("ts")).as("last_seen"),
        sum(when(isPending, 1L).otherwise(0L)).as("pending_items"))
    val wAll = Window.partitionBy(lit(1))
    per
      // every event belongs to a consumer, so max(last_seen) == max(ts)
      .withColumn("now", max(col("last_seen")).over(wAll))
      .withColumn("idle_ms", P.epochMs(col("now")) - P.epochMs(col("last_seen")))
      .withColumn("pend_thr", avg(col("pending_items")).over(wAll) * 1.05)
      .withColumn("idle_thr", avg(col("idle_ms")).over(wAll) * 1.2)
      .withColumn("status",
        when(col("pending_items") > col("pend_thr"), StatusPendingWarn)
          .when(col("idle_ms") > col("idle_thr"), StatusIdleWarn)
          .otherwise(StatusOk))
  }

  /** Shared DuckDB CTE mirroring [[monitorBase]]. */
  private val monitorCte = s"""
    WITH per AS (
      SELECT user_id % $NumConsumers AS consumer_id, MAX(ts) AS last_seen,
             CAST(SUM(CASE WHEN event_id % $PendingMod = 0 THEN 1 ELSE 0 END) AS BIGINT) AS pending_items
      FROM events GROUP BY 1),
    now_t AS (SELECT MAX(ts) AS now FROM events),
    base AS (
      SELECT consumer_id, pending_items,
             epoch_ms(now) - epoch_ms(last_seen) AS idle_ms
      FROM per, now_t),
    rep AS (
      SELECT consumer_id, pending_items, idle_ms,
        CASE WHEN pending_items > AVG(pending_items) OVER () * 1.05 THEN '$StatusPendingWarn'
             WHEN idle_ms > AVG(idle_ms) OVER () * 1.2 THEN '$StatusIdleWarn'
             ELSE '$StatusOk' END AS status
      FROM base)"""

  /** M1-M4 + R1: the monitoring sweep report (flagship/entry query). */
  def monitorReport(s: SparkSession, dir: String): DataFrame =
    monitorBase(s, dir)
      .select(col("consumer_id"), col("pending_items"), col("idle_ms"), col("status"))
      .orderBy(col("consumer_id"))

  /** C1: count-OR-time batch collection — positional bucketing of each
    * consumer's delivery sequence into batches of `BatchSize`. */
  private def batchBuckets(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("consumer_id")).orderBy(col("ts"), col("event_id"))
    events(s, dir)
      .withColumn("consumer_id", consumer)
      .withColumn("rn", row_number().over(w))
      .withColumn("batch_id", floor((col("rn") - 1) / lit(BatchSize.toDouble)).cast(LongType))
      .groupBy(col("consumer_id"), col("batch_id"))
      .agg(count(lit(1)).as("n_items"),
        min(col("event_id")).as("first_event"),
        max(col("event_id")).as("last_event"))
      .orderBy(col("consumer_id"), col("batch_id"))
  }

  /** S1: backlog = messages newer than the group cursor (exclusive >).
    *
    * Deliberate two-scan shape (here and p04/p11): the per-row filter
    * depends on the global max(ts), so an exact single-scan plan would
    * need a window over the UN-aggregated events — a single-partition
    * sort at 100 TB. The broadcast scalar costs one extra scan pruned
    * to the single `ts` column (parquet footer-stat territory), which
    * is the shape that survives scale; p01/p09 fold the scan only
    * because their windows run over post-aggregation rows. */
  private def backlog(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir)
    val now = e.agg(max(col("ts")).as("now"))
    e.crossJoin(broadcast(now))
      .filter(col("ts") > col("now") - expr("INTERVAL 7 DAYS"))
      .agg(count(lit(1)).as("backlog"))
  }

  /** S2+S3+S5: utilization rate and scale decision per group
    * (event_type plays the consumer-group name). */
  private def utilizationScale(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir)
    val now = e.agg(max(col("ts")).as("now"))
    val g = e.crossJoin(broadcast(now))
      .groupBy(col("event_type"))
      .agg(
        sum(when(col("ts") > col("now") - expr("INTERVAL 7 DAYS"), 1L).otherwise(0L)).as("backlog"),
        sum(when(isPending, 1L).otherwise(0L)).as("pending"),
        countDistinct(consumer).as("n_consumers"))
    // S2 quirk preserved: rate stays 0 unless BOTH backlog and pending
    // are nonzero (reference scaler.py:74-83 `all([...])` guard).
    val rawRate = col("backlog").cast(DoubleType) / col("pending") * 100.0
    g.withColumn("rate",
        when(col("pending") === 0 || col("backlog") === 0, 0.0)
          .otherwise(round(least(greatest(rawRate, lit(1.0)), lit(100.0)), 4)))
      .withColumn("decision",
        when(col("rate") === 0.0 && col("backlog") === 0, "NO_SCALE")
          .when(col("rate") === 0.0 && col("backlog") >= 1, "OUT")
          .when(col("rate") < 10.0 && col("n_consumers") > 1, "IN")
          .when(col("rate") >= 50.0, "OUT")
          .otherwise("NO_SCALE"))
      .orderBy(col("event_type"))
  }

  /** M4: reassignment target = healthy consumer with min pending. */
  private def rebalanceTarget(s: SparkSession, dir: String): DataFrame =
    monitorBase(s, dir)
      .filter(col("status") === StatusOk)
      .orderBy(col("pending_items"), col("consumer_id"))
      .select(col("consumer_id"), col("pending_items"))
      .limit(1)

  /** G2: XPENDING_RANGE — one consumer's PEL slice in id order. */
  private def pendingScan(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .filter(consumer === 3 && isPending)
      .select(col("event_id"), col("ts"), col("user_id"),
        (lit(1L) + col("event_id") % 2).as("times_delivered"))
      .orderBy(col("ts"), col("event_id"))
      .limit(100)

  /** P2: MAXLEN retention — keep the newest 100 messages. */
  private def retentionTopk(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .select(col("event_id"), col("ts"), col("event_type"))
      .orderBy(col("ts").desc, col("event_id").desc)
      .limit(100)

  /** C7: pending = delivered ∖ acked via left-anti join. */
  private def ackAntiJoin(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir)
    val acked = e.filter(col("event_id") % PendingMod =!= 0).select(col("event_id").as("acked_id"))
    e.join(acked, col("event_id") === col("acked_id"), "left_anti")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("pending"))
      .orderBy(col("event_type"))
  }

  /** M5+M6: claim the dead consumer's sufficiently-idle pending items for
    * the M4 target (ownership-update projection).
    *
    * "now" rides along in the broadcast target row — [[monitorBase]]
    * already derives it from its post-aggregation window, so the claim
    * filter needs no third `events` scan for a separate max(ts). */
  private def claimReassign(s: SparkSession, dir: String): DataFrame = {
    val target = monitorBase(s, dir)
      .filter(col("status") === StatusOk && col("consumer_id") =!= DeadConsumer)
      .orderBy(col("pending_items"), col("consumer_id"))
      .limit(1)
      .select(col("consumer_id").as("new_consumer"), col("now"))
    events(s, dir)
      .filter(consumer === DeadConsumer && isPending)
      .crossJoin(broadcast(target))
      .filter(col("ts") <= col("now") - expr("INTERVAL 1 HOUR"))
      .select(col("event_id"), lit(DeadConsumer).as("old_consumer"), col("new_consumer"))
      .orderBy(col("event_id"))
  }

  /** G3: DELCONSUMER — how many pending messages die with the consumer. */
  private def delconsumerLost(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .filter(consumer === DeadConsumer && isPending)
      .agg(count(lit(1)).as("lost"))

  /** C2: XREADGROUP '>' — next 50 undelivered messages in id order. */
  private def deliveryOrder(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir)
    val now = e.agg(max(col("ts")).as("now"))
    e.crossJoin(broadcast(now))
      .filter(col("ts") > col("now") - expr("INTERVAL 7 DAYS"))
      .select(col("event_id"), col("ts"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
      .limit(50)
  }

  /** C5: per-consumer pending counts. */
  private def consumerPendingCounts(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .filter(isPending)
      .groupBy(consumer.as("consumer_id"))
      .agg(count(lit(1)).as("pending"))
      .orderBy(col("consumer_id"))

  /** DLQ: dead-letter manifest — the batch twin of
    * [[graft.streaming.DeadLetterRouter]]. `times_delivered` is
    * synthesized as `1 + (event_id % 7) % 4` ∈ [1,4] (p06 uses its own
    * 1 + id%2 stand-in, which never crosses a realistic budget); the
    * routing rule is the router's: pending AND budget exhausted. One
    * scan, filter fully pushed down, no shuffle but the output sort. */
  private def deadLetterManifest(s: SparkSession, dir: String): DataFrame = {
    val times = lit(1L) + (col("event_id") % 7) % 4
    events(s, dir)
      .filter(isPending && times >= MaxDeliveries)
      .select(col("event_id"), consumer.as("consumer_id"),
        times.as("times_delivered"), lit("max-deliveries").as("reason"))
      .orderBy(col("event_id"))
  }

  /** M3: classification histogram over the consumer fleet. */
  private def statusHistogram(s: SparkSession, dir: String): DataFrame =
    monitorBase(s, dir)
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n_consumers"))
      .orderBy(col("status"))

  val defs: Seq[(String, QueryDef)] = Seq(
    "p01_monitor_report" -> QueryDef(monitorReport, Some(s"""$monitorCte
      SELECT consumer_id, pending_items, idle_ms, status FROM rep ORDER BY consumer_id"""),
      "M1-M4+R1 monitoring sweep"),

    "p02_batch_buckets" -> QueryDef(batchBuckets, Some(s"""
      WITH t AS (
        SELECT user_id % $NumConsumers AS consumer_id, event_id,
               ROW_NUMBER() OVER (PARTITION BY user_id % $NumConsumers ORDER BY ts, event_id) AS rn
        FROM events)
      SELECT consumer_id, CAST(FLOOR((rn - 1) / $BatchSize.0) AS BIGINT) AS batch_id,
             COUNT(*) AS n_items, MIN(event_id) AS first_event, MAX(event_id) AS last_event
      FROM t GROUP BY 1, 2 ORDER BY 1, 2"""),
      "C1 count-quota batch bucketing"),

    "p03_backlog" -> QueryDef(backlog, Some("""
      SELECT COUNT(*) AS backlog
      FROM events, (SELECT MAX(ts) AS now FROM events) t
      WHERE ts > now - INTERVAL 7 DAY"""),
      "S1 backlog measurement"),

    "p04_utilization_scale" -> QueryDef(utilizationScale, Some(s"""
      WITH g AS (
        SELECT event_type,
          CAST(SUM(CASE WHEN ts > now - INTERVAL 7 DAY THEN 1 ELSE 0 END) AS BIGINT) AS backlog,
          CAST(SUM(CASE WHEN event_id % $PendingMod = 0 THEN 1 ELSE 0 END) AS BIGINT) AS pending,
          COUNT(DISTINCT user_id % $NumConsumers) AS n_consumers
        FROM events, (SELECT MAX(ts) AS now FROM events) t GROUP BY event_type),
      r AS (
        SELECT *, CASE WHEN pending = 0 OR backlog = 0 THEN 0.0
                       ELSE ROUND(LEAST(GREATEST(CAST(backlog AS DOUBLE) / pending * 100.0, 1.0), 100.0), 4)
                  END AS rate
        FROM g)
      SELECT event_type, backlog, pending, n_consumers, rate,
        CASE WHEN rate = 0.0 AND backlog = 0 THEN 'NO_SCALE'
             WHEN rate = 0.0 AND backlog >= 1 THEN 'OUT'
             WHEN rate < 10.0 AND n_consumers > 1 THEN 'IN'
             WHEN rate >= 50.0 THEN 'OUT'
             ELSE 'NO_SCALE' END AS decision
      FROM r ORDER BY event_type"""),
      "S2/S3/S5 utilization + scale decision"),

    "p05_rebalance_target" -> QueryDef(rebalanceTarget, Some(s"""$monitorCte
      SELECT consumer_id, pending_items FROM rep WHERE status = '$StatusOk'
      ORDER BY pending_items, consumer_id LIMIT 1"""),
      "M4 argmin reassignment target"),

    "p06_pending_scan" -> QueryDef(pendingScan, Some(s"""
      SELECT event_id, ts, user_id, 1 + event_id % 2 AS times_delivered
      FROM events WHERE user_id % $NumConsumers = 3 AND event_id % $PendingMod = 0
      ORDER BY ts, event_id LIMIT 100"""),
      "G2 XPENDING_RANGE scan"),

    "p07_retention_topk" -> QueryDef(retentionTopk, Some("""
      SELECT event_id, ts, event_type FROM events
      ORDER BY ts DESC, event_id DESC LIMIT 100"""),
      "P2 MAXLEN retention (newest-k)"),

    "p08_ack_antijoin" -> QueryDef(ackAntiJoin, Some(s"""
      SELECT event_type, COUNT(*) AS pending FROM events e
      WHERE NOT EXISTS (
        SELECT 1 FROM events a WHERE a.event_id % $PendingMod <> 0 AND a.event_id = e.event_id)
      GROUP BY event_type ORDER BY event_type"""),
      "C7 ack anti-join (pending = delivered minus acked)"),

    "p09_claim_reassign" -> QueryDef(claimReassign, Some(s"""$monitorCte,
      tgt AS (
        SELECT consumer_id AS new_consumer FROM rep
        WHERE status = '$StatusOk' AND consumer_id <> $DeadConsumer
        ORDER BY pending_items, consumer_id LIMIT 1)
      SELECT event_id, CAST($DeadConsumer AS BIGINT) AS old_consumer, new_consumer
      FROM events, now_t, tgt
      WHERE user_id % $NumConsumers = $DeadConsumer AND event_id % $PendingMod = 0
        AND ts <= now - INTERVAL 1 HOUR
      ORDER BY event_id"""),
      "M5/M6 XCLAIM rebalance projection"),

    "p10_delconsumer_lost" -> QueryDef(delconsumerLost, Some(s"""
      SELECT COUNT(*) AS lost FROM events
      WHERE user_id % $NumConsumers = $DeadConsumer AND event_id % $PendingMod = 0"""),
      "G3 DELCONSUMER lost-message count"),

    "p11_delivery_order" -> QueryDef(deliveryOrder, Some("""
      SELECT event_id, ts, event_type
      FROM events, (SELECT MAX(ts) AS now FROM events) t
      WHERE ts > now - INTERVAL 7 DAY ORDER BY ts, event_id LIMIT 50"""),
      "C2 XREADGROUP delivery order"),

    "p12_consumer_pending_counts" -> QueryDef(consumerPendingCounts, Some(s"""
      SELECT user_id % $NumConsumers AS consumer_id, COUNT(*) AS pending
      FROM events WHERE event_id % $PendingMod = 0
      GROUP BY 1 ORDER BY 1"""),
      "C5 per-consumer pending counts"),

    "p13_status_histogram" -> QueryDef(statusHistogram, Some(s"""$monitorCte
      SELECT status, COUNT(*) AS n_consumers FROM rep GROUP BY status ORDER BY status"""),
      "M3 classification histogram"),

    "p14_dead_letter_manifest" -> QueryDef(deadLetterManifest, Some(s"""
      SELECT event_id, user_id % $NumConsumers AS consumer_id,
             1 + (event_id % 7) % 4 AS times_delivered,
             'max-deliveries' AS reason
      FROM events
      WHERE event_id % $PendingMod = 0 AND 1 + (event_id % 7) % 4 >= $MaxDeliveries
      ORDER BY event_id"""),
      "DLQ dead-letter routing manifest"))
}
