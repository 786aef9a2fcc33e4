package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Event-time streaming analytics over the `events` table read as a
  * file stream: `readStream → watermark → window agg`, the Structured
  * Streaming shape of the batch `a11_hourly_events` query.
  *
  * The reference library has no event-time/watermark notion (all its
  * time is processing-time ms — SURVEY.md §2.1 "Streaming semantics");
  * this is the capability its users would gain moving to Spark: late
  * data bounded by the watermark, windows computed on event time, state
  * evicted incrementally at scale.
  */
object EventStream {

  /** One staging dir per source file, reused across calls (the file
    * streaming source requires a directory; the driver ships a single
    * parquet file — in production the source points at the ingest
    * directory directly). */
  private val stagingDirs = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def stagedDir(sfDir: String): String =
    stagingDirs.computeIfAbsent(sfDir, { _ =>
      import java.nio.file.{Files, Paths}
      val dir = Files.createTempDirectory("graft-events-stream")
      // absolute target: a relative sfDir would otherwise resolve
      // against the TEMP dir at read time — a dangling link and a
      // silently empty stream (schema is supplied, so no error)
      val link = Files.createSymbolicLink(
        dir.resolve("events.parquet"),
        Paths.get(s"$sfDir/events.parquet").toAbsolutePath)
      // deleteOnExit runs in registration-reverse order: link, then the
      // (now empty) directory — registering only the dir would leak it.
      dir.toFile.deleteOnExit()
      link.toFile.deleteOnExit()
      dir.toString
    })

  /** Streaming DataFrame of events with proper event-time column
    * (raw-schema peek + ts normalization shared with [[graft.Tables]],
    * so the stream adapts to whichever physical `ts` encoding the
    * testdata carries, same as the batch path). */
  def readEvents(spark: SparkSession, sfDir: String): DataFrame = {
    val rawSchema = graft.Tables.eventsRawSchema(spark, sfDir)
    graft.Tables.eventsFromRaw(
      spark.readStream
        .schema(rawSchema)
        .parquet(stagedDir(sfDir)))
      .drop("props")
  }

  /** Hourly tumbling-window counts with a 2-hour watermark. */
  def hourlyCounts(spark: SparkSession, sfDir: String): DataFrame =
    readEvents(spark, sfDir)
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("hour"), col("event_type"), col("n_events"))

  /** Does the plan already carry an event-time watermark? Spark
    * disallows REDEFINING a watermark downstream of a stateful
    * operator, so composable operators must reuse the one the input
    * carries instead of stacking `withWatermark` unconditionally —
    * the trap a chained `dedup → sessionize` ingest hits otherwise. */
  private def hasWatermark(df: DataFrame): Boolean =
    df.queryExecution.analyzed.exists {
      case _: org.apache.spark.sql.catalyst.plans.logical.EventTimeWatermark => true
      case _ => false
    }

  /** `df.withWatermark(...)` unless the input already carries one (the
    * output of another watermarked operator), which is then reused. */
  private def ensureWatermark(df: DataFrame, eventTimeCol: String,
      watermark: String): DataFrame =
    if (hasWatermark(df)) df else df.withWatermark(eventTimeCol, watermark)

  /** Streaming exact dedup bounded by the watermark — the streaming
    * twin of the d01 batch dedup and the first operator an at-least-once
    * ingest (this library's own delivery model, C4 redelivery) feeds
    * into. `dropDuplicatesWithinWatermark` keeps an id in state only
    * until the watermark passes it, so dedup state is bounded at 100 TB
    * — plain `dropDuplicates` on a stream grows state forever.
    *
    * Composable: an input that already carries a watermark keeps it
    * (the `watermark` argument is then ignored). */
  def dedupWithinWatermark(df: DataFrame, key: String, moreKeys: Seq[String] = Nil,
      eventTimeCol: String = "ts", watermark: String = "2 hours"): DataFrame =
    ensureWatermark(df, eventTimeCol, watermark)
      .dropDuplicatesWithinWatermark(key, moreKeys: _*)

  /** [[dedupWithinWatermark]] applied to the events file stream. */
  def dedupedEvents(spark: SparkSession, sfDir: String): DataFrame =
    dedupWithinWatermark(readEvents(spark, sfDir), "event_id")

  /** Streaming sessionization — the streaming twin of the a10 batch
    * query, via the NATIVE `session_window` aggregation: per-user
    * sessions close after `gap` of event-time inactivity, and state is
    * evicted once the watermark passes a session's end, so per-user
    * state is bounded by session length, not stream length. Sessions
    * merge across micro-batches (Spark unions overlapping windows), so
    * the result is independent of batch boundaries — the property a
    * hand-rolled `flatMapGroupsWithState` sessionizer has to prove and
    * this one gets from the engine. Emitted only on watermark close
    * (Append mode), exactly the at-least-once-friendly contract the
    * PEL delivery path feeds.
    *
    * Boundary semantics: a session's window extends to `last + gap`,
    * and Spark merges sessions whose windows TOUCH (`start ≤ end`), so
    * an event arriving EXACTLY `gap` after the previous one stays in
    * the SAME session — agreeing with the a10 batch query's split rule
    * `ts - prev > gap` at the boundary. (Round 4 documented the
    * opposite from the window extent alone; the exact-gap fixture in
    * EventStreamSpec's composed-pipeline test pins the real merge-on-
    * touch semantics by data, so a drift in either rule fails a test.)
    *
    * Composable: an input that already carries a watermark (e.g. the
    * output of [[dedupWithinWatermark]]) keeps it — stacking a second
    * `withWatermark` on a stateful operator's output is a query-time
    * error ("Redefining watermark is disallowed"). */
  def sessionize(df: DataFrame, gap: String = "30 minutes",
      watermark: String = "2 hours"): DataFrame =
    ensureWatermark(df, "ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))

  /** [[sessionize]] applied to the events file stream. */
  def sessionizedEvents(spark: SparkSession, sfDir: String): DataFrame =
    sessionize(readEvents(spark, sfDir))

  /** Stream-stream interval join — the streaming twin of the a19 as-of
    * attribution: each purchase joined to this user's clicks in the
    * preceding `horizon`. Both sides carry watermarks and the join
    * condition bounds the event-time distance, so each side's state
    * store holds only `horizon + watermark` of data — the two
    * conditions Spark REQUIRES before it will run a stream-stream
    * inner join with bounded state at all (an unbounded-interval
    * stream join never stops growing).
    *
    * Semantics differ from a19 deliberately: the batch as-of keeps only
    * the LATEST prior click (a window over the totally-ordered past —
    * meaningless mid-stream, where a later-arriving earlier click
    * would retroactively change emitted rows); the interval join emits
    * EVERY (purchase, prior click ≤ horizon) pair, which is
    * append-safe. Downstream dedup/argmax is a batch concern. */
  /** `joinType` "inner" emits attributed pairs only; "left_outer"
    * additionally emits each UNattributed purchase once (null click
    * columns) after the watermark proves no in-horizon click can still
    * arrive — the shape a conversion-rate monitor needs (attributed vs
    * organic), with the null row's emission delayed by exactly the
    * state-cleanup bound. */
  def attributionJoin(clicks: DataFrame, purchases: DataFrame,
      horizon: String = "30 minutes", watermark: String = "1 hour",
      joinType: String = "inner"): DataFrame = {
    // ensureWatermark, not withWatermark: an input that already carries
    // one (e.g. the output of dedupWithinWatermark — dedup-then-join is
    // the documented at-least-once shape) keeps it; stacking a second
    // watermark on a stateful operator's output is a query-start error.
    // The rename precedes the check so the fresh watermark lands on the
    // renamed column; a pre-existing one propagates through the alias.
    val c = ensureWatermark(
      clicks.select(col("user_id").as("c_user"),
        col("ts").as("click_ts"), col("event_id").as("click_id")),
      "click_ts", watermark)
    val p = ensureWatermark(
      purchases.select(col("user_id").as("p_user"),
        col("ts").as("purchase_ts"), col("event_id").as("purchase_id")),
      "purchase_ts", watermark)
    p.join(c,
      col("p_user") === col("c_user") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr(s"INTERVAL $horizon"),
      joinType)
      .select(col("purchase_id"), col("p_user").as("user_id"),
        col("click_id"), col("click_ts"), col("purchase_ts"))
  }

  /** Runnable demo: stream the events table through the windowed agg and
    * print the first window rows.
    * Run: `sbt "runMain graft.streaming.EventStream [sfDir]"` */
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val q = hourlyCounts(spark, sfDir)
      .writeStream.format("memory").queryName("hourly").outputMode("complete").start()
    q.processAllAvailable(); q.stop()
    val rows = spark.sql("SELECT * FROM hourly ORDER BY hour, event_type")
    println(s"windows emitted: ${rows.count()}")
    rows.show(8, truncate = false)
    spark.stop()
  }
}
