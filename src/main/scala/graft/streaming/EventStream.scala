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

  /** Raw parquet schema (ts read as nanos LONG — see Tables.readEvents). */
  private val rawSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Streaming DataFrame of events with proper event-time column.
    *
    * The file streaming source requires a directory; the driver ships a
    * single parquet file, so stage a symlink into a temp dir (in
    * production the source points at the ingest directory directly). */
  def readEvents(spark: SparkSession, sfDir: String): DataFrame = {
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("graft-events-stream")
    Files.createSymbolicLink(
      dir.resolve("events.parquet"), Paths.get(s"$sfDir/events.parquet"))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream
      .schema(rawSchema)
      .parquet(dir.toString)
      .select(
        col("event_id"),
        expr("timestamp_micros(ts div 1000)").as("ts"),
        col("user_id"), col("event_type"), col("value"))
  }

  /** Hourly tumbling-window counts with a 2-hour watermark. */
  def hourlyCounts(spark: SparkSession, sfDir: String): DataFrame =
    readEvents(spark, sfDir)
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("hour"), col("event_type"), col("n_events"))

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
