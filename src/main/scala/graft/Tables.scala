package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All analytics queries read through here so the scan path is uniform:
  * plain `spark.read.parquet` — Catalyst handles column pruning and
  * predicate pushdown into the parquet scan. At cluster scale the same
  * call reads a partitioned table; nothing here assumes a single file.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") readEvents(spark, sfDir)
    else spark.read.parquet(s"$sfDir/$name.parquet")

  /** Raw parquet schema of `events` with ts as nanos LONG (the
    * legacy-long read mode; also used by the streaming reader). */
  val eventsRawSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", LongType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("props", StringType)))
  }

  /** Convert a raw events frame (ts = nanos LONG) to the typed shape.
    * The driver data carries no sub-microsecond part (verified:
    * epoch_ns % 1000 == 0 everywhere), so the ns→µs truncation is exact
    * and matches DuckDB's own nanosecond-parquet read. */
  def eventsFromRaw(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    raw.select(
      col("event_id"),
      expr("timestamp_micros(ts div 1000)").as("ts"),
      col("user_id"), col("event_type"), col("value"), col("props"))
  }

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark cannot read
    * natively: enable the legacy nanos-as-long mode (session-wide — the
    * only way Spark exposes it; other tables here carry µs timestamps
    * and are unaffected) and convert. */
  private def readEvents(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    eventsFromRaw(spark.read.parquet(s"$sfDir/events.parquet"))
  }

  def region(s: SparkSession, d: String): DataFrame    = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = apply(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame    = apply(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
