package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed co-location for repeated large⋈large joins — the shuffle
  * you pay once at write time instead of on every query.
  *
  * At 100 TB the dominant cost of `lineitem ⋈ orders` is shuffling both
  * sides on the join key for every query that needs the join. Writing
  * both tables bucketed (and per-bucket sorted) on that key makes the
  * join plan a zero-exchange sort-merge join: Spark matches the two
  * tables' bucket specs, schedules one task per bucket pair, and skips
  * BOTH the exchange and (with `sortBy`) the per-task sort. The
  * trade-offs, so callers size buckets deliberately:
  *
  *  - bucket counts must match (or divide) across join sides — pick one
  *    count per key domain (e.g. 1024 for orderkey-family tables) and
  *    standardize;
  *  - each bucket is read by ONE task: size buckets so a bucket of the
  *    LARGEST table fits an executor's working memory (≈ table size /
  *    buckets ≤ a few hundred MB at 100 TB ⇒ thousands of buckets);
  *  - bucket pruning applies to equality predicates on the bucket key,
  *    so point lookups touch one bucket instead of the whole table.
  *
  * Bucketed tables require the session catalog (`saveAsTable`): the
  * bucket spec lives in table metadata, not in the parquet files.
  */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted catalog table.
    * Overwrites any existing table of the same name. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      numBuckets: Int): Unit = {
    require(numBuckets > 0, s"numBuckets must be positive: $numBuckets")
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Write `df` hive-partitioned on a low-cardinality column — the
    * OTHER physical-layout lever: bucketing co-locates a high-
    * cardinality join key; directory partitioning prunes on the
    * low-cardinality predicate columns (date, source, lang). At 100 TB
    * a time-partitioned fact table turns "last quarter" queries from a
    * full scan into a listing of ~90 directories — the scan's
    * PartitionFilters, applied before any file is opened. Keep
    * partition columns coarse (directories are metadata pressure:
    * aim for thousands of partitions, never key-per-value millions). */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .partitionBy(partitionCol)
      .parquet(path)

  /** Equi-join two bucketed tables on their shared bucket key. When both
    * tables were written with [[writeBucketed]] on `key` with the same
    * bucket count, the resulting plan contains NO shuffle exchange —
    * asserted by `BucketingSpec`, so a config regression (e.g. someone
    * disabling `spark.sql.sources.bucketing.enabled`) fails loudly in
    * tests rather than silently re-shuffling 100 TB per query. */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
