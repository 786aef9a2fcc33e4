package graft

import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are contributed by family registries:
  *  - [[graft.queries.ProtocolQueries]]  — Redis-protocol twins (SURVEY §2 P/C/G/M/S)
  *  - [[graft.queries.AnalyticsQueries]] — relational analytics (joins/aggs/windows)
  *  - [[graft.queries.DedupQueries]]     — exact + MinHash/SimHash/Jaccard dedup
  *  - [[graft.queries.TextQueries]]      — text quality / tokens / fingerprints
  *  - [[graft.queries.SimilarityQueries]]— embedding ANN (brute force + pruned)
  */
object SparkEntry {

  private lazy val all: Seq[(String, QueryDef)] =
    ProtocolQueries.defs ++ AnalyticsQueries.defs ++ DedupQueries.defs ++
      TextQueries.defs ++ SimilarityQueries.defs ++ MultimodalQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ProtocolQueries.monitorReport(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (name, q) => name -> q.build }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.collect { case (name, q) if q.oracle.isDefined => name -> q.oracle.get }.toMap
}
