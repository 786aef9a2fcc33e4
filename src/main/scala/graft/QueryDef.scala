package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-facing operator query.
  *
  * @param build  Spark-side implementation; `sfDir` points at a testdata
  *               scale-factor directory (TESTDATA.md).
  * @param oracle equivalent ANSI SQL for DuckDB over the same tables, or
  *               None for ops the driver checks rows-only (e.g. approx
  *               sketches, multimodal stubs).
  * @param doc    one-line description (SURVEY.md §2 operator ids).
  */
final case class QueryDef(
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "")
