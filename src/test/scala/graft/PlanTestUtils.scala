package graft

import org.apache.spark.sql.execution.{ExplainMode, FileSourceScanExec, QueryExecution}

/** Shared AQE-safe plan introspection for plan-shape tests.
  *
  * With AQE on (the default), `executedPlan` is an
  * `AdaptiveSparkPlanExec` LEAF node — `collect` cannot see inside it,
  * so naive `collect { case f: FileSourceScanExec => f }` assertions
  * pass vacuously. These helpers fall back to the formatted explain
  * text, which always renders the real tree. */
object PlanTestUtils {

  /** Comma-joined required-schema field lists of every parquet scan —
    * whole ReadSchema lines in the AQE fallback (never a struct<...>
    * regex: a nested struct's inner '>' would truncate a capture). */
  def scanReadSchemas(qe: QueryExecution): Seq[String] = {
    val scans = qe.executedPlan.collect { case f: FileSourceScanExec => f }
    if (scans.nonEmpty) scans.map(_.requiredSchema.fieldNames.mkString(","))
    else formatted(qe).linesIterator.filter(_.contains("ReadSchema:")).toSeq
  }

  /** PushedFilters metadata of every parquet scan (AQE-safe). */
  def scanPushedFilters(qe: QueryExecution): Seq[String] = {
    val scans = qe.executedPlan.collect { case f: FileSourceScanExec => f }
    if (scans.nonEmpty) scans.map(_.metadata.getOrElse("PushedFilters", ""))
    else formatted(qe).linesIterator.filter(_.contains("PushedFilters:")).toSeq
  }

  /** The formatted explain text — the ONLY reliable way to assert on
    * operator presence/absence under AQE. */
  def formatted(qe: QueryExecution): String =
    qe.explainString(ExplainMode.fromString("formatted"))
}
