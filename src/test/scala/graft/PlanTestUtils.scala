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

  /** The `Input [...]` attribute line of every Exchange node in the
    * formatted detail section (initial-plan duplicate cut off). The
    * tree header (`+- Exchange (15)`) never carries attributes — the
    * detail block `"(15) Exchange"` is followed by its
    * `Input [n]: [attr#id, ...]` line, which is where column-level
    * assertions about what a shuffle carries must look. */
  /** Index of the OUTER plan's initial-plan marker, or -1. The outer
    * marker sits at column 0 (`== Initial Plan ==`, or `+- == Initial
    * Plan ==` when the root AdaptiveSparkPlan is executed); a
    * memoized/persisted subplan embeds its own cached AdaptiveSparkPlan
    * whose markers are always INDENTED inside the outer tree, BEFORE
    * the outer detail blocks — a substring cut at one of those throws
    * away every outer Exchange detail (how the t18 plan test went
    * vacuous once QueriesSpec had populated the t18_c2 memo), while
    * missing the `+- ` form double-counts the outer initial plan (the
    * d09 bucketing regression of the first fix attempt). */
  private def outerInitialPlanCut(lines: Vector[String]): Int =
    lines.indexWhere(_.matches("""(\+\- )?== Initial Plan ==\s*"""))

  def exchangeInputs(qe: QueryExecution): Seq[String] = {
    val all = formatted(qe).linesIterator.toVector
    val cut = outerInitialPlanCut(all)
    val lines = if (cut >= 0) all.take(cut) else all
    lines.zipWithIndex.collect {
      case (l, i) if l.matches("""\(\d+\) Exchange\s*""") =>
        lines.drop(i + 1).take(4).find(_.trim.startsWith("Input"))
          .getOrElse(sys.error(s"no Input line after detail block '$l'"))
    }
  }

  /** [[exchangeInputs]] minus explicit caller repartitions
    * (`REPARTITION_BY_NUM` / `REPARTITION_BY_COL` shuffle origins).
    * The no-text-in-shuffles assertions guard the UNBOUNDED case — a
    * data-dependent exchange (join/aggregate/window) whose volume
    * grows with the corpus. `Tables.parallelScan`'s parallelism-floor
    * repartition is the one deliberate exception: it fires only when
    * the source scan has fewer splits than the session has cores, so
    * the bytes it can ever move are bounded by cores ×
    * `spark.sql.files.maxPartitionBytes` — by construction it is gone
    * at production scale, where these assertions matter. */
  def dataExchangeInputs(qe: QueryExecution): Seq[String] = {
    val all = formatted(qe).linesIterator.toVector
    val cut = outerInitialPlanCut(all)
    val lines = if (cut >= 0) all.take(cut) else all
    lines.zipWithIndex.collect {
      case (l, i) if l.matches("""\(\d+\) Exchange\s*""") =>
        val block = lines.drop(i + 1).take(4)
        val input = block.find(_.trim.startsWith("Input"))
          .getOrElse(sys.error(s"no Input line after detail block '$l'"))
        val args = block.find(_.trim.startsWith("Arguments")).getOrElse("")
        (input, args)
    }.collect { case (input, args) if !args.contains("REPARTITION_BY_") => input }
  }

  /** Count of shuffle exchanges in the FINAL adaptive plan tree.
    *
    * Two rendering traps this helper absorbs: formatted mode prints the
    * node header (`Exchange (5)`) and its `Arguments: hashpartitioning`
    * on separate lines, so substring checks like
    * `contains("Exchange hashpartitioning")` are vacuously false; and
    * with AQE the text also renders the `== Initial Plan ==`, whose
    * exchanges may have been optimized away — counting the whole text
    * double-counts. Cuts at the initial-plan marker and counts tree
    * node headers, excluding reuse (`ReusedExchange` reads an existing
    * shuffle; it does not move data again). */
  def finalPlanExchanges(qe: QueryExecution): Int = {
    val all = formatted(qe).linesIterator.toVector
    val cut = outerInitialPlanCut(all)
    val finalTree = (if (cut >= 0) all.take(cut) else all).mkString("\n")
    "(?<!Reused)Exchange \\(\\d+\\)".r.findAllIn(finalTree).size
  }
}
