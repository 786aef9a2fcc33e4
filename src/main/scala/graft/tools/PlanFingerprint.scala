package graft.tools

import java.security.MessageDigest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

/** Stable fingerprint of a query's FINAL physical plan, for drift
  * detection from bench artifacts alone.
  *
  * Per-query times in `BENCH_r*.json` expose environmental contention
  * (round 4/5 adjudications), but a broadcast→shuffle flip, a lost
  * pushdown, or an AQE decision change can hide inside an unchanged
  * median. Emitting `md5(normalized formatted plan)` alongside the
  * times lets a later round diff plans across artifacts without
  * re-running anything: same fingerprint ⇒ same plan shape.
  *
  * Normalization strips the volatile, run-specific tokens so the SAME
  * logical plan always hashes identically:
  *  - expression ids (`#123`) — a global counter, different every
  *    analysis;
  *  - `plan_id=` tags and formatted-mode node numbers (`(12)`);
  *  - `Statistics(...)` on adaptive query stages — runtime byte/row
  *    counts that vary with shuffle compression, not plan shape;
  *  - `file:` paths — so fingerprints compare across sf directories;
  *  - JVM lambda identities (`$$Lambda$2605/0x00007f...@643f8ebe`) in
  *    typed-operator arguments (MapPartitions, SerializeFromObject) —
  *    the counter, the hidden-class address, and the object hash all
  *    differ every JVM launch while naming the same closure (this made
  *    m01/m02/m05 fingerprints unstable run-to-run, r8);
  *  - the CACHED-PLAN BODY nested under every `InMemoryRelation` —
  *    the cached build runs under its own AQE, whose join-side /
  *    shuffle-read decisions depend on RUNTIME stage statistics near
  *    the broadcast threshold, so two JVMs legitimately finalize
  *    different shapes inside the same cache (this made all nine
  *    memo-consuming fingerprints — d15/d16/d18, s10/s16/s17/s20/s21,
  *    t29 — flap run-to-run, r14). The relation line itself stays; the
  *    subtree is statistics-driven detail, the same class of
  *    volatility as `Statistics(...)`. The trade is explicit: drift
  *    INSIDE a memoized build is no longer fingerprint-visible from
  *    any consumer (the build is cached in every registered query's
  *    plan) — the plan-shape specs that target the build code paths
  *    carry that guard instead;
  *  - codegen ids and AQE QueryStage-id Arguments — both assigned in
  *    stage-completion/submission order, so parallel branches of the
  *    same plan legitimately swap numbers between runs (found r14 as
  *    the residual d15/d16/d18/t29 flap after the cached-body fix).
  *
  * KNOWN RESIDUAL, deliberately NOT normalized: AQE's broadcast
  * build-side choice. Where a join's two sides are both
  * corpus-scaling (so neither may carry a broadcast hint — the r14
  * rule) and both fit at test SF, AQE broadcasts whichever measured
  * smaller AT RUNTIME, and near-equal sides flip between runs
  * (`BuildLeft` ↔ `BuildRight` plus the moved stage wrapper; observed
  * on d15/s20/s21, diagnosed with Bench's SPARK_GRAFT_PLAN_DUMP).
  * Erasing the build side would blind the tool to exactly the
  * broadcast-flip regressions it exists to catch, so the occasional
  * benign flip on those entries is the honest trade — a flap
  * confined to BuildLeft/BuildRight in the dump diff is environment,
  * not drift.
  *
  * Callers must EXECUTE the DataFrame first (any action): under AQE the
  * pre-execution plan is `isFinalPlan=false` with no stage decisions —
  * fingerprinting it would hash the undecided initial plan. The
  * `isFinalPlan` flag is deliberately NOT normalized so such a mistake
  * yields a visibly different fingerprint rather than a silent alias.
  */
object PlanFingerprint {

  def apply(df: DataFrame): String =
    hash(normalize(df.queryExecution.explainString(ExplainMode.fromString("formatted"))))

  /** Strip run-varying tokens; keep every structural one. */
  private[graft] def normalize(plan: String): String =
    stripStageIdArguments(
      stripCachedPlanBodies(plan)
        .replaceAll("#\\d+", "#")
        .replaceAll("plan_id=\\d+", "plan_id=")
        .replaceAll("\\(\\d+\\)", "()")
        .replaceAll("Statistics\\([^)]*\\)", "Statistics()")
        .replaceAll("file:[^\\s\\],)]*", "file:_")
        .replaceAll("\\$\\$?Lambda\\$?\\d*/0x[0-9a-fA-F]+", "\\$\\$Lambda_")
        .replaceAll("@[0-9a-fA-F]{6,}", "@_")
        .replaceAll("codegen id : \\d+", "codegen id : _"))

  /** Blank the integer `Arguments:` of `*QueryStage` detail entries —
    * the AQE stage id, assigned in stage-SUBMISSION order, so two
    * runs of the same plan number parallel branches differently (the
    * same order-dependence as codegen ids, which a plain regex above
    * strips). Scoped to QueryStage headers because other nodes'
    * integer Arguments are semantic (GlobalLimit's limit!). Runs
    * after node-number normalization, so headers look like
    * `() ShuffleQueryStage`. */
  private[graft] def stripStageIdArguments(plan: String): String = {
    var lastHeader = ""
    plan.split("\n", -1).map { l =>
      if (l.startsWith("() ")) lastHeader = l
      if (l.matches("Arguments: \\d+") && lastHeader.contains("QueryStage"))
        "Arguments: _"
      else l
    }.mkString("\n")
  }

  /** Drop every tree line nested UNDER an `InMemoryRelation` node AND
    * the details-section blocks of the operators that lived there.
    *
    * Tree pass: a line's DEPTH is the column where its content starts
    * (first char outside the `' '`/`':'`/`'+'`/`'-'` gutter
    * alphabet); the cached body renders strictly deeper than the
    * relation line (this also holds for the marker-less lines AQE
    * emits inside it, like `ResultQueryStage`), and the subtree ends
    * at the first line at the relation's depth or shallower — a
    * sibling, a parent, a blank line, or the details section. Nested
    * InMemoryRelations inside the skipped region are deeper and
    * skipped with it.
    *
    * Details pass: formatted explain numbers cached-body operators in
    * the SAME global sequence as the outer plan and emits a details
    * block for each (`(3) Scan parquet` under a cached relation gets
    * a real `(3) …` entry) — stripping only the tree would leave the
    * cached body's AQE decisions fingerprint-visible through those
    * blocks. Every operator id seen on a skipped tree line therefore
    * has its details block (header line through the next blank)
    * dropped too. The relation's own block survives: its Arguments
    * carry schema + storage level, no nested plan. */
  private[graft] def stripCachedPlanBodies(plan: String): String = {
    val gutter = Set(' ', ':', '+', '-')
    def contentCol(l: String): Int = l.indexWhere(ch => !gutter.contains(ch))
    // anchored to the formatted-explain tree convention — operator
    // ids render as a TRAILING "(n)" on the tree line; an unanchored
    // match would also harvest any parenthesized integer inside a
    // skipped line's argument text and over-strip a same-numbered
    // OUTER operator's details block (r15 ADVICE)
    val id = java.util.regex.Pattern.compile("\\((\\d+)\\)\\s*$")
    val cachedIds = scala.collection.mutable.Set.empty[String]
    val tree = new StringBuilder
    var skipDeeperThan = -1 // content column of the open InMemoryRelation
    plan.split("\n", -1).foreach { l =>
      val c = contentCol(l)
      if (skipDeeperThan >= 0 && c > skipDeeperThan) {
        val m = id.matcher(l)
        while (m.find()) cachedIds += m.group(1)
      } else {
        skipDeeperThan = -1
        tree.append(l).append('\n')
        if (l.contains("InMemoryRelation") && c > 0) skipDeeperThan = c
      }
    }
    val header = java.util.regex.Pattern.compile("^\\((\\d+)\\) ")
    val out = new StringBuilder
    var skippingBlock = false
    tree.toString.split("\n", -1).foreach { l =>
      val h = header.matcher(l)
      if (h.find()) skippingBlock = cachedIds.contains(h.group(1))
      else if (l.trim.isEmpty) skippingBlock = false
      if (!skippingBlock) out.append(l).append('\n')
    }
    out.dropRight(1).toString
  }

  private def hash(s: String): String =
    MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.take(16)
}
