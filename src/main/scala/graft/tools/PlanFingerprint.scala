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
  *    m01/m02/m05 fingerprints unstable run-to-run, r8).
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
    plan
      .replaceAll("#\\d+", "#")
      .replaceAll("plan_id=\\d+", "plan_id=")
      .replaceAll("\\(\\d+\\)", "()")
      .replaceAll("Statistics\\([^)]*\\)", "Statistics()")
      .replaceAll("file:[^\\s\\],)]*", "file:_")
      .replaceAll("\\$\\$?Lambda\\$?\\d*/0x[0-9a-fA-F]+", "\\$\\$Lambda_")
      .replaceAll("@[0-9a-fA-F]{6,}", "@_")

  private def hash(s: String): String =
    MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.take(16)
}
