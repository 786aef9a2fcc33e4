package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The r14 aggregate+join replacements for count-over-partition
  * windows on data-dependent HOT keys (digests, fingerprints, cluster
  * ids): a window funnels every row of a hot key into ONE task with no
  * skew mitigation, while these shapes partial-combine map-side and
  * join back through a key shuffle AQE can skew-split. The per-key
  * frames they produce grow with the data, so neither is ever
  * broadcast-hinted (the corpus-scaling-frame rule) — AQE promotes
  * them to runtime broadcasts at scales where they genuinely fit.
  *
  * ONE definition so the five call sites (d02's sibling min-join is
  * bespoke; d07/d10/d14/m05/m09 use these) cannot drift — a future
  * hint or guard lands here once.
  *
  * Key nullability: both joins are equi-joins, under which a NULL key
  * row would be silently left unflagged by [[flagRepeated]] and
  * silently DROPPED by [[withGroupSize]] — so the non-null-key
  * contract is ENFORCED, not narrated (the PrefixSum.guardedRangeTag
  * rule): the key column is rewrapped in a row-level `raise_error`
  * guard that trips on the first NULL key evaluated. The guard is
  * unprunable because the wrapped column IS the group/join key —
  * every consumer evaluates it even when it prunes the output. Every
  * current caller keys on a non-null digest/label column, so the
  * guard never fires in the registered queries. */
object KeyedCounts {

  /** `df` with `key` replaced by a guarded copy that raises a named
    * row-level error on NULL — evaluated wherever the key is, so a
    * future caller with a nullable key fails loudly instead of losing
    * rows through the equi-joins. */
  private def guarded(df: DataFrame, key: String, site: String): DataFrame = {
    val dt = df.schema(key).dataType
    df.withColumn(key,
      when(col(key).isNotNull, col(key)).otherwise(
        expr(s"raise_error('graft.KeyedCounts.$site: NULL key — the " +
          "key column must be non-null (a null equi-key would " +
          "silently drop or unflag its rows)')").cast(dt)))
  }

  /** The input plus `__dup` = 1L where the row's `key` value occurs in
    * at least `minOcc` rows of `df` (NULL otherwise — aggregate the
    * flag with `count(col("__dup"))`, which skips NULLs). The ≥minOcc
    * set is linear in dup mass; the join is a left equi-join on the
    * key. */
  def flagRepeated(df: DataFrame, key: String, minOcc: Long = 2L): DataFrame = {
    // only __dup can clash: __occ lives and dies inside the aggregated
    // sub-frame and never touches the input's columns
    require(!df.columns.contains("__dup"),
      "flagRepeated input already has column __dup — rename it first; " +
        "it would collide with the produced flag")
    val g = guarded(df, key, "flagRepeated")
    val set = g.groupBy(col(key)).agg(count(lit(1)).as("__occ"))
      .filter(col("__occ") >= minOcc)
      .select(col(key), lit(1L).as("__dup"))
    g.join(set, Seq(key), "left")
  }

  /** The input plus `out` = the number of rows sharing this row's
    * `key` value — the window-free `count(*) over (partition by key)`. */
  def withGroupSize(df: DataFrame, key: String, out: String): DataFrame = {
    require(!df.columns.contains(out),
      s"withGroupSize input already has column $out — rename it first")
    val g = guarded(df, key, "withGroupSize")
    g.join(g.groupBy(col(key)).agg(count(lit(1)).as(out)), Seq(key))
  }
}
