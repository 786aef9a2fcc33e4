package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hierarchical (two-level) running sums — the scale-safe replacement
  * for `sum(x) over (partition by p order by k)` when a partition can
  * hold an unbounded share of the corpus.
  *
  * A plain running-sum window puts EVERY row of a partition into one
  * task: fine when the partition key is high-cardinality (per-doc,
  * per-media windows), a single-task sort of a billion rows when it is
  * a domain dimension (per-source quota selection, a corpus-wide
  * export order). The fix is the textbook parallel prefix sum, in
  * relational form:
  *
  *   1. split each partition into `numRanges` ORDER-ALIGNED ranges
  *      (`rangeCol`, a caller-supplied integer in [0, numRanges));
  *   2. run the running sum INSIDE each (partition, range) — parallel
  *      tasks, each sorting only its range;
  *   3. per-(partition, range) totals — at most
  *      |partitions|·numRanges rows, map-side combinable — turn into
  *      per-range prefix OFFSETS via a tiny window over ≤ numRanges
  *      rows per partition;
  *   4. broadcast the offsets back and add.
  *
  * The result is EXACT — identical to the single-window sum — because
  * integer addition reassociates freely and the ranges tile the order.
  *
  * ORDER CONTRACT: the produced running sum follows the total order
  * `(rangeCol, orderCols…)` within each `partCols` group. Callers
  * whose semantic order is `orderCols` alone must pass a `rangeCol`
  * MONOTONE (non-decreasing) in the leading order column — then the
  * two orders coincide and ties of the leading column land in one
  * range, so tiebreak columns never straddle a range boundary.
  * Callers may instead DEFINE their order as `(rangeCol, …)` — the
  * [[TrainingExport]] pattern, where the export order is
  * `(hash mod R, hash, id)` by construction.
  *
  * `rangeCol` AND every `partCols` column must be NON-NULL on every
  * row: the offsets come back through an equi-join on (partition,
  * range), and a null key never equi-matches. The contract is
  * ENFORCED, not narrated (the ilog-guard rule): the range tag itself
  * is guarded — a null range or partition value trips a row-level
  * `raise_error` when the tag is evaluated, and since the tag is both
  * the window partition key and the join key, every consumer
  * evaluates it (column pruning cannot remove it, unlike a guard on
  * the output column). Every caller derives the range from a non-null
  * order column and partitions by non-null domain dimensions, so the
  * guard is free in practice (a never-taken codegen branch).
  *
  * Scale bounds, explicit: the offsets frame is |partitions|·numRanges
  * rows. `partCols` must be domain dimensions (source, lang — bounded
  * by the world, not the data); `numRanges` is the parallelism knob —
  * each range task sorts ≈ |partition|/numRanges rows, so a deployment
  * sizes it like `spark.sql.shuffle.partitions`, far below the
  * broadcast threshold either way. */
object PrefixSum {

  /** The input plus `out` = `ntile(k)` over the order
    * `(rangeCol, orderCols…)` within each `partCols` group — EXACTLY
    * the SQL-standard ntile both engines implement (first `n mod k`
    * tiles take the extra row), computed without ever sorting a whole
    * group in one task.
    *
    * ntile is row_number plus arithmetic: with `rn` the 1-based row
    * number and `n` the group size, `base = n div k`, `rem = n mod k`,
    * the first `rem` tiles hold `base+1` rows — so
    * `rn ≤ rem·(base+1)` ⇒ tile `(rn−1) div (base+1) + 1`, else
    * `rem + (rn−1−rem·(base+1)) div base + 1`. `rn` is the in-range
    * row_number plus a per-range rank offset, and ONE per-(partition,
    * range) count aggregate (map-side combined) yields both the
    * offsets AND the group sizes via two windows over its
    * ≤ |partitions|·numRanges rows — the corpus-grain work is exactly
    * one ranked shuffle; everything else is aggregate-grain. Same
    * order contract as [[partitionedCumSum]].
    *
    * This retires the one place the r13 docs could only NARRATE scale
    * (t16/t18: "at extreme per-language cardinality swap the exact
    * ntile for approx thresholds"): the exact tercile now runs
    * hierarchically, so nothing needs swapping. */
  def partitionedNtile(df: DataFrame, partCols: Seq[String],
      rangeCol: Column, orderCols: Seq[Column], k: Int,
      out: String): DataFrame = {
    require(k > 0, s"ntile bucket count must be positive, got $k")
    val reserved = Seq("__rng", "__cnt", "__offset", "__n", "__rn", out)
    val clash = df.columns.toSeq.intersect(reserved)
    require(clash.isEmpty,
      s"partitionedNtile input already has column(s) ${clash.mkString(", ")} — " +
        "rename them first; they would be silently overwritten/dropped")
    val pc = partCols.map(col)
    val tagged = df.withColumn("__rng", guardedRangeTag(rangeCol, pc))
    val inRange = Window.partitionBy(pc :+ col("__rng"): _*)
      .orderBy(orderCols: _*)
    // ONE per-(partition, range) count aggregate yields BOTH the rank
    // offsets and the group sizes (two tiny windows over the
    // ≤ |partitions|·numRanges aggregate rows) — no second corpus
    // pass for n; the corpus-grain work is exactly the in-range
    // row_number plus the map-side-combined count.
    val offsets = tagged.groupBy(pc :+ col("__rng"): _*)
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__offset",
        coalesce(sum(col("__cnt")).over(
          Window.partitionBy(pc: _*).orderBy(col("__rng"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__n", sum(col("__cnt")).over(Window.partitionBy(pc: _*)))
      .select(pc :+ col("__rng") :+ col("__offset") :+ col("__n"): _*)
    // Integer div/pmod throughout (the TrainingExport 2^53 rule). The
    // base=0 branch (n < k) never divides: rem = n makes the first
    // predicate cover every row.
    tagged
      .withColumn("__rn", row_number().over(inRange).cast("long"))
      .join(broadcast(offsets), partCols :+ "__rng")
      .withColumn("__rn", col("__rn") + col("__offset"))
      .withColumn(out, expr(
        s"""CASE WHEN __rn <= (__n % ${k}L) * ((__n div ${k}L) + 1L)
           |     THEN (__rn - 1L) div ((__n div ${k}L) + 1L) + 1L
           |     ELSE (__n % ${k}L) +
           |          (__rn - 1L - (__n % ${k}L) * ((__n div ${k}L) + 1L))
           |            div (__n div ${k}L) + 1L
           |END""".stripMargin))
      .drop("__rng", "__cnt", "__offset", "__n", "__rn")
  }

  /** The input plus `out` = running sum of `valueCol` over the order
    * `(rangeCol, orderCols…)` within each `partCols` group (empty
    * `partCols` = one global group). `valueCol` must be exact-typed
    * (BIGINT/DECIMAL): the whole point is bit-identical equality with
    * the single-window sum, which floating addition cannot give. */
  def partitionedCumSum(df: DataFrame, partCols: Seq[String],
      rangeCol: Column, orderCols: Seq[Column], valueCol: Column,
      out: String): DataFrame = {
    val reserved = Seq("__rng", "__rtot", "__offset", out)
    val clash = df.columns.toSeq.intersect(reserved)
    require(clash.isEmpty,
      s"partitionedCumSum input already has column(s) ${clash.mkString(", ")} — " +
        "rename them first; they would be silently overwritten/dropped")
    val pc = partCols.map(col)
    val tagged = df.withColumn("__rng", guardedRangeTag(rangeCol, pc))
    val inRange = Window.partitionBy(pc :+ col("__rng"): _*)
      .orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    // Offsets aggregate the RAW values, not the windowed column, so
    // the offsets subtree never depends on the window (Catalyst can
    // plan both off the shared shuffle). Absent ranges simply don't
    // appear — the preceding-frame sum skips them identically on both
    // levels.
    val offsets = tagged.groupBy(pc :+ col("__rng"): _*)
      .agg(sum(valueCol).as("__rtot"))
      .withColumn("__offset",
        coalesce(sum(col("__rtot")).over(
          Window.partitionBy(pc: _*).orderBy(col("__rng"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(pc :+ col("__rng") :+ col("__offset"): _*)
    tagged
      .withColumn(out, sum(valueCol).over(inRange))
      .join(broadcast(offsets), partCols :+ "__rng")
      .withColumn(out, col(out) + col("__offset"))
      .drop("__rng", "__offset")
  }

  /** The range tag with the null-key contract enforced AT THE KEY: if
    * the range value or any partition column is NULL, evaluating the
    * tag trips a named row-level error. Guarding the key (rather than
    * the post-join offset, the first r14 attempt) matters twice over:
    * the equi-join back stays INNER (no cardinality change in the
    * violation case), and the guard is UNPRUNABLE — `__rng` is the
    * join key and the window partition key, so every consumer
    * evaluates it even when the output column itself is pruned (a
    * post-join guard died under `count()`, silently KEEPING the
    * null-key rows the old inner join dropped). */
  private def guardedRangeTag(rangeCol: Column, pc: Seq[Column]): Column = {
    val allKeysNonNull = (rangeCol.isNotNull +: pc.map(_.isNotNull)).reduce(_ && _)
    when(allKeysNonNull, rangeCol)
      .otherwise(expr(
        "raise_error('graft.PrefixSum: NULL partition or range key — " +
          "partCols and rangeCol must be non-null (a null equi-key " +
          "would silently drop its rows)')").cast("long"))
  }
}
