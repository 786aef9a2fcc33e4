package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The hierarchical prefix-sum contract: bit-identical to the plain
  * single-window running sum, under skew, ties, negatives, and every
  * range count — the exactness that lets t07/t21/t15/t27 swap the
  * one-task-per-partition window for the parallel form with NO oracle
  * churn. */
class PrefixSumSpec extends graft.streaming.SparkTestBase {

  import scala.jdk.CollectionConverters._

  /** Synthetic (grp, k, id, v): skewed group sizes, duplicate order
    * keys, negative values. */
  private def synth() = {
    val rows = (0 until 400).map { i =>
      val grp = if (i % 10 < 7) "big" else if (i % 10 < 9) "mid" else "tiny"
      // k collides heavily (i/7) so tiebreak columns matter
      org.apache.spark.sql.Row(grp, (i / 7).toLong, i.toLong, (i % 13).toLong - 3L)
    }
    spark.createDataFrame(rows.asJava,
      org.apache.spark.sql.types.StructType.fromDDL(
        "grp STRING, k BIGINT, id BIGINT, v BIGINT"))
  }

  private def reference(df: org.apache.spark.sql.DataFrame) = {
    val w = Window.partitionBy(col("grp")).orderBy(col("k"), col("id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    df.withColumn("cum", sum(col("v")).over(w))
      .select("grp", "id", "cum").collect().map(r =>
        (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
  }

  test("matches the single-window running sum exactly, at every range count") {
    val df = synth()
    val expect = reference(df)
    // rangeCol monotone in k (the leading order col) — the contract.
    // 1 range degenerates to the plain window; 400 overshoots the data.
    for (r <- Seq(1, 3, 64, 400)) {
      val got = PrefixSum.partitionedCumSum(df, Seq("grp"),
        expr(s"k div ${(57 + r) / r}L"), Seq(col("k"), col("id")),
        col("v"), "cum")
        .select("grp", "id", "cum").collect().map(x =>
          (x.getString(0), x.getLong(1)) -> x.getLong(2)).toMap
      assert(got == expect, s"hierarchical cum drifted at numRanges=$r")
    }
  }

  test("descending order with bounds-derived ranges (the t21 shape) matches the plain window") {
    val df = synth()
    val w = Window.partitionBy(col("grp")).orderBy(col("k").desc, col("id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val expect = df.withColumn("cum", sum(col("v")).over(w))
      .select("grp", "id", "cum").collect().map(r =>
        (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val bounds = df.agg(min(col("k")).as("lo"), max(col("k")).as("hi"))
    val ranged = df.crossJoin(broadcast(bounds))
      .withColumn("rng", expr("(hi - k) div ((hi - lo) div 8L + 1L)"))
      .drop("lo", "hi")
    val got = PrefixSum.partitionedCumSum(ranged, Seq("grp"),
      col("rng"), Seq(col("k").desc, col("id")), col("v"), "cum")
      .select("grp", "id", "cum").collect().map(x =>
        (x.getString(0), x.getLong(1)) -> x.getLong(2)).toMap
    assert(got == expect)
  }

  test("empty partCols gives the global running sum (the TrainingExport shape)") {
    val df = synth().filter(col("grp") === "tiny")
    val w = Window.orderBy(col("k"), col("id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val expect = df.withColumn("cum", sum(col("v")).over(w))
      .select("id", "cum").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = PrefixSum.partitionedCumSum(df, Seq.empty,
      expr("k div 9L"), Seq(col("k"), col("id")), col("v"), "cum")
      .select("id", "cum").collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(got == expect)
  }

  test("partitionedNtile matches ntile(k) exactly — every k, every remainder, n < k, ties") {
    val df = synth() // group sizes 280/80/40: rem varies with k
    for (k <- Seq(1, 2, 3, 5, 7, 13)) {
      val w = Window.partitionBy(col("grp")).orderBy(col("k"), col("id"))
      val expect = df.withColumn("tile", ntile(k).over(w))
        .select("grp", "id", "tile").collect().map(r =>
          (r.getString(0), r.getLong(1)) -> r.getInt(2).toLong).toMap
      val got = PrefixSum.partitionedNtile(df, Seq("grp"),
        expr("k div 9L"), Seq(col("k"), col("id")), k, "tile")
        .select("grp", "id", "tile").collect().map(x =>
          (x.getString(0), x.getLong(1)) -> x.getLong(2)).toMap
      assert(got == expect, s"hierarchical ntile drifted at k=$k")
    }
  }

  test("partitionedNtile with n < k gives one row per tile (the base=0 edge)") {
    val df = synth().filter(col("id") < 4) // 4 rows, one group
    val got = PrefixSum.partitionedNtile(df, Seq("grp"),
      expr("k div 9L"), Seq(col("k"), col("id")), 7, "tile")
      .select("id", "tile").collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val w = Window.partitionBy(col("grp")).orderBy(col("k"), col("id"))
    val expect = df.withColumn("tile", ntile(7).over(w))
      .select("id", "tile").collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    assert(got == expect)
  }

  test("partitionedNtile over a DOUBLE order with bounds-derived ranges (the t16/t18 shape)") {
    val df = synth().withColumn("q", col("v").cast("double") / 7.0)
    val w = Window.partitionBy(col("grp")).orderBy(col("q"), col("id"))
    val expect = df.withColumn("tile", ntile(3).over(w))
      .select("grp", "id", "tile").collect().map(r =>
        (r.getString(0), r.getLong(1)) -> r.getInt(2).toLong).toMap
    val bounds = df.agg(min(col("q")).as("qlo"), max(col("q")).as("qhi"))
    val ranged = df.crossJoin(broadcast(bounds))
      .withColumn("rng", expr(
        "CASE WHEN qhi > qlo THEN CAST(floor((q - qlo) / ((qhi - qlo) / 16.0)) AS BIGINT) ELSE 0L END"))
      .drop("qlo", "qhi")
    val got = PrefixSum.partitionedNtile(ranged, Seq("grp"),
      col("rng"), Seq(col("q"), col("id")), 3, "tile")
      .select("grp", "id", "tile").collect().map(x =>
        (x.getString(0), x.getLong(1)) -> x.getLong(2)).toMap
    assert(got == expect)
  }

  test("NULL partition/range keys fail loudly instead of silently dropping rows") {
    // The offsets come back through an equi-join; a null key never
    // equi-matches, so without the guard the null-key rows would
    // silently vanish (where the replaced window kept them as their
    // own partition). The contract is enforced via a row-level
    // raise_error on the range tag itself.
    val df = synth().withColumn("nk",
      when(col("id") === 5L, lit(null)).otherwise(col("k")))
    // count(), deliberately: the guard lives on the RANGE TAG (window
    // partition key + join key), which no consumer can column-prune —
    // a guard on the output column died under exactly this action.
    val e = intercept[Exception] {
      PrefixSum.partitionedCumSum(df, Seq("grp"), expr("nk div 9L"),
        Seq(col("k"), col("id")), col("v"), "cum").count()
    }
    def messages(t: Throwable): String =
      if (t == null) "" else t.toString + messages(t.getCause)
    assert(messages(e).contains("graft.PrefixSum"),
      s"expected the named null-key error, got: ${messages(e).take(300)}")
    // null PARTITION keys trip the same guard
    val df2 = synth().withColumn("ng",
      when(col("id") === 5L, lit(null)).otherwise(col("grp")))
    val e2 = intercept[Exception] {
      PrefixSum.partitionedNtile(df2, Seq("ng"), expr("k div 9L"),
        Seq(col("k"), col("id")), 3, "tile").count()
    }
    assert(messages(e2).contains("graft.PrefixSum"),
      s"expected the named null-key error, got: ${messages(e2).take(300)}")
  }

  test("reserved column names are rejected loudly") {
    val df = synth().withColumn("__rng", lit(1L))
    val e = intercept[IllegalArgumentException] {
      PrefixSum.partitionedCumSum(df, Seq("grp"), expr("k div 9L"),
        Seq(col("k"), col("id")), col("v"), "cum")
    }
    assert(e.getMessage.contains("__rng"))
  }
}
