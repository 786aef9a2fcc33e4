package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The aggregate+join contracts behind the r14 hot-key window
  * conversions: row-for-row equivalence with the count-over-partition
  * windows they replaced, the minOcc boundary, and the documented
  * null-key behavior. */
class KeyedCountsSpec extends graft.streaming.SparkTestBase {

  import scala.jdk.CollectionConverters._

  private def synth() = {
    // key frequencies 1, 2, and 5 — both sides of every >=2 boundary
    val rows = Seq(
      ("a", 1L), ("b", 2L), ("b", 3L), ("c", 4L), ("c", 5L),
      ("c", 6L), ("c", 7L), ("c", 8L), ("d", 9L)
    ).map { case (k, id) => org.apache.spark.sql.Row(k, id) }
    spark.createDataFrame(rows.asJava,
      org.apache.spark.sql.types.StructType.fromDDL("k STRING, id BIGINT"))
  }

  test("flagRepeated matches the count-over-partition window it replaced") {
    val df = synth()
    val w = Window.partitionBy(col("k"))
    val expect = df.withColumn("n", count(lit(1)).over(w))
      .select(col("id"), (col("n") >= 2).as("dup")).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val got = KeyedCounts.flagRepeated(df, "k")
      .select(col("id"), col("__dup").isNotNull.as("dup")).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got == expect)
    // count(col("__dup")) skips nulls — the aggregation idiom callers use
    val n = KeyedCounts.flagRepeated(df, "k")
      .agg(count(col("__dup"))).head().getLong(0)
    assert(n == 7, s"rows with a >=2 key: b(2) + c(5) = 7, got $n")
  }

  test("flagRepeated minOcc boundary: exactly-at-threshold keys flag, below do not") {
    val df = synth()
    val at5 = KeyedCounts.flagRepeated(df, "k", minOcc = 5L)
      .filter(col("__dup").isNotNull).select(col("k")).distinct()
      .collect().map(_.getString(0)).toSeq
    assert(at5 == Seq("c"), s"only the 5-row key meets minOcc=5, got $at5")
    val at6 = KeyedCounts.flagRepeated(df, "k", minOcc = 6L)
      .filter(col("__dup").isNotNull).count()
    assert(at6 == 0)
  }

  test("withGroupSize matches the window count and keeps every row") {
    val df = synth()
    val w = Window.partitionBy(col("k"))
    val expect = df.withColumn("n", count(lit(1)).over(w))
      .select(col("id"), col("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = KeyedCounts.withGroupSize(df, "k", "n")
      .select(col("id"), col("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expect)
  }

  test("null key fails loudly in both shapes (enforced, not narrated — the r14 ADVICE fix)") {
    val df = synth().withColumn("k",
      when(col("id") === 9L, lit(null)).otherwise(col("k")))
    // the guard is the key itself, so it trips even under count() —
    // the unprunability property PrefixSum.guardedRangeTag established
    val e1 = intercept[Exception] { KeyedCounts.flagRepeated(df, "k").count() }
    assert(exceptionChain(e1).exists(_.contains("graft.KeyedCounts.flagRepeated")),
      s"expected the named guard, got: ${e1.getMessage}")
    val e2 = intercept[Exception] { KeyedCounts.withGroupSize(df, "k", "n").count() }
    assert(exceptionChain(e2).exists(_.contains("graft.KeyedCounts.withGroupSize")),
      s"expected the named guard, got: ${e2.getMessage}")
    // non-null keys are untouched by the guard: full equivalence re-checked
    val clean = synth()
    assert(KeyedCounts.flagRepeated(clean, "k").count() == 9)
    assert(KeyedCounts.withGroupSize(clean, "k", "n").count() == 9)
  }

  private def exceptionChain(e: Throwable): Seq[String] =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(10)
      .map(t => Option(t.getMessage).getOrElse("")).toSeq

  test("reserved output names are rejected loudly; input __occ passes through") {
    val df = synth()
    intercept[IllegalArgumentException] {
      KeyedCounts.flagRepeated(df.withColumn("__dup", lit(1L)), "k")
    }
    intercept[IllegalArgumentException] {
      KeyedCounts.withGroupSize(df.withColumn("n", lit(1L)), "k", "n")
    }
    // __occ never escapes the aggregated sub-frame — an input column
    // with that name is untouched (the third-pass review fix)
    val out = KeyedCounts.flagRepeated(df.withColumn("__occ", lit(7L)), "k")
    assert(out.columns.contains("__occ") &&
      out.select(col("__occ")).distinct().head().getLong(0) == 7L)
  }
}
