package graft.queries

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** a39 contract: incremental aggregate maintenance is EXACT, not
  * approximate — because the maintained partials are algebraic
  * (decimal sums + counts), merging base partials with delta partials
  * reproduces the full recompute bit-for-bit, in any slice order.
  * This is the theorem that lets a 100 TB pipeline refresh a
  * materialized aggregate from the day's delta without rescanning the
  * corpus. */
class IncrementalAggSpec extends graft.streaming.SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("a39: every group's merged partials match the full recompute") {
    val rows = graft.SparkEntry.queries("a39_incremental_agg")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("matches_full"),
        s"IVM merge diverged from full recompute on " +
          s"(${r.getAs[String]("l_returnflag")}, ${r.getAs[String]("l_linestatus")})")
      assert(r.getAs[Long]("count_order") > 0)
      val avg = r.getAs[Double]("sum_qty") / r.getAs[Long]("count_order").toDouble
      assert(r.getAs[Double]("avg_qty") == avg,
        "avg is not the end-division of the merged exact partials")
    }
  }

  test("a39: partial merge is exact under adversarial slicing (decimal algebra)") {
    // values chosen so DOUBLE summation order would drift (0.1 + 0.2
    // != 0.3 territory); decimals must not care how rows are sliced
    val rows = (1L to 300L).map { i =>
      Row(i, if (i % 2 == 0) "A" else "B", "O", 0.1 + (i % 7) * 0.01, 1000.01 + i * 0.07)
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("l_orderkey", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("l_returnflag", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("l_linestatus", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("l_quantity", org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("l_extendedprice", org.apache.spark.sql.types.DoubleType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 7), schema)
    // three arbitrary, uneven slices — a different partitioning than
    // a39's own %10 split, so the test pins the ALGEBRA, not the slice
    val parts = Seq(
      AnalyticsQueries.incrAggPartials(df.filter(col("l_orderkey") % 3 === 0)),
      AnalyticsQueries.incrAggPartials(df.filter(col("l_orderkey") % 3 === 1)),
      AnalyticsQueries.incrAggPartials(df.filter(col("l_orderkey") % 3 === 2)))
    val merged = parts.reduce(_ unionByName _)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("p_qty")).as("p_qty"), sum(col("p_price")).as("p_price"),
        sum(col("p_cnt")).as("p_cnt"))
      .select(col("l_returnflag"), col("l_linestatus"),
        col("p_qty").cast("decimal(38,2)"), col("p_price").cast("decimal(38,2)"),
        col("p_cnt"))
    val full = AnalyticsQueries.incrAggPartials(df)
      .select(col("l_returnflag"), col("l_linestatus"),
        col("p_qty").cast("decimal(38,2)"), col("p_price").cast("decimal(38,2)"),
        col("p_cnt"))
    val m = merged.collect().map(r => (r.getString(0), r.getString(1)) -> r.toSeq.drop(2)).toMap
    val f = full.collect().map(r => (r.getString(0), r.getString(1)) -> r.toSeq.drop(2)).toMap
    assert(m.keySet == f.keySet)
    m.keySet.foreach(k => assert(m(k) == f(k), s"merge != full on $k"))
  }

  test("a39: the maintained base view is served from the disk materialization") {
    // first call materializes; the frame it returns must already be
    // scan-rooted — no lineitem lineage in the refresh path
    val base = AnalyticsQueries.incrBasePartials(spark, sf)
    val plan = graft.PlanTestUtils.formatted(base.queryExecution)
    assert(plan.contains("graft_memo"),
      "base partials are not served from the diskMemo materialization")
    assert(!plan.contains("lineitem"),
      "the refresh path still carries the base-table lineage")
  }
}
