package graft.operators

import org.apache.spark.sql.functions._

/** The bucketing contract: co-located write ⇒ zero-exchange join. */
class BucketingSpec extends graft.streaming.SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("bucketed tables join without a shuffle and match the plain join") {
    val s = spark
    val l = graft.Tables.lineitem(s, sf).select("l_orderkey", "l_quantity")
      .withColumnRenamed("l_orderkey", "orderkey")
    val o = graft.Tables.orders(s, sf).select("o_orderkey", "o_totalprice")
      .withColumnRenamed("o_orderkey", "orderkey")

    Bucketing.writeBucketed(l, "b_lineitem", "orderkey", 4)
    Bucketing.writeBucketed(o, "b_orders", "orderkey", 4)
    // At test scale AQE would broadcast the small side (also shuffle-
    // free, but not the path this operator exists for). Pin broadcasts
    // off so the assertion exercises the co-located sort-merge join —
    // what a 100 TB large⋈large actually runs.
    val prevThresh = s.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.bucketedJoin(s, "b_lineitem", "b_orders", "orderkey")
      // collect() (not count(), which is a different QueryExecution) so
      // THIS DataFrame's adaptive plan is finalized before inspection.
      val n = joined.collect().length.toLong
      // AQE wraps the plan in a leaf node, so collect{ShuffleExchangeExec}
      // would be vacuous — the rendered tree is the reliable surface.
      val planText = graft.PlanTestUtils.formatted(joined.queryExecution)
      assert(!planText.contains("Exchange hashpartitioning"),
        s"bucketed join planned a shuffle:\n$planText")
      assert(planText.contains("SortMergeJoin") || planText.contains("ShuffledHashJoin"),
        s"expected a co-located join in the plan:\n$planText")

      val expected = l.join(o, "orderkey").count()
      assert(n == expected, s"bucketed join rows $n != plain join rows $expected")
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      s.sql("DROP TABLE IF EXISTS b_lineitem")
      s.sql("DROP TABLE IF EXISTS b_orders")
    }
  }

  test("partitioned write: a predicate on the partition column prunes directories") {
    val s = spark
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    val o = graft.Tables.orders(s, sf)
      .withColumn("o_year", f_year(col("o_orderdate")))
    Bucketing.writePartitioned(o, dir, "o_year")
    try {
      def filesRead(df: org.apache.spark.sql.DataFrame): Long = {
        df.collect()
        df.queryExecution.executedPlan.collectLeaves().collectFirst {
          case fs: org.apache.spark.sql.execution.FileSourceScanExec =>
            fs.metrics.get("numFiles").map(_.value).getOrElse(-1L)
        }.getOrElse(-1L)
      }
      val all = s.read.parquet(dir)
      val full = filesRead(all)
      val pruned = filesRead(s.read.parquet(dir).filter(col("o_year") === 1996))
      assert(pruned > 0 && pruned < full,
        s"expected partition pruning: pruned=$pruned full=$full")
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
    }
  }

  private def f_year(c: org.apache.spark.sql.Column) =
    org.apache.spark.sql.functions.year(c)

  test("bucket pruning: an equality predicate reads a subset of bucket files") {
    val s = spark
    val o = graft.Tables.orders(s, sf).select("o_orderkey", "o_totalprice")
    Bucketing.writeBucketed(o, "b_orders_prune", "o_orderkey", 4)
    // autoBucketedScan drops the bucketed layout for scans with no
    // exchange to eliminate, which also forfeits pruning — pin it off
    // so the filter-only scan keeps the bucket spec.
    val prev = s.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")
    s.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try {
      val one = s.table("b_orders_prune").filter(col("o_orderkey") === 1L)
      one.collect()
      // Bucket pruning surfaces as SelectedBucketsCount on the scan node
      // (the numFiles metric still lists the table's files).
      val text = one.queryExecution.executedPlan.toString
      val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
        .findFirstMatchIn(text)
      assert(sel.isDefined, s"no SelectedBucketsCount in plan:\n$text")
      val (selected, total) = (sel.get.group(1).toInt, sel.get.group(2).toInt)
      assert(selected == 1 && total == 4,
        s"expected 1-of-4 bucket scan, got $selected of $total")
    } finally {
      s.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", prev)
      s.sql("DROP TABLE IF EXISTS b_orders_prune")
    }
  }
}
