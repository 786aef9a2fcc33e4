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
      assert(graft.PlanTestUtils.finalPlanExchanges(joined.queryExecution) == 0,
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

  /** The steady-state deployment d09's scaladoc promises: the corpus
    * digest index lives as a table bucketed on `digest`, so checking a
    * fresh crawl batch shuffles ONLY the batch — the index side joins
    * from its bucketed layout with no exchange. The per-batch network
    * cost is O(batch), not O(corpus), which is what makes continuous
    * ingest dedup affordable at 100 TB. */
  test("d09 steady state: incremental dedup shuffles only the new batch, never the bucketed index") {
    val s = spark
    val sf01 = "/root/testdata/sf0.001"
    val digest = md5(concat_ws(" ", slice(split(col("text"), " "), 1, 16))).as("digest")
    val d = graft.Tables.documents(s, sf01).select(col("doc_id"), digest)
    val idx = d.filter(col("doc_id") % 10 =!= 0)
      .groupBy(col("digest")).agg(min(col("doc_id")).as("index_doc"))
    Bucketing.writeBucketed(idx, "b_digest_index", "digest", 4)
    val prevThresh = s.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = d.filter(col("doc_id") % 10 === 0)
        .join(s.table("b_digest_index"), Seq("digest"), "left")
        .select(col("doc_id"), col("digest"),
          col("index_doc").isNotNull.as("is_dup"),
          coalesce(col("index_doc"), lit(-1L)).as("index_doc"))
      val got = joined.collect()
      val planText = graft.PlanTestUtils.formatted(joined.queryExecution)
      // Exactly ONE hash exchange: the batch side being repartitioned
      // into the index's bucket layout. A second one means the index
      // re-shuffled — the regression this test exists to catch.
      val exchanges = graft.PlanTestUtils.finalPlanExchanges(joined.queryExecution)
      assert(exchanges == 1,
        s"expected exactly the batch-side exchange, found $exchanges:\n$planText")
      assert(planText.contains("Bucketed: true"),
        s"index scan lost its bucketed layout:\n$planText")

      // Same rows as the registered d09 query (which aggregates its
      // index inline) — the bucketed deployment changes the physical
      // plan, never the answer.
      val expected = graft.SparkEntry.queries("d09_incremental_dedup")(s, sf01)
        .collect().map(_.toSeq)
      assert(got.sortBy(_.getLong(0)).map(_.toSeq).toSeq == expected.toSeq,
        "bucketed-index d09 differs from the registered query")
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      s.sql("DROP TABLE IF EXISTS b_digest_index")
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
