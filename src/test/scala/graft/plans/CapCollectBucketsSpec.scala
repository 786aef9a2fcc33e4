package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The injected optimizer rule must rewrite the hazardous
  * collect-then-filter shape to count-window-first WITHOUT changing
  * results — including collect_list's null-skipping — and must leave
  * non-provable shapes alone. */
class CapCollectBucketsSpec extends graft.streaming.SparkTestBase {

  private lazy val extSession: SparkSession = {
    val base = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try SparkSession.builder()
      .master("local[4]")
      .withExtensions(new graft.GraftExtensions()(_))
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  // Hot bucket "h" (5 members, above cap), singleton "s", in-range
  // buckets, and a null value that collect_list skips but a naive
  // count(*) would include.
  private def data(s: SparkSession): DataFrame = {
    import s.implicits._
    (Seq.tabulate(5)(i => ("h", i: java.lang.Integer)) ++
      Seq(("s", 9: java.lang.Integer), ("a", 1: java.lang.Integer),
        ("a", 2: java.lang.Integer), ("a", null: java.lang.Integer),
        ("b", 3: java.lang.Integer), ("b", 4: java.lang.Integer),
        ("b", 5: java.lang.Integer))).toDF("k", "v")
  }

  private def shaped(df: DataFrame): DataFrame =
    df.groupBy(col("k"))
      .agg(array_sort(collect_list(col("v"))).as("ids"))
      .filter(size(col("ids")).between(2, 3))

  private def canon(df: DataFrame): Set[(String, Seq[Int])] =
    df.collect().map(r => (r.getString(0), r.getSeq[Int](1))).toSet

  test("rewrites to count-window-first with identical results") {
    val plain = canon(shaped(data(spark)))
    val viaRule = shaped(data(extSession))
    assert(canon(viaRule) == plain)
    // "a" has 3 rows but only 2 non-null values: null-skipping held
    assert(plain.contains(("a", Seq(1, 2))) && !plain.exists(_._1 == "h"))
    val optimized = viaRule.queryExecution.optimizedPlan.toString
    assert(optimized.contains("graft_bucket_n"),
      s"expected the count-window rewrite in:\n$optimized")
    val physical = viaRule.queryExecution.executedPlan.toString
    assert(physical.indexOf("collect_list") < physical.indexOf("graft_bucket_n"),
      "count-filter must sit upstream of the collect aggregation")
  }

  test("streaming aggregations are never rewritten") {
    // A streaming aggregate accumulates groups across micro-batches;
    // the rewrite's window would count only the current batch. The
    // rule must bail on streaming children.
    val s = extSession
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Int)]
    val sdf = ms.toDF().toDF("k", "v")
      .groupBy(col("k")).agg(collect_list(col("v")).as("ids"))
      .filter(size(col("ids")) <= 3)
    // Apply the rule directly: the batch QueryExecution pipeline
    // rightly refuses streaming sources, and streaming execution
    // optimizes per micro-batch — either way the rule sees a plan
    // whose child isStreaming and must return it unchanged.
    val analyzed = sdf.queryExecution.analyzed
    assert(analyzed.isStreaming)
    assert(CapCollectBuckets(analyzed) eq analyzed,
      "rule must not touch a streaming aggregation")
  }

  test("shapes the rule cannot prove are left untouched") {
    // Lower bound only: nothing to cap, no rewrite.
    val lowerOnly = data(extSession).groupBy(col("k"))
      .agg(collect_list(col("v")).as("ids"))
      .filter(size(col("ids")) >= 2)
    assert(!lowerOnly.queryExecution.optimizedPlan.toString.contains("graft_bucket_n"))
    // Size-changing wrapper (array_distinct): size != row count, no rewrite.
    val distinctWrap = data(extSession).groupBy(col("k"))
      .agg(array_distinct(collect_list(col("v"))).as("ids"))
      .filter(size(col("ids")) <= 3)
    assert(!distinctWrap.queryExecution.optimizedPlan.toString.contains("graft_bucket_n"))
    // Global aggregate: no grouping keys means the window would funnel
    // every row into one partition — must not rewrite.
    val global = data(extSession)
      .agg(collect_list(col("v")).as("ids"))
      .filter(size(col("ids")) <= 100)
    assert(!global.queryExecution.optimizedPlan.toString.contains("graft_bucket_n"))
    assert(global.collect().head.getSeq[Int](0).size == 11)
    // Mixed predicate: the non-size conjunct must survive the rewrite.
    val mixed = data(extSession).groupBy(col("k"))
      .agg(collect_list(col("v")).as("ids"))
      .filter(size(col("ids")) <= 3 && col("k") =!= "b")
    assert(mixed.queryExecution.optimizedPlan.toString.contains("graft_bucket_n"))
    // no lower bound: the singleton survives; "h" capped, "b" filtered
    assert(canon(mixed.select(col("k"), array_sort(col("ids")))) ==
      Set(("a", Seq(1, 2)), ("s", Seq(9))))
  }
}
