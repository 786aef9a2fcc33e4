package graft.queries

import org.apache.spark.sql.functions._

/** Guards on the shared LSH bucket helper all four banded queries
  * (d03/d04/d06/s03) ride on. */
class LshBucketSpec extends graft.streaming.SparkTestBase {

  test("collectCappedBuckets equals the naive collect-then-filter shape") {
    val s = spark
    import s.implicits._
    // Random band rows with a hot key (40 members, above the cap), a
    // singleton (below), and several in-range buckets.
    val rnd = new scala.util.Random(42)
    val rows = Seq.tabulate(40)(i => ("hot", 0, i.toLong)) ++
      Seq(("solo", 1, 99L)) ++
      Seq.fill(60)((s"k${rnd.nextInt(12)}", rnd.nextInt(3), rnd.nextInt(50).toLong))
    val df = rows.toDF("bkey", "b", "id")

    def canon(out: org.apache.spark.sql.DataFrame): Set[(String, Int, Seq[Long])] =
      out.collect().map(r => (r.getString(0), r.getInt(1),
        r.getSeq[Long](2))).toSet

    val viaHelper = canon(
      DedupQueries.collectCappedBuckets(df, Seq("bkey", "b"), col("id"), maxBucket = 8)
        .select(col("bkey"), col("b"), col("ids")))
    val naive = canon(
      df.groupBy(col("bkey"), col("b"))
        .agg(array_sort(collect_list(col("id"))).as("ids"))
        .filter(size(col("ids")).between(2, 8))
        .select(col("bkey"), col("b"), col("ids")))
    assert(viaHelper == naive)
    assert(naive.nonEmpty && !naive.exists(_._1 == "hot") && !naive.exists(_._1 == "solo"))
  }

  test("null payloads do not count toward bucket membership (collect_list parity)") {
    val s = spark
    import s.implicits._
    // "pair" holds 2 non-null + 2 null payloads: must stay a bucket of 2.
    // "ghost" holds 1 non-null + 3 nulls: must be dropped as a singleton
    // (a count(*) cap would wrongly keep it — the ADVICE r3 latent bug).
    // "all-null" must vanish entirely.
    val rows: Seq[(String, java.lang.Long)] = Seq(
      ("pair", 1L), ("pair", 2L), ("pair", null), ("pair", null),
      ("ghost", 7L), ("ghost", null), ("ghost", null), ("ghost", null),
      ("all-null", null), ("all-null", null))
    val df = rows.toDF("bkey", "id").withColumn("b", lit(0))
    val out = DedupQueries.collectCappedBuckets(df, Seq("bkey", "b"), col("id"), maxBucket = 8)
      .select(col("bkey"), col("ids"))
      .collect().map(r => (r.getString(0), r.getSeq[Long](1))).toMap
    assert(out == Map("pair" -> Seq(1L, 2L)),
      s"null payloads changed bucket membership: $out")
  }

  test("d03's plan counts and filters buckets BEFORE collecting them") {
    // The scale property the helper exists for: a hot bucket's rows are
    // dropped by the count-window filter while still individually
    // spillable, never materialized as one aggregation-buffer array.
    // Tree strings print parents first, so the collect aggregate must
    // appear before (above) the bucket_n count window.
    val plan = graft.SparkEntry.queries("d03_minhash_lsh")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    val collectAt = plan.indexOf("collect_list")
    val windowAt = plan.indexOf("bucket_n")
    assert(collectAt >= 0 && windowAt >= 0, s"expected both nodes in plan:\n$plan")
    assert(collectAt < windowAt,
      "bucket count-filter must be upstream (printed below) the collect aggregation")
  }
}
