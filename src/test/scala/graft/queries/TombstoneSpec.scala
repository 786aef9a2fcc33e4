package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

/** s24 contract: deleting from the index is a pure assignment-relation
  * subtraction — serving over the live assignment can never return a
  * tombstoned vector, promotes exactly the next-best candidates in
  * their place, and the real-corpus report carries a non-trivial
  * pre/post contrast (the stale-serving count a delete-blind index
  * would ship is > 0, the post-delete tombstone count is exactly 0). */
class TombstoneSpec extends graft.streaming.SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("s24: report invariants on the real corpus") {
    val r = graft.SparkEntry.queries("s24_ann_delete")(spark, sf).collect().head
    val corpus = graft.Tables.embeddings(spark, sf).count()
    assert(r.getAs[Long]("n_deleted") + r.getAs[Long]("n_live") == corpus)
    assert(r.getAs[Long]("n_tombstone_hits") == 0L,
      "a tombstoned vector was served post-delete")
    assert(r.getAs[Long]("n_stale_served_pre") > 0L,
      "the pre-delete pass served no tombstones — the contrast measures nothing")
    assert(r.getAs[Long]("n_results_post") == r.getAs[Long]("n_results_pre"),
      "deletion reduced answer coverage — cells too small for top-5 after delete")
    val mean = r.getAs[Double]("mean_cos_live")
    assert(mean > 0.0 && mean <= 1.0)
  }

  test("s24: serving over the live assignment promotes exact next-best candidates") {
    val s = spark
    // one cell, six candidates at known cosines to the single query
    // direction (2-d vectors on the unit circle: cos is the x-coord)
    def vec(x: Double, y: Double) = Seq(x.toFloat, y.toFloat)
    val cos = Seq(0.99, 0.95, 0.90, 0.85, 0.80, 0.75)
    val rows = cos.zipWithIndex.map { case (c, i) =>
      Row(i.toLong + 1L, vec(c, math.sqrt(1 - c * c)))
    }
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("v", ArrayType(FloatType))))
    val e = s.createDataFrame(s.sparkContext.parallelize(rows, 2), schema)
      .withColumn("nrm", expr("sqrt(aggregate(zip_with(v, v, (x, y) -> CAST(x * y AS DOUBLE)), CAST(0.0 AS DOUBLE), (a, z) -> a + z))"))
    val asg = e.select(col("vec_id"), lit(0L).as("cell"))
    val probes = s.createDataFrame(
      s.sparkContext.parallelize(Seq(Row(100L, 0L, vec(1.0, 0.0))), 1),
      StructType(Seq(StructField("q_id", LongType), StructField("cell", LongType),
        StructField("qv", ArrayType(FloatType)))))
      .withColumn("qn", expr("sqrt(aggregate(zip_with(qv, qv, (x, y) -> CAST(x * y AS DOUBLE)), CAST(0.0 AS DOUBLE), (a, z) -> a + z))"))
    def served(a: org.apache.spark.sql.DataFrame): Seq[Long] =
      SimilarityQueries.serveOverAssignment(probes, e, a)
        .collect().map(_.getAs[Long]("c_id")).sorted.toSeq
    // full index: top-5 of 6 = ids 1..5 (cos descending)
    assert(served(asg) == Seq(1L, 2L, 3L, 4L, 5L))
    // tombstone the top-2: ids 3..6 must ALL serve (next-best promoted),
    // the deleted ids must not appear, coverage shrinks only because
    // only 4 candidates remain
    val live = asg.filter(col("vec_id") > 2L)
    assert(served(live) == Seq(3L, 4L, 5L, 6L))
  }
}
