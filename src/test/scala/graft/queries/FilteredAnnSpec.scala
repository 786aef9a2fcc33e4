package graft.queries

import org.apache.spark.sql.functions._

/** s15 filtered-ANN contracts — the three properties that make
  * "filtered search" a distinct primitive rather than a WHERE clause
  * bolted onto s07:
  *
  *  1. label coherence: every returned candidate really carries the
  *     query's label IN THE DATA (checked by re-joining embeddings,
  *     not by trusting the query's own join);
  *  2. subset-optimality: the filtered candidate set is a subset of
  *     s07's, so per query the filtered best cosine can never beat
  *     the unfiltered best;
  *  3. pre-filter ≠ post-filter: filtering s07's top-5 AFTER ranking
  *     underfills — s15 returns at least as many rows per query, and
  *     strictly more for some query on the fixture (the reason the
  *     predicate must precede the rank).
  */
class FilteredAnnSpec extends graft.streaming.SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  import SimilarityQueries._

  private lazy val filtered = annFiltered(spark, sf).cache()
  private lazy val unfiltered = annIvfMultiProbe(spark, sf).cache()

  test("every result candidate carries the query's label in the data") {
    val labels = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id").as("c_id"), col("label").as("c_label"))
    val mismatched = filtered.join(labels, "c_id")
      .filter(col("label") =!= col("c_label")).count()
    assert(filtered.count() > 0, "fixture produced no filtered results")
    assert(mismatched == 0)
  }

  test("subset-optimality: filtered rank-1 never beats unfiltered rank-1") {
    val f1 = filtered.filter(col("rnk") === 1)
      .select(col("q_id"), col("cosine").as("fcos"))
    val u1 = unfiltered.filter(col("rnk") === 1)
      .select(col("q_id"), col("cosine").as("ucos"))
    val joined = f1.join(u1, "q_id")
    assert(joined.count() > 0)
    assert(joined.filter(col("fcos") > col("ucos") + 1e-12).count() == 0)
  }

  test("pre-filter returns at least as much as post-filtering s07's top-5, more for some query") {
    val labels = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id").as("c_id"), col("label").as("c_label"))
    val qLabels = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id").as("q_id"), col("label").as("q_label"))
    val post = unfiltered.join(labels, "c_id").join(qLabels, "q_id")
      .filter(col("c_label") === col("q_label"))
      .groupBy(col("q_id")).agg(count(lit(1)).as("n_post"))
    val pre = filtered.groupBy(col("q_id")).agg(count(lit(1)).as("n_pre"))
    val both = pre.join(post, Seq("q_id"), "left")
      .withColumn("n_post", coalesce(col("n_post"), lit(0L)))
    assert(both.filter(col("n_pre") < col("n_post")).count() == 0,
      "pre-filter returned fewer rows than post-filtering for some query")
    assert(both.filter(col("n_pre") > col("n_post")).count() > 0,
      "fixture never exercises the underfill divergence — weaken of the test's point")
  }
}
