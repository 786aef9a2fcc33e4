package graft.queries

import graft.streaming.SparkTestBase
import org.apache.spark.sql.functions._

/** s27 contract — the refit actually EXECUTES what s25 decided:
  *
  *  1. the decision fires on the driver corpus (refit_needed via the
  *     imbalance trigger at every SF) — otherwise s27 would silently
  *     exercise the no-op branch while its twin encodes the refit;
  *  2. the refit state is PHYSICAL (scan-rooted diskMemo parquet, so
  *     supersede/retire + shutdown cleanup apply) and is a genuinely
  *     NEW fit: centroids differ from the serving fit, and the
  *     re-assignment covers exactly the live population — no
  *     tombstoned vector is in the new index;
  *  3. the report's improvement booleans are exactly the integer/
  *     double comparisons of its own columns (self-consistency — the
  *     cross-engine value pin is the driver's s27 hash gate);
  *  4. serving still works over the refit state: every sample query
  *     gets its full top-5 and no tombstone is served.
  */
class RefitExecutionSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("the s25 refit decision fires on the driver corpus") {
    val d = graft.SparkEntry.queries("s25_refit_decision")(spark, sf).head
    assert(d.getAs[Boolean]("refit_needed"),
      "fixture does not trigger a refit — s27 would test the no-op branch")
  }

  test("refit state is scan-rooted, tombstone-free, and a genuinely new fit") {
    val e = SimilarityQueries.vecs(spark, sf)
    val tomb = SimilarityQueries.tombstones(e)
    val (newCent, newAsg) = SimilarityQueries.refitState(spark, sf)

    assert(newCent.inputFiles.exists(_.contains("graft_memo/ivf_centroids_refit")) &&
      newAsg.inputFiles.exists(_.contains("graft_memo/ivf_asg_refit")),
      "refit state is not served from its materialization")

    // exactly the live population, re-assigned once each
    val live = SimilarityQueries.liveVecs(spark, sf)
    assert(newAsg.join(tomb, "vec_id").isEmpty,
      "tombstoned vec_id present in the refit assignment")
    assert(newAsg.count() == live.count() &&
      newAsg.select("vec_id").distinct().count() == live.count())

    // the fit changed: a refit that reproduces the old centroids
    // verbatim would make the before/after comparison vacuous
    val oldCent = SimilarityQueries.ivfCentroids(spark, sf)
      .collect().map(_.toString).toSet
    val refitCent = newCent.collect().map(_.toString).toSet
    assert(oldCent != refitCent, "refit centroids identical to the serving fit")
  }

  test("report booleans are the exact comparisons of the report's own columns") {
    val r = graft.SparkEntry.queries("s27_refit_execution")(spark, sf).head
    assert(r.getAs[Boolean]("health_improved") ==
      (r.getAs[Long]("sum_cos_new_u") >= r.getAs[Long]("sum_cos_old_u")))
    assert(r.getAs[Boolean]("imbalance_improved") ==
      (r.getAs[Double]("imbalance_new") <= r.getAs[Double]("imbalance_old")))
    // both healths run over the same live population
    assert(r.getAs[Long]("n_live") > 0)
    // the TRIGGER is asserted separately from the improvement (r17
    // ADVICE): a broken refit shows up as the trigger not firing or
    // the self-consistency above breaking, independent of whether
    // Lloyd happened to help.
    assert(r.getAs[Double]("imbalance_old") > SimilarityQueries.ImbalanceTau,
      "the imbalance trigger s25 fired on is not visible in the report")
    // FIXTURE PIN, not a refit invariant: a Lloyd refit over the live
    // population does not guarantee the FAISS imbalance factor
    // decreases. On the driver corpus it does at every SF (r17); a
    // regenerated fixture failing HERE (with the two assertions above
    // green) means a benign non-improvement, not a broken refit.
    assert(r.getAs[Boolean]("imbalance_improved"),
      "fixture pin: the refit no longer improves the imbalance on this corpus " +
        "(benign if the trigger + self-consistency assertions above still hold)")
  }

  test("serving over the refit state answers every query, tombstone-free") {
    val e = SimilarityQueries.vecs(spark, sf)
    val tombIds = SimilarityQueries.tombstones(e).collect()
      .map(_.getAs[Long]("vec_id")).toSet
    val (newCent, newAsg) = SimilarityQueries.refitState(spark, sf)
    val served = SimilarityQueries.serveOverAssignment(
      SimilarityQueries.probeTopCells(e, newCent, SimilarityQueries.IngestProbes),
      e, newAsg).collect()
    assert(served.nonEmpty)
    assert(served.forall(r => !tombIds(r.getAs[Long]("c_id"))),
      "a tombstoned vector was served from the refit index")
    val perQuery = served.groupBy(_.getAs[Long]("q_id")).map(_._2.length)
    assert(perQuery.forall(_ == 5), "a sample query lost results after the refit")
  }
}
