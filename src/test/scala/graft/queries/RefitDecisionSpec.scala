package graft.queries

/** s25 contract: the decision booleans are exactly the thresholds
  * applied to the in-row metrics (no hidden state), the metrics agree
  * with the reports they summarize (s18 imbalance, s23 drift, s24
  * deletion counts), and the table is non-degenerate on the driver
  * corpus — not all rules fire, not none. */
class RefitDecisionSpec extends graft.streaming.SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("s25: booleans derive from the in-row metrics; table is non-degenerate") {
    val r = graft.SparkEntry.queries("s25_refit_decision")(spark, sf).collect().head
    val drift = r.getAs[Double]("drift")
    val imb = r.getAs[Double]("imbalance")
    val tf = r.getAs[Double]("tombstone_frac")
    val emptied = r.getAs[Long]("n_cells_emptied")
    assert(r.getAs[Boolean]("refit_for_drift") ==
      (drift > SimilarityQueries.DriftTau))
    assert(r.getAs[Boolean]("refit_for_imbalance") ==
      (imb > SimilarityQueries.ImbalanceTau))
    assert(r.getAs[Boolean]("compact_for_garbage") ==
      (tf >= SimilarityQueries.GarbageTau || emptied > 0))
    assert(r.getAs[Boolean]("refit_needed") ==
      (r.getAs[Boolean]("refit_for_drift") || r.getAs[Boolean]("refit_for_imbalance")))
    val fired = Seq(r.getAs[Boolean]("refit_for_drift"),
      r.getAs[Boolean]("refit_for_imbalance"),
      r.getAs[Boolean]("compact_for_garbage"))
    assert(fired.exists(identity) && !fired.forall(identity),
      s"decision table is degenerate on this corpus: $fired")
  }

  test("s25: metrics agree with the reports they summarize") {
    val r = graft.SparkEntry.queries("s25_refit_decision")(spark, sf).collect().head
    val s18 = graft.SparkEntry.queries("s18_index_health")(spark, sf).collect().head
    assert(r.getAs[Double]("imbalance") == s18.getAs[Double]("imbalance"))
    assert(r.getAs[Long]("n_dead_seeds") == s18.getAs[Long]("n_dead_seeds"))
    val s23 = graft.SparkEntry.queries("s23_ann_ingest")(spark, sf).collect().head
    assert(r.getAs[Double]("drift") == s23.getAs[Double]("drift"))
    val s24 = graft.SparkEntry.queries("s24_ann_delete")(spark, sf).collect().head
    assert(r.getAs[Long]("n_deleted") == s24.getAs[Long]("n_deleted"))
    assert(r.getAs[Long]("n_cells_emptied") == s24.getAs[Long]("n_cells_emptied"))
  }
}
