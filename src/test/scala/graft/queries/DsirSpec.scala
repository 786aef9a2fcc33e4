package graft.queries

import org.apache.spark.sql.functions._

/** t20 DSIR contracts beyond the oracle gate (which pins cross-engine
  * exactness of every integer weight):
  *
  *  1. the model is genuinely discriminative on the fixture: the
  *     target slice (`en`) scores a higher mean importance weight
  *     than the non-target slice — DSIR's eq. (2) sanity, without
  *     which the weights rank nothing;
  *  2. the bucket LUT is bounded at B rows with every log-ratio built
  *     from positive counts — the broadcast-fit contract (the model,
  *     not the corpus, is what ships to executors);
  *  3. weights are exact integers: u = Σ lw − n_grams·lnorm recomputed
  *     from the LUT agrees row-for-row with the query's own fold.
  */
class DsirSpec extends graft.streaming.SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  import TextQueries._

  test("target slice outscores non-target on mean importance weight") {
    // dsirPerDoc is session-memoized (r18) — already persisted, no
    // extra cache() here (an extra handle would need its own
    // unpersist hygiene; see the t21 test below).
    val pd = dsirPerDoc(spark, sf)
    def meanU(f: org.apache.spark.sql.DataFrame): Double =
      f.agg((sum(col("u")).cast("double") / count(lit(1))).as("m")).head().getDouble(0)
    val meanTarget = meanU(pd.filter(col("lang") === "en"))
    val meanOther = meanU(pd.filter(col("lang") =!= "en"))
    assert(meanTarget > meanOther,
      s"en mean weight $meanTarget should exceed non-en $meanOther")
  }

  test("bucket LUT is bounded at B rows, counts positive where grams exist") {
    val lut = dsirLut(spark, sf) // session-memoized, already persisted
    val n = lut.count()
    assert(n > 0 && n <= 256, s"LUT has $n rows, expected (0, 256]")
    // raw count covers the target count bucket-wise (target ⊆ raw)
    assert(lut.filter(col("nt") > col("nr")).count() == 0)
    assert(lut.filter(col("nr") <= 0).count() == 0)
  }

  test("t21 selection respects every source's token budget and is non-degenerate") {
    // cache() for the three counts, but UNPERSIST before leaving: a
    // leaked full-query cache entry is substituted into any later
    // structurally-equal t21 plan in this JVM (CacheManager matches
    // canonicalized plans), which blinded PlanShapeSpec's window
    // assertions once the r18 perdoc memo made the plans align.
    val sel = graft.SparkEntry.queries("t21_dsir_select")(spark, sf).cache()
    try {
      assert(sel.filter(col("selected_tokens") > col("budget_tokens")).count() == 0)
      assert(sel.filter(col("n_selected") < 1).count() == 0,
        "a source selected nothing — budget or weighting degenerate on the fixture")
      assert(sel.filter(col("n_selected") >= col("n_docs")).count() == 0,
        "a source selected everything — the 2/5 budget is not binding on the fixture")
    } finally { sel.unpersist(); () }
  }

  test("per-doc weight is the exact integer LUT fold") {
    val pd = dsirPerDoc(spark, sf).select(col("doc_id"), col("n_grams"),
      col("sum_lw"), col("lnorm"), col("u"))
    val wrong = pd.filter(
      col("u") =!= col("sum_lw") - col("n_grams") * col("lnorm")).count()
    assert(wrong == 0)
    assert(pd.count() > 0)
  }
}
