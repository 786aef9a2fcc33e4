package graft.queries

/** t32 contract: the CMS one-sided error bound makes the SERVED set a
  * superset of the true heavy-hitter set — recall is exactly 1.0 and
  * every served estimate dominates its exact count. This is the
  * property that lets a production pipeline trust a sketch-only serve
  * path: it can over-serve (precision < 1), never under-serve. */
class CmsServeSpec extends graft.streaming.SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("served candidates dominate exact counts; recall is exactly 1.0") {
    val rows = graft.SparkEntry.queries("t32_cms_served_topk")(spark, sf).collect()
    assert(rows.nonEmpty, "the threshold selected no candidates")
    rows.foreach { r =>
      assert(r.getAs[Long]("est_count") >= r.getAs[Long]("exact_count"),
        s"CMS underestimated ${r.getAs[String]("term")}")
    }
    val head = rows.head
    val (nCand, nTrue, nExact) = (head.getAs[Long]("n_candidates"),
      head.getAs[Long]("n_true_hh"), head.getAs[Long]("n_exact_hh"))
    assert(nCand == rows.length, "summary candidate count != served rows")
    assert(nTrue == nExact, "a true heavy hitter was NOT served — the guarantee broke")
    assert(head.getAs[Double]("recall") == 1.0)
    assert(head.getAs[Double]("precision") == nTrue.toDouble / nCand)
    // the cut is meaningful on this corpus: a STRICT non-empty subset
    // of the vocabulary is served (a threshold outside the count
    // spread would select all-or-nothing and measure nothing)
    import org.apache.spark.sql.functions.{col, explode, split, countDistinct}
    val vocab = graft.Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("x"))
      .agg(countDistinct(col("x"))).collect().head.getLong(0)
    assert(nCand >= 1 && nCand < vocab,
      s"served $nCand of $vocab terms — the threshold does not discriminate")
    assert(rows.count(!_.getAs[Boolean]("is_true_hh")) == nCand - nTrue)
  }
}
