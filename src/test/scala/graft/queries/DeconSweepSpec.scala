package graft.queries

import org.apache.spark.sql.functions.col

/** s22 contract (r13 judge ask #4): the IVF-probed decontamination
  * sweep is s19's costed escape hatch, so its recall must be MEASURED
  * against the exact pass — and provably exact when the index prunes
  * nothing. */
class DeconSweepSpec extends graft.streaming.SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  import SimilarityQueries._

  test("probing every cell reproduces the exact pass: recall 1.0, identical leak count") {
    // maxProbe = IvfKCap >= K reaches every cell, so the probed top-k
    // IS the exact top-k — any shortfall here means the probed path
    // scores or ranks differently from s19, not that the index pruned.
    val row = deconIvfSweep(spark, sf, maxProbe = IvfKCap, levels = Seq(IvfKCap))
      .collect().head
    val (nTruth, nHits) = (row.getAs[Long]("n_truth"), row.getAs[Long]("n_hits"))
    assert(nTruth > 0, "empty truth set — the split produced no eval docs")
    assert(nHits == nTruth, s"full-probe sweep missed truth pairs: $nHits/$nTruth")
    assert(row.getAs[Double]("recall") == 1.0)
    assert(row.getAs[Long]("n_leaked_probed") == row.getAs[Long]("n_leaked_exact"),
      "full-probe leak count diverged from the exact pass")
  }

  test("recall is within [0,1] and non-decreasing in nProbe; candidates grow") {
    val rows = deconIvfSweep(spark, sf).orderBy(col("n_probe")).collect()
    assert(rows.length == DeconMaxProbe)
    val recalls = rows.map(_.getAs[Double]("recall"))
    assert(recalls.forall(r => r >= 0.0 && r <= 1.0))
    assert(recalls.sliding(2).forall(w => w.length < 2 || w(0) <= w(1)),
      s"recall regressed as nProbe grew: ${recalls.mkString(", ")}")
    val cands = rows.map(_.getAs[Long]("n_candidates"))
    assert(cands.sliding(2).forall(w => w.length < 2 || w(0) <= w(1)),
      "candidate count shrank as nProbe grew")
    // the index actually prunes at nProbe=1: strictly fewer candidates
    // than the full-probe scan (otherwise the sweep measures nothing)
    val full = deconIvfSweep(spark, sf, maxProbe = IvfKCap, levels = Seq(IvfKCap))
      .collect().head.getAs[Long]("n_candidates")
    assert(cands.head < full,
      s"nProbe=1 scanned as much as the full scan ($full) — no pruning measured")
  }
}
