package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** s23's contracts (r14 verdict ask #3): the ingest path must NOT
  * refit — the served centroids are bit-identical to the pre-ingest
  * fit — and the health metric the report ships must move monotonely
  * with how far off-distribution the ingest is (the re-fit trigger
  * direction). */
class IngestSpec extends graft.streaming.SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  import SimilarityQueries._

  /** 2-dim float vectors from explicit (id, x, y) rows. */
  private def fvecs(rows: Seq[(Long, Float, Float)]): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    rows.toDF("vec_id", "x", "y")
      .select(col("vec_id"), array(col("x"), col("y")).as("v"))
      .withColumn("nrm", expr("sqrt(graft_dot(v, v))"))
  }

  private def centKey(df: DataFrame): Seq[(Long, Seq[Float], Double)] =
    df.select(col("s_id"), col("sv"), col("sn")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1), r.getDouble(2)))
      .sortBy(_._1).toSeq

  test("no-refit: served centroids are bit-identical to the pre-ingest fit (real corpus)") {
    // The query's index IS fitCentroids over the base slice — no
    // ingest row can reach it by construction; this pins that the
    // registered seam stays that way (a future 'refresh' that sneaks
    // the ingest slice into the fit breaks bit-identity here).
    val base = vecs(spark, sf).filter(col("vec_id") % IngestMod =!= 0)
    val pre = centKey(fitCentroids(base))
    val served = centKey(ingestBaseCentroids(spark, sf))
    assert(served == pre,
      "s23's served centroids drifted from the pre-ingest fit — a refit leaked in")
    // and the merged-refit counterfactual is genuinely different, so
    // the identity above is not vacuous
    val refit = centKey(fitCentroids(vecs(spark, sf)))
    assert(refit != pre,
      "fixture too degenerate: merged refit equals the base fit, the no-refit pin proves nothing")
  }

  test("no-refit on a constructed fixture: off-distribution ingest cannot move the fit") {
    val base = fvecs((1L to 60L).map(i => (i, 1.0f, ((i % 7) - 3).toFloat / 10f)))
    val ingest = fvecs((101L to 140L).map(i => (i, -1.0f, (i % 5).toFloat)))
    val pre = centKey(fitCentroids(base))
    // "ingest arrives": assignment runs against the fitted frame; the
    // fit itself is untouched — re-evaluating it is bit-identical
    assignCells(ingest, fitCentroids(base)).count()
    assert(centKey(fitCentroids(base)) == pre)
    assert(centKey(fitCentroids(base.union(ingest))) != pre,
      "a refit over the merged set must differ on this far-off ingest")
  }

  test("health metric is monotone in ingest drift (the re-fit trigger direction)") {
    // Base: a tight cluster around (1, ~0) so the fitted centroid sits
    // there; ingest batches at increasing angle fit the old cells
    // strictly worse — mean assigned cosine must fall monotonely.
    val base = fvecs((1L to 64L).map(i => (i, 1.0f, ((i % 9) - 4).toFloat / 100f)))
    val cent = fitCentroids(base)
    def meanCosU(ing: DataFrame): Double = {
      val r = assignedCosHealth(ing, assignCells(ing, cent), cent).head()
      r.getLong(1).toDouble / r.getLong(0)
    }
    val ms = Seq(0.1, 0.5, 1.0, 1.4).zipWithIndex.map { case (a, k) =>
      meanCosU(fvecs((0 until 30).map(j =>
        (1000L + k * 100 + j, math.cos(a).toFloat, math.sin(a).toFloat))))
    }
    assert(ms.sliding(2).forall { case Seq(x, y) => x > y },
      s"mean assigned cosine must fall as ingest drifts: $ms")
  }

  test("s23 report closes: populations, drift sign consistency, serving shape (real corpus)") {
    val row = graft.SparkEntry.queries("s23_ann_ingest")(spark, sf).head()
    val nBase = row.getLong(row.fieldIndex("n_base"))
    val nIngest = row.getLong(row.fieldIndex("n_ingest"))
    assert(nBase + nIngest == vecs(spark, sf).count(),
      "base + ingest must partition the corpus")
    val drift = row.getDouble(row.fieldIndex("drift"))
    val pre = row.getDouble(row.fieldIndex("mean_cos_pre"))
    val post = row.getDouble(row.fieldIndex("mean_cos_post"))
    assert(math.abs((pre - post) - drift) < 1e-12,
      "drift must be exactly the pre/post mean difference")
    val nq = row.getLong(row.fieldIndex("n_queries"))
    val nr = row.getLong(row.fieldIndex("n_results"))
    assert(nq > 0 && nr == nq * 5,
      s"s07-shape serving must return exactly top-5 per served query ($nq queries, $nr rows)")
  }
}
