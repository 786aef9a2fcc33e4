package graft.queries

import org.apache.spark.sql.functions._

/** d22 contract: the incremental near-dup pass routes on REAL Jaccard
  * — every flagged ingest doc's winning index doc verifies against an
  * independent trigram-set replica (plain Scala strings, not the
  * hashed-gram pipeline) — and the probed index is the disk
  * materialization, not a base recompute. */
class IncrementalLshSpec extends graft.streaming.SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  /** The gramsDuck trigram rule in plain Scala: distinct word
    * trigrams, whole text when shorter than 3 words. */
  private def grams(text: String): Set[String] = {
    val w = text.split(" ", -1)
    if (w.length >= 3) w.sliding(3).map(_.mkString(" ")).toSet else Set(text)
  }

  test("d22: flagged rows verify against an independent trigram Jaccard replica") {
    val rows = graft.SparkEntry.queries("d22_incremental_lsh")(spark, sf).collect()
    assert(rows.length == graft.Tables.documents(spark, sf)
      .filter(col("doc_id") % 10 === 0).count())
    val flagged = rows.filter(_.getAs[Boolean]("is_neardup"))
    assert(flagged.nonEmpty, "no near-dups flagged — the fixture measures nothing")
    val texts = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    flagged.foreach { r =>
      val (doc, idx) = (r.getAs[Long]("doc_id"), r.getAs[Long]("index_doc"))
      assert(idx >= 0 && idx % 10 != 0, s"index_doc $idx is not a base doc")
      assert(r.getAs[Long]("n_verified") > 0)
      val (ga, gb) = (grams(texts(doc)), grams(texts(idx)))
      val j = ga.intersect(gb).size.toDouble / ga.union(gb).size
      assert(j >= DedupQueries.JaccThreshold,
        s"flagged pair ($doc, $idx) has replica Jaccard $j < threshold")
      assert(r.getAs[Double]("best_jacc") + 1e-4 >= j,
        "best_jacc is below the winning pair's replica Jaccard")
    }
    rows.filterNot(_.getAs[Boolean]("is_neardup")).foreach { r =>
      assert(r.getAs[Long]("index_doc") == -1L)
      assert(r.getAs[Long]("n_verified") == 0L)
      assert(r.getAs[Double]("best_jacc") == 0.0)
    }
  }

  test("d22: the probed index is the materialization, not a base recompute") {
    val base = DedupQueries.lshBandsBase(spark, sf)
    val plan = graft.PlanTestUtils.formatted(base.queryExecution)
    assert(plan.contains("graft_memo"),
      "base band index is not served from the diskMemo materialization")
    assert(!plan.contains("documents"),
      "the probe path still carries the base-corpus lineage")
  }
}
