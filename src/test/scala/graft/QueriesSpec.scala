package graft

import graft.streaming.SparkTestBase

/** Smoke: every registered query executes at sf0.001 and the flagship
  * returns rows (the t1 gate). Full value-level correctness is covered
  * by the DuckDB oracle gate (tools/local_verify.py). */
class QueriesSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"query $name executes") {
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty)
      assert(df.count() >= 0)
    }
  }

  test("s07 multi-probe dominates s06 single-probe per rank (candidate-set containment)") {
    // s06 searches only the query's own cell — exactly s07's
    // probe_rank-1 cell — so s07's candidate set is a superset and its
    // rank-r cosine can never be worse. A refactor that breaks cell
    // sharing between the two queries (drifting seeds or assignment)
    // shows up here as a dominance violation.
    import org.apache.spark.sql.functions.col
    def byRank(q: String): Map[(Long, Long), Double] =
      SparkEntry.queries(q)(spark, sf)
        .select(col("q_id"), col("rnk"), col("cosine"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val single = byRank("s06_ann_ivf")
    val multi = byRank("s07_ann_ivf_multiprobe")
    assert(single.nonEmpty)
    single.foreach { case (key, cos6) =>
      val cos7 = multi.getOrElse(key,
        fail(s"s07 lost a (q_id, rnk) pair s06 has: $key"))
      assert(cos7 >= cos6,
        s"multi-probe rank ${key._2} for query ${key._1} got WORSE: $cos7 < $cos6")
    }
  }
}
