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
}
