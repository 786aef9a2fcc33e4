package graft.queries

/** Repo-wide plan guard: anti-patterns that must never appear in ANY
  * registered query's physical plan, whatever the query. A Cartesian
  * product is always a bug at 100 TB — every join in this library is
  * either an equi-join or a deliberate broadcast of a tiny (usually
  * 1-row scalar) side, which plans as BroadcastNestedLoopJoin, never
  * CartesianProduct. */
class PlanGuardSpec extends graft.streaming.SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name plans no CartesianProduct") {
      val text = fn(spark, sf).queryExecution.executedPlan.toString
      assert(!text.contains("CartesianProduct"),
        s"$name planned a CartesianProduct:\n$text")
    }
  }
}
