package graft.queries

/** t18 steady-state decomposition (r16 verdict ask #6): after one
  * warm run populates the memos, times (a) a bare count over the
  * memoized perDoc frame, (b) the full query. If (a) is cheap and (b)
  * is not, the residual is t18's own post-memo machinery (bounds +
  * ntile + rollup); if (a) is expensive, the memo is not serving.
  * Lives in graft.queries for PersistedAggregates access — a probe,
  * not a query (the tools/ convention).
  *
  * Usage: runMain graft.queries.T18Probe <sfDir>
  */
object T18Probe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt, "graft-t18probe")
    spark.sparkContext.setLogLevel("ERROR")
    def time(label: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"[t18] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s (rows $n)")
    }
    val fn = graft.SparkEntry.queries("t18_lm_quality_filter")
    time("cold full query")(fn(spark, sf).count())
    // memo hit: the build closure must not run (it throws if it does)
    val perDoc = PersistedAggregates.memo(spark, "t18_perdoc", sf) {
      throw new IllegalStateException("t18_perdoc memo MISS on a warm session")
    }
    time("warm perDoc count")(perDoc.count())
    time("warm perDoc count again")(perDoc.count())
    val c2 = PersistedAggregates.memo(spark, "t18_c2", sf) {
      throw new IllegalStateException("t18_c2 memo MISS on a warm session")
    }
    time("warm c2 count")(c2.count())
    time("warm full query")(fn(spark, sf).count())
    val df = fn(spark, sf)
    time("warm full query again")(df.count())
    if (sys.env.contains("SPARK_GRAFT_PROBE_PLAN")) {
      // post-execution: AQE final plan, with cached relations as leaves
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
