package graft.tools

import graft.SparkEntry

/** Times the CC-label consumer chain (m09 → m10 → m13) twice each in
  * ONE warm session — the Bench-shaped measurement behind the r13
  * label-materialization decision: the three queries shared the memoized
  * m07∪m08 EDGE list (r12) but each still re-ran the CC contraction
  * per call. Run before/after any change to how labels are served.
  *
  *   sbt "runMain graft.tools.CcConsumersProbe /root/testdata/sf0.1"
  */
object CcConsumersProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val qs = if (args.length > 1) args.drop(1).toSeq
      else Seq("m09_media_dedup_clusters", "m10_media_survivors",
        "m13_media_curation_card")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val spark = graft.GraftSession.local(cpus, "graft-cc-probe")
    spark.sparkContext.setLogLevel("WARN")
    for (q <- qs; i <- 1 to 2) {
      val t0 = System.nanoTime()
      val c = SparkEntry.queries(q)(spark, dir).count()
      println(f"[probe] $q run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s (rows $c)")
    }
    spark.stop()
  }
}
