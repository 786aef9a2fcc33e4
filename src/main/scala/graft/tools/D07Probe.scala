package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** Stage-level timing decomposition of d07 (the bench's most expensive
  * query): upstream verified-pair generation vs the CC loop vs the
  * final labeling/window. Drives optimization at the right layer —
  * round-5's audit put the floor at "upstream + rounds × fixed
  * overhead"; this measures both terms directly.
  *
  * Usage: runMain graft.tools.D07Probe [sfDir] [iters]
  */
object D07Probe {
  def main(args: Array[String]): Unit = {
    val sf = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val iters = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "graft-d07-probe")
    spark.sparkContext.setLogLevel("WARN")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[d07probe] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    // The REAL d07 upstream (package-private seam): raw-jacc filter,
    // no rounding, no d04 output sort — a d04-based approximation
    // differed on both (rounded threshold admits jacc ∈ [0.69995, 0.7);
    // the global orderBy adds a sort d07 never pays).
    def pairs() = graft.queries.DedupQueries.jaccardPairs(spark, sf)
      .filter(col("jacc") >= graft.queries.DedupQueries.JaccThreshold)
      .select(col("doc_a"), col("doc_b"))

    val full = graft.SparkEntry.queries("d07_dedup_clusters")
    full(spark, sf).count() // warm
    (1 to iters).foreach { i =>
      println(s"--- iter $i ---")
      time("upstream pairs")(pairs().count())
      val edges = time("pairs + localCheckpoint")(
        pairs().localCheckpoint(eager = true))
      time("cc on materialized edges")(
        graft.operators.ConnectedComponents.run(edges, "doc_a", "doc_b").count())
      time("full d07")(full(spark, sf).count())
    }
    spark.stop()
  }
}
