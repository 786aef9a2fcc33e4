package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Times one query N times in a warm session — separates codegen/plan
  * compile cost (run 1) from steady-state execution (runs 2+). */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, name) = args.take(2)
    val n = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    // The driver session, not a bespoke builder: timings must measure
    // the plans Bench/Verify run — including the injected extensions
    // (d13's CapCollectBuckets rewrite exists only with them).
    val spark = graft.GraftSession.local(cpus, "graft-timequery")
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    (1 to n).foreach { i =>
      val t0 = System.nanoTime()
      val c = fn(spark, sfDir).count()
      println(f"[time] run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s (rows $c)")
    }
    spark.stop()
  }
}
