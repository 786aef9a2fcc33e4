package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** Dev probe: print the fitted IVF centroids (round 1 or 2) so they can
  * be diffed against the DuckDB twin component-by-component. */
object KmProbe {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = GraftSession.local(8, "km-probe")
    spark.sparkContext.setLogLevel("WARN")
    val e = graft.queries.SimilarityQueries.vecs(spark, sf)
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val k = graft.queries.SimilarityQueries.fitCentroids(e).count() // unmemoized fit
      println(f"[fit] run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s (cells $k, vecs ${e.count()})")
    }
    val cent = graft.queries.SimilarityQueries.ivfCentroids(spark, sf)
    cent.select(col("s_id"), col("sn"),
        expr("CAST(sv[0] AS DOUBLE)").as("c0"), expr("CAST(sv[1] AS DOUBLE)").as("c1"))
      .orderBy(col("s_id")).limit(3)
      .collect()
      .foreach(r => println(s"${r.getLong(0)} ${r.getDouble(1)} ${r.getDouble(2)} ${r.getDouble(3)}"))
    spark.stop()
  }
}
