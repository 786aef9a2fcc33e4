package graft.tools

/** Decomposes a query's WARM wall time into driver-side phases:
  * DataFrame construction (plan build + eager analysis), physical
  * planning (`executedPlan` materialization), and execution (the
  * count). When stages sum to a fraction of the warm wall
  * ([[StageTimeProbe]]), this probe says whether the rest is plan
  * construction, optimization, or execution-time driver overhead
  * (AQE re-optimization, job submission gaps).
  *
  * Usage: runMain graft.tools.DriverTimeProbe <sfDir> <query ...>
  */
object DriverTimeProbe {
  def main(args: Array[String]): Unit = {
    val sf = args.head
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt, "graft-drivertime")
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(1).foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      fn(spark, sf).count() // warm: populates session memos
      val t0 = System.nanoTime()
      val df = fn(spark, sf)
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan
      val t2 = System.nanoTime()
      df.count()
      val t3 = System.nanoTime()
      def ms(a: Long, b: Long) = (b - a) / 1e6
      println(f"[driver] $name: construct ${ms(t0, t1)}%7.1f ms  " +
        f"plan ${ms(t1, t2)}%7.1f ms  execute ${ms(t2, t3)}%7.1f ms  " +
        f"total ${ms(t0, t3)}%7.1f ms")
    }
    spark.stop()
  }
}
