package graft.tools

import graft.GraftSession

/** Prints post-execution plan fingerprints for the given queries —
  * run twice in separate JVMs and diff to catch run-varying tokens the
  * [[PlanFingerprint]] normalizer misses (that is exactly how the
  * lambda-identity leak in the m-family fingerprints was found, r8).
  *
  * Usage: runMain graft.tools.FpProbe [-dump] <sfDir> <query ...>
  * With `-dump`, the NORMALIZED plan text prints between markers so
  * two runs' dumps can be diffed directly.
  */
object FpProbe {
  def main(args: Array[String]): Unit = {
    val dump = args.headOption.contains("-dump")
    val rest = if (dump) args.drop(1) else args
    val sf = rest.head
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt, "graft-fp-probe")
    spark.sparkContext.setLogLevel("ERROR")
    rest.drop(1).foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sf)
      df.count() // AQE must finalize first
      println(s"$name ${PlanFingerprint(df)}")
      if (dump) {
        println(s"----- $name normalized -----")
        println(PlanFingerprint.normalize(df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))))
        println(s"----- end $name -----")
      }
    }
    spark.stop()
  }
}
