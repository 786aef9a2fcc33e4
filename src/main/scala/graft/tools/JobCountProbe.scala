package graft.tools

import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}

/** Measures where a small-SF query's steady-state time actually goes:
  * counts Spark jobs and stages for one warm invocation (memoized
  * frames populated by a first run). A query whose steady state is
  * `jobs × scheduler floor` rather than data movement — the s12/s13
  * profile: many broadcast builds, each its own job — is paying fixed
  * overhead that amortizes away at production scale, and the right
  * response is to leave the plan alone. This probe is the evidence.
  *
  * Usage: runMain graft.tools.JobCountProbe <sfDir> <query ...>
  */
object JobCountProbe {
  def main(args: Array[String]): Unit = {
    val sf = args.head
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt, "graft-jobcount")
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = { stages.incrementAndGet(); () }
    })
    args.drop(1).foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      fn(spark, sf).count() // warm: populates session memos
      Thread.sleep(200)     // let straggler listener events drain
      jobs.set(0); stages.set(0)
      val t0 = System.nanoTime()
      fn(spark, sf).count()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200)
      println(f"[jobs] $name: ${jobs.get}%d jobs, ${stages.get}%d stages, " +
        f"$sec%.3f s warm (${sec * 1000 / math.max(jobs.get, 1)}%.0f ms/job)")
    }
    spark.stop()
  }
}
