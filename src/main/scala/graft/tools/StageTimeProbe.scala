package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Per-stage wall/cpu breakdown of a query's WARM run — the follow-up
  * to [[JobCountProbe]] when ms/job says a query is doing real work in
  * steady state and the question becomes WHICH stage. Prints each
  * completed stage's duration, task count, and the first line of its
  * name (the call site).
  *
  * Attribution caveat: SparkListener events arrive asynchronously;
  * the sleeps around the buffer clear/print bound the lag but do not
  * eliminate it — on a heavily loaded box a warm-up stage can land in
  * the measured list (or a measured straggler drop out). Treat a
  * single anomalous stage row as suspect and re-run; the probe is a
  * diagnosis aid, not an artifact generator.
  *
  * Usage: runMain graft.tools.StageTimeProbe <sfDir> <query>
  */
object StageTimeProbe {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println("usage: StageTimeProbe <sfDir> <query>")
      sys.exit(2)
    }
    val Array(sf, name) = args.take(2)
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt, "graft-stagetime")
    spark.sparkContext.setLogLevel("ERROR")
    val buf = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val ms = (for {st <- i.submissionTime; ct <- i.completionTime} yield ct - st)
          .getOrElse(-1L)
        val m = i.taskMetrics
        buf.add(f"[stage] ${i.stageId}%4d ${ms}%6d ms ${i.numTasks}%4d tasks  " +
          f"in ${m.inputMetrics.recordsRead}%9d rec  " +
          f"sr ${m.shuffleReadMetrics.recordsRead}%9d  " +
          f"sw ${m.shuffleWriteMetrics.recordsWritten}%9d  " +
          f"cpu ${m.executorCpuTime / 1000000}%6d ms  " +
          i.name.linesIterator.next())
        ()
      }
    })
    val fn = graft.SparkEntry.queries(name)
    fn(spark, sf).count() // warm-up: populate memos
    Thread.sleep(300)
    buf.clear()
    val t0 = System.nanoTime()
    val warm = fn(spark, sf)
    warm.count()
    println(f"[total] ${(System.nanoTime() - t0) / 1e9}%.3f s warm")
    Thread.sleep(300)
    buf.forEach(println)
    spark.sparkContext.getRDDStorageInfo.foreach { r =>
      println(f"[cache] ${r.numCachedPartitions}%3d/${r.numPartitions}%3d parts " +
        f"${r.memSize / 1024}%8d KiB  ${r.name}")
    }
    if (sys.env.contains("SPARK_GRAFT_PROBE_PLAN")) {
      val txt = warm.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      println("[plan] InMemoryTableScan count: " +
        txt.linesIterator.count(_.contains("InMemoryTableScan")))
      println(txt.linesIterator.filter(l =>
        l.contains("InMemory") || l.contains("Scan parquet")).mkString("\n"))
    }
    spark.stop()
  }
}
