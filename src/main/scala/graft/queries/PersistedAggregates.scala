package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.concurrent.TrieMap

/** Memoized `.persist()` for the queries whose returned LAZY plan reads
  * a cached mid-aggregate twice (a18/a31/a36/t11): the plan still
  * references the cache when the method returns, so the method itself
  * can never unpersist — but WITHOUT memoization every invocation of
  * the registered query in a long-lived session pinned a FRESH cache
  * entry (same bytes, new relation), growing cache population
  * monotonically until memory pressure forced LRU eviction. One entry
  * per (session, query, dir) caps that population at the number of
  * distinct persisted aggregates.
  *
  * Entry lifetime is honest, not magical: the cached DataFrames hold
  * strong references to their own SparkSession, so the WeakHashMap's
  * weak keys alone can never collect an entry (the classic
  * value-references-key trap) — instead every memo() call sweeps
  * entries whose underlying SparkContext has stopped, which is when
  * cached relations become unusable anyway. Population is bounded by
  * (#live sessions × #distinct persisted aggregates).
  *
  * `build` must return a plan that can RECOMPUTE after cache eviction
  * (a scan/aggregate over the source tables). Never memo a
  * checkpoint-backed result: its "recompute" bottoms out at
  * executor-local blocks, turning an executor loss into a permanent
  * failure for the rest of the session (why d12 rebuilds its CC labels
  * per call instead of using this). */
private[queries] object PersistedAggregates {

  private val bySession =
    new java.util.WeakHashMap[SparkSession, TrieMap[(String, String), DataFrame]]()

  /** The persisted `build` result for (`s`, `key`, `dir`), built and
    * persisted once. `build` must be deterministic for the key (all
    * callers pass a closed-over plan over the `dir` tables). */
  def memo(s: SparkSession, key: String, dir: String)(build: => DataFrame): DataFrame = {
    val perSession = bySession.synchronized {
      val it = bySession.entrySet().iterator()
      while (it.hasNext) {
        if (it.next().getKey.sparkContext.isStopped) it.remove()
      }
      bySession.computeIfAbsent(s, _ => TrieMap.empty)
    }
    perSession.getOrElseUpdate((key, dir), build.persist())
  }

  private val diskPaths = TrieMap.empty[(String, String), String]

  /** Disk-MATERIALIZED memo for results whose build is checkpoint-backed
    * and therefore banned from [[memo]] (CC labels: localCheckpoint
    * truncates lineage, so a persist()'s "recompute after eviction"
    * bottoms out at executor-local blocks — an executor loss becomes a
    * permanent failure). Writing the frame to parquet once and serving
    * every later consumer from the SCAN removes that hazard instead of
    * working around it: the file survives executor loss, the returned
    * plan is scan-rooted, and this is exactly what a production
    * pipeline does with a cluster map anyway (materialize it as a
    * table; three downstream jobs read it). Keyed by (key, dir) across
    * sessions — the builds are deterministic functions of the dir
    * tables (the memo contract), so a second session reuses the file
    * rather than rewriting it. Measured (CcConsumersProbe, sf0.1,
    * warm): m09/m10/m13 each re-ran the CC contraction at 1.4-1.8 s;
    * label-serving consumers drop to the ~0.3 s scan+join tail. */
  def diskMemo(s: SparkSession, key: String, dir: String)(build: => DataFrame): DataFrame = {
    val path = diskPaths.getOrElseUpdate((key, dir), {
      val base = java.nio.file.Files.createTempDirectory(s"graft-memo-$key-")
      val p = base.resolve("data").toString
      build.write.mode("overwrite").parquet(p)
      base.toFile.deleteOnExit()
      p
    })
    s.read.parquet(path)
  }
}
