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
    new java.util.WeakHashMap[SparkSession, TrieMap[(String, String), (String, DataFrame)]]()

  /** Cheap source-staleness fingerprint for `dir`: FNV-1a over the
    * (name, length, mtime) of its listing, via the Hadoop FileSystem
    * of the path (works for local AND shared storage — no local-only
    * walk). Child DIRECTORIES are listed one level deep: a table
    * stored as `dir/t/part-*.parquet` on an object store exposes no
    * meaningful mtime/length on the synthetic directory entry itself,
    * so a top-level-only listing would miss its regeneration — the
    * child files are where the change is visible. One level bounds
    * the cost at (#tables + 1) listing RPCs per memo call — noise
    * next to any query it guards. The r11 hazard this closes: the
    * driver has regenerated the testdata parquet MID-SESSION; a memo
    * keyed only on (key, dir) then serves stale labels with no
    * canary. Unreachable listing ⇒ "na": the memo degrades to the
    * r13 same-key behavior instead of failing the query. */
  private def fingerprint(s: SparkSession, dir: String): String =
    try {
      val path = new org.apache.hadoop.fs.Path(dir)
      val fs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
      var h = -3750763034362895579L // FNV-1a 64 offset basis
      def mix(v: Long): Unit = { h ^= v; h *= 1099511628211L }
      def mixStatus(st: org.apache.hadoop.fs.FileStatus, recurse: Boolean): Unit = {
        mix(st.getPath.getName.hashCode.toLong)
        mix(st.getLen)
        mix(st.getModificationTime)
        if (recurse && st.isDirectory)
          fs.listStatus(st.getPath).sortBy(_.getPath.getName)
            .foreach(mixStatus(_, recurse = false))
      }
      fs.listStatus(path).sortBy(_.getPath.getName)
        .foreach(mixStatus(_, recurse = true))
      java.lang.Long.toHexString(h)
    } catch { case _: Throwable => "na" }

  /** Per-(key, dir) build locks: same-key first callers serialize (one
    * build), different keys proceed in parallel — memo() must not hold
    * a session-wide monitor across a build, because a build closure
    * may run a REAL Spark job (doc_decisions → docClusterLabels →
    * diskMemo's eager parquet write). */
  private val buildLocks =
    new java.util.concurrent.ConcurrentHashMap[(String, String), Object]()

  /** The persisted `build` result for (`s`, `key`, `dir`), built and
    * persisted once per source-dir fingerprint. `build` must be
    * deterministic for the key (all callers pass a closed-over plan
    * over the `dir` tables). A fingerprint change (source tables
    * regenerated) unpersists the stale entry and rebuilds. Locking is
    * per (key, dir) — a build closure may run a real Spark job (the
    * doc_decisions chain reaches diskMemo's eager write), so two
    * DIFFERENT keys must never serialize on each other; two callers
    * of the SAME key build once. */
  def memo(s: SparkSession, key: String, dir: String)(build: => DataFrame): DataFrame = {
    val perSession = bySession.synchronized {
      val it = bySession.entrySet().iterator()
      while (it.hasNext) {
        if (it.next().getKey.sparkContext.isStopped) it.remove()
      }
      bySession.computeIfAbsent(s, _ => TrieMap.empty)
    }
    val fp = fingerprint(s, dir)
    val lock = buildLocks.computeIfAbsent((key, dir), _ => new Object)
    lock.synchronized {
      perSession.get((key, dir)) match {
        // "na" (transient listing failure) serves whatever is cached —
        // the promised r13 degradation — instead of treating the
        // sentinel as a distinct fingerprint and churning
        // unpersist/rebuild for the duration of a storage hiccup
        case Some((oldFp, df)) if oldFp == fp || fp == "na" => df
        case stale =>
          stale.foreach { case (_, df) =>
            try df.unpersist() catch { case _: Throwable => () }
          }
          val df = build.persist()
          perSession.put((key, dir), (fp, df))
          df
      }
    }
  }

  private val diskPaths =
    new java.util.concurrent.ConcurrentHashMap[(String, String, String, String), String]()

  /** Latest materialization per (key, dir, warehouse) — the seam the
    * supersede-on-regeneration cleanup pivots on: (fingerprint, path). */
  private val diskLatest =
    new java.util.concurrent.ConcurrentHashMap[(String, String, String), (String, String)]()
  private val localCleanup = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  /** Superseded SHARED-storage materializations, deleted through their
    * FileSystem at shutdown (the local queue can't reach them and the
    * deployment shouldn't inherit per-JVM scratch copies). */
  private val sharedCleanup = new java.util.concurrent.ConcurrentLinkedQueue[
    (String, org.apache.hadoop.conf.Configuration)]()
  private lazy val cleanupHook: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      sharedCleanup.forEach { case (p, conf) =>
        try {
          val hp = new org.apache.hadoop.fs.Path(p)
          hp.getFileSystem(conf).delete(hp, true)
          ()
        } catch { case _: Throwable => () }
      }
      localCleanup.forEach { p =>
        try {
          val root = toLocalPath(p)
          if (root != null && java.nio.file.Files.exists(root)) {
            java.nio.file.Files.walk(root)
              .sorted(java.util.Comparator.reverseOrder())
              .forEach(q => { java.nio.file.Files.deleteIfExists(q); () })
            // drop the graft_memo parent too if this was its last entry
            try java.nio.file.Files.deleteIfExists(root.getParent)
            catch { case _: java.nio.file.DirectoryNotEmptyException => () }
          }
        } catch { case _: Throwable => () }
      }
    }))

  /** Local filesystem Path for `p`, or null when `p` lives on shared
    * storage (hdfs:/s3:/…) whose lifecycle the deployment owns. NOT
    * a bare `new URI(p)`: a scheme-less path with URI-illegal chars
    * (a space in the warehouse dir) must still clean up locally. */
  private def toLocalPath(p: String): java.nio.file.Path =
    if (p.startsWith("file:")) java.nio.file.Paths.get(java.net.URI.create(p))
    else if (p.contains("://")) null // remote scheme: deployment-owned
    else java.nio.file.Paths.get(p)

  /** Disk-MATERIALIZED memo for results whose build is checkpoint-backed
    * and therefore banned from [[memo]] (CC labels: localCheckpoint
    * truncates lineage, so a persist()'s "recompute after eviction"
    * bottoms out at executor-local blocks — an executor loss becomes a
    * permanent failure). Writing the frame to parquet once and serving
    * every later consumer from the SCAN removes that hazard instead of
    * working around it: the relation survives executor loss, the
    * returned plan is scan-rooted, and this is exactly what a
    * production pipeline does with a cluster map anyway (materialize
    * it as a table; three downstream jobs read it).
    *
    * The materialization lands under `spark.sql.warehouse.dir` — the
    * one location that is SHARED storage on a real cluster (a
    * driver-local java.io.tmpdir would silently shard the executors'
    * task commits across machines and serve a truncated relation).
    * Local mode resolves to a local dir, cleaned by a shutdown hook;
    * shared-storage schemes are left to the deployment's lifecycle.
    * A fresh UUID token per JVM avoids cross-run staleness when the
    * source tables regenerate between runs. Note the build runs
    * EAGERLY at first plan construction (a DataFrame must point at an
    * existing file) — consumers constructing plans purely for
    * inspection pay it once per JVM. Measured (CcConsumersProbe,
    * sf0.1, warm): m09/m10/m13 each re-ran the CC contraction at
    * 1.4-1.8 s; label-serving consumers drop to the ~0.3 s scan+join
    * tail. */
  def diskMemo(s: SparkSession, key: String, dir: String)(build: => DataFrame): DataFrame = {
    // the warehouse dir is part of the key: two sessions in one JVM
    // pointing at different warehouses (local dev + cluster) must not
    // serve each other's materialization paths. The source fingerprint
    // is part of the key too (r13 ADVICE): a mid-session testdata
    // regeneration gets a fresh materialization instead of stale
    // labels; and computeIfAbsent gives per-key atomicity, so
    // concurrent first callers of one key run the eager parquet write
    // exactly once (keys hashing to other bins proceed in parallel).
    val warehouse = s.conf.get("spark.sql.warehouse.dir")
    val fp = fingerprint(s, dir)
    // "na" (transient listing failure): serve the latest known
    // materialization rather than minting a sentinel-keyed copy —
    // the same degradation memo() applies. If the VERY FIRST call
    // hits the failure there is nothing cached yet and one
    // "na"-keyed copy is built below — bounded (one copy, shutdown-
    // cleaned) and only reachable on a storage hiccup at JVM start.
    if (fp == "na") {
      val cur = diskLatest.get((key, dir, warehouse))
      if (cur != null) return graft.Tables.readParquet(s, cur._2)
    }
    // The build runs OUTSIDE any ConcurrentHashMap mapping function:
    // a diskMemo build may itself call diskMemo (cellPairs builds on
    // refinedCells, r15), and a nested computeIfAbsent on the same map
    // throws "Recursive update". Per-key atomicity comes from the same
    // buildLocks discipline memo() uses — same-key first callers
    // serialize (one eager parquet write), different keys (including a
    // nested build's key) take different locks and never deadlock.
    val pathKey = (key, dir, warehouse, fp)
    var path = diskPaths.get(pathKey)
    if (path == null) {
      val lock = buildLocks.computeIfAbsent(("disk:" + key, dir), _ => new Object)
      lock.synchronized {
        path = diskPaths.get(pathKey)
        if (path == null) {
          val token = java.util.UUID.randomUUID().toString.take(8)
          val p = s"$warehouse/graft_memo/$key-$token"
          try build.write.mode("overwrite").parquet(p)
          catch {
            case e: Throwable =>
              // drop the partial write so a retry can't serve it
              try {
                val root = toLocalPath(p)
                if (root != null && java.nio.file.Files.exists(root))
                  java.nio.file.Files.walk(root)
                    .sorted(java.util.Comparator.reverseOrder())
                    .forEach(q => { java.nio.file.Files.deleteIfExists(q); () })
              } catch { case _: Throwable => () }
              throw e
          }
          cleanupHook
          localCleanup.add(p)
          diskPaths.put(pathKey, p)
          path = p
        }
      }
    }
    // Supersede (r14, revised twice): a fingerprint change (source
    // regenerated) RETIRES the previous materialization to the
    // shutdown cleanup instead of deleting it mid-run — an in-flight
    // plan over the old path keeps working. The r15 ADVICE hardening:
    // the update is a compute-MERGE, not an unconditional put — a
    // caller whose fingerprint was listed BEFORE a mid-run
    // regeneration must not overwrite 'latest' back to its stale
    // materialization (and queue the CURRENT shared copy for
    // deletion), because a later transient-"na" listing would then
    // serve the stale path. When two distinct fingerprints contend,
    // the dir is re-listed and the entry matching the FRESH listing
    // wins; only the losing copy is retired. Storage stays bounded at
    // one copy per regeneration per JVM lifetime, shared included.
    var retired: Option[String] = None
    diskLatest.compute((key, dir, warehouse), (_, cur) => {
      val (winner, r) = mergeLatest(cur, (fp, path), () => fingerprint(s, dir))
      retired = r
      winner
    })
    retired.foreach { p =>
      if (toLocalPath(p) == null)
        sharedCleanup.add((p, s.sparkContext.hadoopConfiguration))
    }
    // Schema-cached read (r19, Tables.readParquet): a materialization
    // path is immutable once written (UUID-tokenized), so the footer
    // schema-inference job spark.read.parquet() runs per CALL — and
    // every query invocation reconstructs its diskMemo scans — is pure
    // fixed cost after the first read (measured: 13 inference stages
    // inside one warm d23 run).
    graft.Tables.readParquet(s, path)
  }

  /** The supersede decision, pure so the race it closes is unit-
    * testable: which (fingerprint, path) stays 'latest' when `incoming`
    * lands on an existing `cur`, and which path (if any) is retired to
    * shutdown cleanup. Same fingerprint or same path passes through;
    * on a genuine contention the dir is re-listed and the entry
    * matching the FRESH listing wins — so a caller whose fingerprint
    * straddled a regeneration cannot roll 'latest' back to its stale
    * copy (it keeps serving its own consistent copy; only its copy is
    * retired). When neither matches (the dir moved again), the newest
    * build wins. */
  private[queries] def mergeLatest(
      cur: (String, String), incoming: (String, String),
      relist: () => String): ((String, String), Option[String]) =
    if (cur == null || cur._1 == incoming._1 || cur._2 == incoming._2)
      (incoming, None)
    else {
      val now = relist()
      if (now == cur._1 && now != incoming._1) (cur, Some(incoming._2))
      else (incoming, Some(cur._2))
    }
}
