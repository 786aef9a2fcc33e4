package graft.queries

import java.nio.file.Files

/** The r11 hazard, made a contract: the driver HAS regenerated the
  * testdata parquet mid-session. Both memo flavors key on a source-dir
  * fingerprint (listing name/size/mtime), so a regeneration rebuilds
  * instead of serving stale rows. */
class MemoStalenessSpec extends graft.streaming.SparkTestBase {

  /** Writes `rows` ids as a 1-file parquet table under `dir`/t. Row
    * count differs per call, so size (not just mtime granularity)
    * flips the fingerprint. */
  private def writeTable(dir: String, rows: Long): Unit =
    spark.range(rows).coalesce(1).write.mode("overwrite").parquet(s"$dir/t")

  test("memo rebuilds after the source dir regenerates") {
    val dir = Files.createTempDirectory("graft_memo_stale").toString
    writeTable(dir, 3)
    var builds = 0
    def call() = PersistedAggregates.memo(spark, "spec_memo_stale", dir) {
      builds += 1; spark.read.parquet(s"$dir/t")
    }.count()
    assert(call() == 3 && builds == 1)
    assert(call() == 3 && builds == 1, "unchanged dir must serve the memo")
    writeTable(dir, 5)
    assert(call() == 5, "regenerated dir served stale rows")
    assert(builds == 2, "regeneration did not trigger a rebuild")
  }

  test("concurrent same-key memo callers build exactly once") {
    val dir = Files.createTempDirectory("graft_memo_conc").toString
    writeTable(dir, 6)
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    try {
      val futures = (1 to 4).map { _ =>
        pool.submit(new java.util.concurrent.Callable[Long] {
          def call(): Long =
            PersistedAggregates.memo(spark, "spec_memo_conc", dir) {
              builds.incrementAndGet(); spark.read.parquet(s"$dir/t")
            }.count()
        })
      }
      assert(futures.map(_.get()).forall(_ == 6))
      assert(builds.get() == 1,
        s"per-key lock failed: ${builds.get()} builds for one key")
    } finally pool.shutdown()
  }

  test("diskMemo rebuilds after the source dir regenerates") {
    val dir = Files.createTempDirectory("graft_diskmemo_stale").toString
    writeTable(dir, 4)
    var builds = 0
    def call() = PersistedAggregates.diskMemo(spark, "spec_diskmemo_stale", dir) {
      builds += 1; spark.read.parquet(s"$dir/t")
    }.count()
    assert(call() == 4 && builds == 1)
    assert(call() == 4 && builds == 1, "unchanged dir must serve the materialization")
    writeTable(dir, 7)
    assert(call() == 7, "regenerated dir served a stale materialization")
    assert(builds == 2, "regeneration did not trigger a rematerialization")
    // The superseded copy is RETIRED, not deleted mid-run (in-flight
    // plans over it keep working; the shutdown hook reclaims it) — so
    // after one regeneration exactly two copies exist: the retired
    // one and the live one. Bounded, never unbounded growth.
    val whConf = spark.conf.get("spark.sql.warehouse.dir")
    val wh = if (whConf.startsWith("file:"))
      java.nio.file.Paths.get(java.net.URI.create(whConf)).toString else whConf
    val copies = Option(new java.io.File(wh, "graft_memo").listFiles()).getOrElse(Array())
      .filter(_.getName.startsWith("spec_diskmemo_stale-"))
    assert(copies.length == 2,
      s"expected retired + live materializations, found ${copies.map(_.getName).toSeq}")
  }

  test("diskMemo 'latest' merge: a straddling stale writer cannot roll latest back (r15 ADVICE)") {
    import PersistedAggregates.mergeLatest
    // no contention: first entry, same fingerprint, same path pass through
    assert(mergeLatest(null, ("f1", "p1"), () => fail("must not re-list")) ==
      (("f1", "p1"), None))
    assert(mergeLatest(("f1", "p1"), ("f1", "p1b"), () => fail("must not re-list")) ==
      (("f1", "p1b"), None))
    // the hazard: incoming fingerprint was listed BEFORE a mid-run
    // regeneration (relist still matches the existing entry) — the
    // existing, fresher materialization stays latest; only the stale
    // writer's own copy is retired
    assert(mergeLatest(("f2", "p2"), ("f1", "p1"), () => "f2") ==
      (("f2", "p2"), Some("p1")))
    // genuine regeneration: relist matches the incoming build — it wins
    assert(mergeLatest(("f1", "p1"), ("f2", "p2"), () => "f2") ==
      (("f2", "p2"), Some("p1")))
    // dir moved again under both (relist matches neither): newest build
    // wins — deterministic, and the next caller re-fingerprints anyway
    assert(mergeLatest(("f1", "p1"), ("f2", "p2"), () => "f3") ==
      (("f2", "p2"), Some("p1")))
  }

  test("diskMemo serves the latest materialization when the source listing fails") {
    val dir = Files.createTempDirectory("graft_diskmemo_na").toString
    writeTable(dir, 5)
    var builds = 0
    def call() = PersistedAggregates.diskMemo(spark, "spec_diskmemo_na", dir) {
      builds += 1; spark.read.parquet(s"$dir/t")
    }.count()
    assert(call() == 5 && builds == 1)
    // source dir vanishes → fingerprint degrades to "na" → the cached
    // materialization is served instead of failing or minting a copy
    val root = java.nio.file.Paths.get(dir)
    java.nio.file.Files.walk(root)
      .sorted(java.util.Comparator.reverseOrder())
      .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
    assert(call() == 5, "'na' listing must serve the latest materialization")
    assert(builds == 1, "'na' listing must not trigger a rebuild")
  }
}
