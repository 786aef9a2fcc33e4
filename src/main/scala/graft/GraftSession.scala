package graft

import org.apache.spark.sql.SparkSession

/** The session configuration discipline this library assumes, in one
  * place — so a deployment starts from the settings the operators were
  * designed against instead of rediscovering them per cluster.
  *
  * Everything here is sizing, not semantics: no query in
  * [[SparkEntry]] changes its RESULT under different values (the
  * oracle gate runs under the driver's own session), but several
  * change their scaling behavior:
  *
  *  - '''AQE on, with skew-join splitting''': the LSH bucket caps
  *    bound degenerate keys inside aggregations, but ordinary data
  *    skew in the TPC-H-style joins is AQE's job — at 100 TB a single
  *    hot `orderkey` reducer is the difference between a straggler
  *    and a finished stage. `SkewJoin.saltedJoin` stays available for
  *    distributions AQE's split heuristics miss.
  *  - '''Coalesce partitions''': post-shuffle partition targets track
  *    data volume, so the same plan serves sf0.001 and sf100 without
  *    retuning `shuffle.partitions` per query.
  *  - '''shuffle.partitions as a ceiling''': sized to cluster
  *    parallelism (2-3× total cores is the usual guidance; the driver
  *    uses core count directly on local[32]). With AQE coalescing
  *    it is a cap, not a constant cost.
  *  - '''maxPartitionBytes 128m''': scan-task granularity. Bigger
  *    tasks amortize scheduling at 100 TB but risk executor memory on
  *    wide rows (the `documents.text` / embedding columns); 128m is
  *    the safe default the multimodal `mapPartitions` batching was
  *    sized against.
  *  - '''ANSI off''': the oracle-parity arithmetic (Portable.scala)
  *    is calibrated against non-ANSI overflow semantics; decimal
  *    checksums that MUST fail loudly guard themselves explicitly
  *    (ConnectedComponents' null-sum check) instead of relying on the
  *    session mode.
  *  - '''UTC''': every timestamp oracle compares epoch-exact values;
  *    a non-UTC session would silently shift window boundaries.
  */
object GraftSession {

  /** Apply the recommended configuration to a builder. `parallelism`
    * is the cluster's total core count (executors × cores).
    * `extraExtensions`: a deployment's OWN SparkSessionExtensions
    * class names (Delta, Iceberg, …) — `spark.sql.extensions` accepts
    * a comma-separated list, and setting it here would otherwise
    * clobber anything the caller configured on the builder earlier
    * (builders have no getter to merge against). */
  def recommended(builder: SparkSession.Builder, parallelism: Int,
      extraExtensions: Seq[String] = Nil): SparkSession.Builder =
    builder
      // The library's extension point (native functions + the
      // CapCollectBuckets hot-bucket guard): the recommended session
      // carries it so user-shaped collect-then-filter SQL is capped
      // without any imperative setup. Static conf — must be present
      // at first-session creation.
      .config("spark.sql.extensions",
        ("graft.GraftExtensions" +: extraExtensions).mkString(","))
      .config("spark.sql.shuffle.partitions", math.max(parallelism, 1).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // Let AQE size CACHED plans too (off by default): without this a
      // persisted frame materializes at the raw shuffle.partitions
      // ceiling — every session memo pinned `parallelism` near-empty
      // cache blocks, and EVERY downstream stage over it paid a
      // `parallelism`-task dispatch regardless of data volume
      // (measured r19, sf0.1 local[32]: t29 spent 3 stages × ~600 ms
      // wall on 32-task scans of ≤189 KiB cached memos at ~55 ms CPU
      // each). With it on, cached partitioning tracks bytes exactly
      // like any other AQE stage — same plans, scale-adaptive sizing.
      // Trade-off: a consumer can no longer reuse the cache's output
      // partitioning to skip its own exchange; the memoized frames
      // here are aggregate-grain (orders of magnitude smaller than
      // their sources), so re-exchanging them is the cheap side.
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // Measured and REJECTED for this deployment (r19 A/B, paired
      // benches benchruns/r19_runE_batch2.jsonl vs r19_runF_cfgAB.jsonl):
      // spark.io.compression.codec=zstd +
      // spark.sql.parquet.compression.codec=zstd +
      // spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold=64m
      // moved the full-registry bench 40.3 s -> 68.0 s, with the
      // inflation concentrated on the parquet-scan/shuffle-heavy
      // queries (s24 6.7x, d23 3.4x, d10 3.2x) while scan-light
      // queries were flat — at KB-scale local shuffles and MB-scale
      // memo parquet, zstd's CPU costs more than its bytes save. A
      // 100 TB deployment (GB-scale shuffle blocks, network-bound)
      // should re-run exactly this A/B; the defaults here are the
      // measured local optimum, not a universal verdict.
      .config("spark.sql.files.maxPartitionBytes", "134217728")
      // Streaming state at scale: the default HDFS-backed provider
      // keeps every key on-heap per executor; RocksDB checkpoints
      // incrementally and spills off-heap — the provider a production
      // PEL (consumer-count-bounded but churn-heavy state) needs.
      // Batch queries ignore it; StreamingPelSpec pins the state
      // machine end-to-end under this provider.
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      // Parquet timestamps as µs int64, not INT96: INT96 is deprecated,
      // unreadable by some engines, and nanosecond-based readers
      // (pyarrow/pandas) decode out-of-ns-range values with int64
      // wraparound — a40's SCD2 open-interval sentinel 9999-12-31
      // came back as 1816-03-29 under the driver's hasher while DuckDB
      // read the same cells correctly. TIMESTAMP_MICROS represents
      // 9999-12-31 exactly and reads identically everywhere.
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")

  /** Local session with the recommended configs — what Bench/Verify
    * run; a cluster deployment passes its own master/executor confs
    * through `recommended`. */
  def local(cores: Int, appName: String = "graft"): SparkSession =
    recommended(SparkSession.builder(), cores)
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
}
