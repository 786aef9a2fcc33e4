package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All analytics queries read through here so the scan path is uniform:
  * plain `spark.read.parquet` — Catalyst handles column pruning and
  * predicate pushdown into the parquet scan. At cluster scale the same
  * call reads a partitioned table; nothing here assumes a single file.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") readEvents(spark, sfDir)
    else readParquet(spark, s"$sfDir/$name.parquet")

  /** Inferred parquet schemas, keyed on (path, length:mtime):
    * `spark.read.parquet(path)` runs a footer schema-INFERENCE JOB on
    * every call, and each query invocation constructs its scans fresh
    * — measured (r19, StageTimeProbe, warm d23 at sf0.1): 13 such
    * ~25-30 ms single-task inference stages inside ONE warm run, pure
    * fixed cost. Passing the schema explicitly skips inference; the
    * stat in the key keeps the r11 mid-session-regeneration hazard
    * closed (a regenerated file gets a fresh inference — the same
    * staleness discipline as PersistedAggregates.fingerprint). */
  private val schemaCache = new java.util.concurrent.ConcurrentHashMap[
    (String, String), org.apache.spark.sql.types.StructType]()

  private def statKey(spark: SparkSession, path: String): String =
    try {
      val p = new org.apache.hadoop.fs.Path(path)
      val st = p.getFileSystem(spark.sparkContext.hadoopConfiguration).getFileStatus(p)
      s"${st.getLen}:${st.getModificationTime}"
    } catch { case _: Throwable => "na" }

  /** `spark.read.parquet(path)` with the one-inference-per-(JVM, file
    * state) schema cache. An unreachable stat ("na") degrades to plain
    * inference rather than serving a possibly stale schema. */
  private[graft] def readParquet(spark: SparkSession, path: String): DataFrame = {
    val k = statKey(spark, path)
    if (k == "na") spark.read.parquet(path)
    else spark.read.schema(
      schemaCache.computeIfAbsent((path, k), _ => spark.read.parquet(path).schema))
      .parquet(path)
  }

  /** Raw parquet schema of `events` at `sfDir`, as Spark reads it with
    * the legacy nanos-as-long mode on: TIMESTAMP(NANOS) data arrives as
    * LongType, standard µs TIMESTAMP natively. The streaming file source
    * requires an explicit schema, so it peeks the batch one here — the
    * testdata has shipped BOTH physical types across rounds, and pinning
    * either breaks when the generator flips again. */
  def eventsRawSchema(spark: SparkSession, sfDir: String): org.apache.spark.sql.types.StructType = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/events.parquet").schema
  }

  /** Convert a raw events frame to the typed shape (`ts: TIMESTAMP`),
    * branching on the dtype the scan produced:
    *   - LongType → legacy nanos-as-long read of TIMESTAMP(NANOS); the
    *     driver data carries no sub-microsecond part (verified:
    *     epoch_ns % 1000 == 0 everywhere), so ns→µs truncation is exact
    *     and matches DuckDB's own nanosecond-parquet read;
    *   - Timestamp(NTZ) → standard µs TIMESTAMP, cast only (the session
    *     is UTC, so NTZ→LTZ preserves the instant). */
  def eventsFromRaw(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val ts = raw.schema("ts").dataType match {
      case LongType => expr("timestamp_micros(ts div 1000)")
      case TimestampType | TimestampNTZType => col("ts").cast(TimestampType)
      case other => throw new IllegalStateException(
        s"testdata schema changed: events.ts is now $other " +
          "(expected LONG nanos or TIMESTAMP); update Tables.eventsFromRaw")
    }
    raw.select(
      col("event_id"), ts.as("ts"),
      col("user_id"), col("event_type"), col("value"), col("props"))
  }

  /** Enable legacy nanos-as-long (session-wide — the only way Spark
    * exposes it; a no-op for standard µs files) so BOTH physical `ts`
    * encodings the driver has shipped load, then normalize. */
  private def readEvents(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // readParquet is safe here: the legacy conf is set before EVERY
    // events read (this is the only entry point), so the cached
    // inferred schema is always the one produced under it.
    eventsFromRaw(readParquet(spark, s"$sfDir/events.parquet"))
  }

  /** Expected LOGICAL schema per table, post-normalization — column
    * names in order plus canonical dtypes ([[canonicalType]]). This is
    * the contract the 112 queries compile against; the driver owns the
    * parquet and has regenerated it mid-round before (round 11: events.ts
    * flipped TIMESTAMP(NANOS)→µs TIMESTAMP and 29 queries died with 29
    * scattered analysis errors), so drift must be ONE loud named message
    * instead. */
  private val expectedSchemas: Map[String, Seq[(String, String)]] = Map(
    "region" -> Seq("r_regionkey" -> "int", "r_name" -> "string"),
    "nation" -> Seq("n_nationkey" -> "int", "n_name" -> "string",
      "n_regionkey" -> "int"),
    "customer" -> Seq("c_custkey" -> "bigint", "c_name" -> "string",
      "c_nationkey" -> "int", "c_acctbal" -> "double",
      "c_mktsegment" -> "string"),
    "supplier" -> Seq("s_suppkey" -> "bigint", "s_name" -> "string",
      "s_nationkey" -> "int", "s_acctbal" -> "double"),
    "part" -> Seq("p_partkey" -> "bigint", "p_name" -> "string",
      "p_brand" -> "string", "p_type" -> "string", "p_size" -> "int",
      "p_retailprice" -> "double"),
    "orders" -> Seq("o_orderkey" -> "bigint", "o_custkey" -> "bigint",
      "o_orderstatus" -> "string", "o_totalprice" -> "double",
      "o_orderdate" -> "timestamp", "o_orderpriority" -> "string"),
    "lineitem" -> Seq("l_orderkey" -> "bigint", "l_partkey" -> "bigint",
      "l_suppkey" -> "bigint", "l_linenumber" -> "int",
      "l_quantity" -> "double", "l_extendedprice" -> "double",
      "l_discount" -> "double", "l_tax" -> "double",
      "l_returnflag" -> "string", "l_linestatus" -> "string",
      "l_shipdate" -> "timestamp"),
    "events" -> Seq("event_id" -> "bigint", "ts" -> "timestamp",
      "user_id" -> "bigint", "event_type" -> "string",
      "value" -> "double", "props" -> "string"),
    "documents" -> Seq("doc_id" -> "bigint", "text" -> "string",
      "lang" -> "string", "source" -> "string", "n_chars" -> "bigint"),
    "embeddings" -> Seq("vec_id" -> "bigint",
      "embedding" -> "array<float>", "label" -> "int"))

  /** Dtype canonicalization for the canary: NTZ and LTZ timestamps are
    * interchangeable here (UTC session, same instant — the queries and
    * the DuckDB oracle agree under either), so both spell "timestamp". */
  private def canonicalType(dt: org.apache.spark.sql.types.DataType): String =
    dt.simpleString.replace("timestamp_ntz", "timestamp")

  /** Compare every table's loaded schema to [[expectedSchemas]]; return
    * one human-readable message per drifted/missing/extra column (empty
    * = no drift). Pure report — callers decide whether to warn or
    * throw. */
  def schemaDrift(spark: SparkSession, sfDir: String): Seq[String] =
    names.flatMap { t =>
      val expected = expectedSchemas(t)
      try {
        val actual = apply(spark, sfDir, t).schema
          .map(f => f.name -> canonicalType(f.dataType))
        val actualMap = actual.toMap
        val drifted = expected.collect {
          case (c, want) if actualMap.contains(c) && actualMap(c) != want =>
            s"testdata schema changed: $t.$c is now ${actualMap(c)} (expected $want)"
          case (c, want) if !actualMap.contains(c) =>
            s"testdata schema changed: $t.$c ($want) is missing"
        }
        val extra = actual.collect {
          case (c, got) if !expected.exists(_._1 == c) =>
            s"testdata schema changed: $t has new column $c ($got)"
        }
        drifted ++ extra
      } catch { case e: Throwable =>
        Seq(s"testdata schema changed: $t failed to load: ${e.getMessage}")
      }
    }

  /** Content invariants the queries are built AGAINST but the schema
    * cannot express — the next r11-class silent break lives here, not
    * in dtypes. Two cheap single-table aggregates:
    *   - `embeddings.embedding` is uniformly 64-dim: the PQ subspace
    *     split (4×16), the IVF fits, and the hyperplane bands all
    *     assume it — a dim change would mis-slice silently, not error;
    *   - `documents.text` is single-byte ASCII: the media queries'
    *     byte arithmetic (m05/m08 substr grids, m10 payload bytes) and
    *     d14's window digests equate char count with byte count. */
  def contentDrift(spark: SparkSession, sfDir: String): Seq[String] = {
    import org.apache.spark.sql.functions._
    val dims =
      try {
        val r = apply(spark, sfDir, "embeddings")
          .agg(min(size(col("embedding"))), max(size(col("embedding")))).head()
        if (r.getInt(0) == 64 && r.getInt(1) == 64) Nil
        else Seq("testdata content changed: embeddings.embedding dims span " +
          s"[${r.getInt(0)}, ${r.getInt(1)}] (expected uniform 64; PQ/IVF subspace arithmetic assumes it)")
      } catch { case e: Throwable =>
        Seq(s"testdata content changed: embeddings failed dim check: ${e.getMessage}")
      }
    val ascii =
      try {
        val n = apply(spark, sfDir, "documents")
          .filter(length(col("text")) =!= expr("octet_length(text)")).count()
        if (n == 0) Nil
        else Seq(s"testdata content changed: $n documents carry multi-byte chars " +
          "(expected single-byte ASCII; media byte arithmetic and d14 digests assume it)")
      } catch { case e: Throwable =>
        Seq(s"testdata content changed: documents failed ASCII check: ${e.getMessage}")
      }
    dims ++ ascii
  }

  /** First-line canary for Verify/Bench/specs: throws ONE message
    * naming every drifted column if the testdata no longer matches the
    * logical contract the queries compile against. */
  def assertExpectedSchemas(spark: SparkSession, sfDir: String): Unit = {
    val drift = schemaDrift(spark, sfDir)
    if (drift.nonEmpty) throw new IllegalStateException(drift.mkString("; "))
  }

  /** Scale-adaptive scan-parallelism floor (optimization guide §2.5:
    * "one huge unsplittable file … repartition immediately after the
    * read"). The driver testdata ships each table as ONE
    * single-row-group parquet file, so a bare scan is ONE task no
    * matter how many cores the session has — and any heavy row-local
    * projection downstream (the n·W window-digest passes, the gram
    * explodes) runs serially on it (measured r19, sf0.1 local[32]:
    * t24's md5 window pass = one 890 ms task while 31 cores idle).
    * When the scan's natural split count already meets the session's
    * default parallelism — the production case: a 100 TB table is
    * thousands of splits — this is the IDENTITY; the repartition fires
    * only when the source cannot feed the cluster, which is exactly
    * when one narrow exchange of the input rows is cheaper than idling
    * every core but one. Hash partitioning on a caller-named unique
    * key keeps row placement deterministic under task retry (§2.5's
    * round-robin/rand() re-run hazard does not apply). */
  def parallelScan(s: SparkSession, df: DataFrame,
      key: org.apache.spark.sql.Column): DataFrame = {
    val target = s.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df
    else df.repartition(target, key)
  }

  def region(s: SparkSession, d: String): DataFrame    = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = apply(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame    = apply(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
