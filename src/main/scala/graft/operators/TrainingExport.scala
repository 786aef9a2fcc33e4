package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** The write-side end of a corpus-assembly pipeline: deterministic
  * token-budgeted JSONL shards.
  *
  * Sharding is a pure function of the data — a 64-bit hash order, a
  * cumulative token sum over it, `shard = cum / shardTokens` — so the
  * same corpus produces the same shards on any cluster size, any
  * partitioning, any rerun: reproducibility a random `repartition`
  * cannot give, and the property training-data lineage audits need.
  *
  * Scale shape: ONE window shuffle (the cumulative sum over the hash
  * order) and a partitioned write. The window is a running sum over a
  * single global ordering — at 100 TB that ordering must not funnel
  * through one partition, so the cumulative sum is computed
  * hierarchically: a per-range window inside `numRanges` hash ranges
  * (parallel), plus broadcast range-offsets (the per-range totals are
  * tiny). `ORDER BY hash` within a range is a range-local sort, and
  * ranges are independent tasks.
  */
object TrainingExport {

  /** Assign each doc a deterministic shard id so every shard holds
    * ≈`shardTokens` tokens (a shard may overshoot by at most one doc).
    * Returns the input plus (`h64`, `shard`). `tokenCol` must be a
    * NON-NEGATIVE bigint token count; `idCol` a unique id.
    *
    * Shard ids are `floor(prefix / shardTokens)`: when one document
    * alone exceeds the budget, the ids after it SKIP the spans that
    * document swallowed — consumers must treat shard ids as ordered
    * labels, not a dense 0..N-1 range (they are dense whenever every
    * doc fits the budget, the normal case). */
  def assignShards(docs: DataFrame, idCol: String, tokenCol: String,
      shardTokens: Long, numRanges: Int = 256): DataFrame =
    assignShards(docs, idCol, tokenCol, shardTokens, numRanges,
      abs(xxhash64(col(idCol))))

  /** [[assignShards]] with a caller-supplied NON-NEGATIVE bigint hash
    * expression instead of the default `abs(xxhash64(id))`. The hash
    * defines the deterministic global order `(hash mod numRanges,
    * hash, id)` — callers needing the order reproducible OUTSIDE Spark
    * (an audit re-deriving shards in another engine) pass a portable
    * hash here (xxhash64 is Spark-specific). */
  def assignShards(docs: DataFrame, idCol: String, tokenCol: String,
      shardTokens: Long, numRanges: Int, hash: Column): DataFrame = {
    require(shardTokens > 0 && numRanges > 0)
    // withColumn silently REPLACES same-named caller columns: a
    // re-sharding run whose input already carries `shard` (a previous
    // export) or scratch names would have its data destroyed and
    // dropped. `h64` alone is permitted — callers passing a
    // pre-computed hash COLUMN named h64 (the portable-hash pattern,
    // t15) re-derive it identically.
    val reserved = Seq("shard", "__cum")
    val clash = docs.columns.toSeq.intersect(reserved)
    require(clash.isEmpty,
      s"assignShards input already has column(s) ${clash.mkString(", ")} — " +
        "rename them first; they would be silently overwritten/dropped")
    // The hierarchical running sum is the shared [[PrefixSum]]
    // mechanism (r14 extraction — t07/t21 run the same shape); the
    // export order (hash mod R, hash, id) is the range-first form of
    // its order contract.
    val cum = PrefixSum.partitionedCumSum(
      docs.withColumn("h64", hash),
      Seq.empty, pmod(col("h64"), lit(numRanges.toLong)),
      Seq(col("h64"), col(idCol)), col(tokenCol), "__cum")
    cum
      // integer `div`, not `/`: Column `/` is IEEE double division,
      // which goes inexact once the global prefix sum passes 2^53
      // tokens — silent off-by-one shard assignment at extreme scale
      .withColumn("shard",
        expr(s"(__cum - `$tokenCol`) div ${shardTokens}L"))
      .drop("__cum")
  }

  /** Concat-and-chunk SEQUENCE PACKING (the GPT-2/3 pretraining
    * layout): documents concatenate in the deterministic hash order
    * and the stream chunks into fixed `seqTokens`-token training
    * sequences, so a document occupies the half-open token span
    * `[cum − n, cum)` and therefore sequences
    * `floor((cum−n)/seqTokens) .. floor((cum−1)/seqTokens)`. Returns
    * the input plus (`h64`, `start_off`, `seq_first`, `seq_last`) —
    * everything a writer needs to emit each doc's slices into its
    * sequences, and everything an attribution audit needs to answer
    * "which documents fed sequence k" WITHOUT materializing token
    * streams. Same scale shape as [[assignShards]]: the one global
    * ordering is a hierarchical prefix sum (per-range windows +
    * broadcast offsets), never a single-partition sort. */
  def packSequences(docs: DataFrame, idCol: String, tokenCol: String,
      seqTokens: Long, numRanges: Int, hash: Column): DataFrame = {
    require(seqTokens > 0 && numRanges > 0)
    val reserved = Seq("start_off", "seq_first", "seq_last",
      "__cum", "__tok")
    val clash = docs.columns.toSeq.intersect(reserved)
    require(clash.isEmpty,
      s"packSequences input already has column(s) ${clash.mkString(", ")} — " +
        "rename them first; they would be silently overwritten/dropped")
    // `h64` is deliberately NOT reserved (the assignShards convention):
    // callers passing a pre-computed hash COLUMN named h64 re-derive it
    // identically (t27/t29). A caller with a semantically different h64
    // must rename it or accept the overwrite.
    val h = hash
    // Enforced precondition (r13 ADVICE): a 0-token doc would emit an
    // INVERTED span (seq_last < seq_first), and a NULL count would
    // silently poison every later row's cumulative sum in its range.
    // Row-level raise_error, not a driver-side count: no extra job,
    // and the failing doc is named. The guarded value threads through
    // the sum and the span arithmetic so it cannot be pruned away.
    val guardedTok = when(col(tokenCol).isNull || col(tokenCol) <= 0,
      expr(s"raise_error(concat('packSequences: `$tokenCol` must be a positive " +
        s"non-null token count, got ', COALESCE(CAST(`$tokenCol` AS STRING), 'NULL'), " +
        s"' for $idCol ', COALESCE(CAST(`$idCol` AS STRING), 'NULL')))").cast("long"))
      .otherwise(col(tokenCol).cast("long"))
    val cum = PrefixSum.partitionedCumSum(
      docs.withColumn("h64", h).withColumn("__tok", guardedTok),
      Seq.empty, pmod(col("h64"), lit(numRanges.toLong)),
      Seq(col("h64"), col(idCol)), col("__tok"), "__cum")
    cum
      // integer div/pmod throughout (the assignShards 2^53 rule)
      .withColumn("start_off", expr(s"pmod(__cum - __tok, ${seqTokens}L)"))
      .withColumn("seq_first", expr(s"(__cum - __tok) div ${seqTokens}L"))
      .withColumn("seq_last", expr(s"(__cum - 1) div ${seqTokens}L"))
      .drop("__cum", "__tok")
  }

  /** [[assignShards]] then write JSONL partitioned by shard. */
  def writeShards(docs: DataFrame, idCol: String, tokenCol: String,
      shardTokens: Long, path: String): Unit =
    writeShards(docs, idCol, tokenCol, shardTokens, path, codec = None)

  /** As above with an optional compression codec ("gzip" is what
    * training pipelines actually ship — ~4-8× smaller shards). Gzip
    * files are NOT splittable — each shard file is one read task —
    * but parallelism is preserved anyway because sharding already
    * bounded each FILE's size by the token budget, so the task count
    * scales with the shard count, not with file-internal splits
    * ("none"/None writes plain splittable JSONL). Reading back is the
    * stock `spark.read.json` — Hadoop decompresses by extension, so
    * the round-trip needs no custom reader (spec-pinned). */
  def writeShards(docs: DataFrame, idCol: String, tokenCol: String,
      shardTokens: Long, path: String, codec: Option[String]): Unit = {
    val w = assignShards(docs, idCol, tokenCol, shardTokens)
      .write.mode(SaveMode.Overwrite)
      .partitionBy("shard")
    codec.fold(w)(c => w.option("compression", c)).json(path)
  }
}
