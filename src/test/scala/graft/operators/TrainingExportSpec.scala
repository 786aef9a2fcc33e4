package graft.operators

import org.apache.spark.sql.functions._

/** Contract of the deterministic token-budgeted sharder. */
class TrainingExportSpec extends graft.streaming.SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def docs = graft.Tables.documents(spark, sf)
    .select(col("doc_id"), col("text"), col("n_chars"))

  test("every doc lands in exactly one shard; shard ids are contiguous") {
    val out = TrainingExport.assignShards(docs, "doc_id", "n_chars", 50000L)
    val n = docs.count()
    assert(out.count() == n)
    assert(out.select("doc_id").distinct().count() == n)
    val shards = out.select("shard").distinct()
      .collect().map(_.getLong(0)).sorted
    assert(shards.head == 0L && shards.last == shards.length - 1,
      s"shard ids not contiguous: ${shards.toSeq}")
  }

  test("shard token sums respect the budget within one max-doc overshoot") {
    val budget = 50000L
    val out = TrainingExport.assignShards(docs, "doc_id", "n_chars", budget)
    val maxDoc = docs.agg(max("n_chars")).collect().head.getLong(0)
    val sums = out.groupBy("shard").agg(sum("n_chars").as("toks"))
      .orderBy("shard").collect().map(r => (r.getLong(0), r.getLong(1)))
    val middle = sums.dropRight(1) // the final shard holds the remainder
    middle.foreach { case (shard, toks) =>
      assert(math.abs(toks - budget) < maxDoc,
        s"shard $shard holds $toks tokens vs budget $budget (maxDoc $maxDoc)")
    }
  }

  test("shard assignment is deterministic across runs and repartitionings") {
    val a = TrainingExport.assignShards(docs, "doc_id", "n_chars", 50000L)
      .select("doc_id", "shard").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val b = TrainingExport.assignShards(docs.repartition(13), "doc_id", "n_chars", 50000L)
      .select("doc_id", "shard").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(a == b, "shard assignment changed under repartitioning")
  }

  test("hierarchical prefix sum matches a sequential reference on random corpora") {
    // The operator computes shard = floor(exclusive_prefix / budget)
    // via per-range windows + broadcast offsets. Reference: read back
    // the operator's own (h64, range-implied) order, recompute the
    // prefix sums sequentially on the driver, and demand identical
    // shard ids. Catches any off-by-one in the offset window frame or
    // the range ordering.
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(20260812L)
    for (trial <- 1 to 3) {
      val budget = Seq(50L, 500L, 5000L)(trial - 1)
      val docs = (0 until 400).map(i => (i.toLong + trial * 10000, rnd.nextInt(200).toLong))
        .toDF("doc_id", "toks")
      val out = TrainingExport.assignShards(docs, "doc_id", "toks", budget, numRanges = 16)
        .select(col("doc_id"), col("toks"), col("h64"), col("shard"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      // Sequential reference: order by (range, h64, doc_id), running sum.
      val ordered = out.sortBy { case (id, _, h, _) =>
        (((h % 16) + 16) % 16, h, id)
      }
      var cum = 0L
      ordered.foreach { case (id, toks, _, shard) =>
        val expected = cum / budget
        assert(shard == expected,
          s"trial $trial doc $id: shard $shard != reference $expected (prefix $cum)")
        cum += toks
      }
    }
  }

  test("packSequences matches a sequential concat-and-chunk reference on random corpora") {
    // Same reference discipline as the shard test: re-derive the global
    // order, walk it sequentially maintaining the token cursor, and
    // demand identical (start_off, seq_first, seq_last) per doc.
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(20260814L)
    for (trial <- 1 to 3) {
      val ctx = Seq(64L, 512L, 4096L)(trial - 1)
      val docs = (0 until 400).map(i => (i.toLong + trial * 10000, 1L + rnd.nextInt(199).toLong))
        .toDF("doc_id", "toks")
      val out = TrainingExport.packSequences(docs, "doc_id", "toks", ctx, 16,
        abs(xxhash64(col("doc_id"))))
        .select(col("doc_id"), col("toks"), col("h64"),
          col("start_off"), col("seq_first"), col("seq_last"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5)))
      val ordered = out.sortBy { case (id, _, h, _, _, _) =>
        (((h % 16) + 16) % 16, h, id)
      }
      var cursor = 0L
      ordered.foreach { case (id, toks, _, off, first, last) =>
        assert(off == cursor % ctx, s"trial $trial doc $id: start_off")
        assert(first == cursor / ctx, s"trial $trial doc $id: seq_first")
        assert(last == (cursor + toks - 1) / ctx, s"trial $trial doc $id: seq_last")
        cursor += toks
      }
    }
  }

  test("packSequences is deterministic under repartitioning and tiles the stream") {
    val out = TrainingExport.packSequences(docs, "doc_id", "n_chars", 1000L, 256,
      abs(xxhash64(col("doc_id"))))
    val again = TrainingExport.packSequences(docs.repartition(7), "doc_id", "n_chars",
      1000L, 256, abs(xxhash64(col("doc_id"))))
    val a = out.select("doc_id", "seq_first", "seq_last").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val b = again.select("doc_id", "seq_first", "seq_last").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(a == b, "sequence assignment changed under repartitioning")
    // the chunked stream tiles: total tokens pin the last sequence id
    val total = docs.agg(sum("n_chars")).collect().head.getLong(0)
    val maxLast = out.agg(max("seq_last")).collect().head.getLong(0)
    assert(maxLast == (total - 1) / 1000L, "sequence ids do not tile the token stream")
  }

  test("packSequences refuses 0-token and NULL token counts loudly") {
    // r13 ADVICE: a 0-token doc yields an inverted span (seq_last <
    // seq_first) and a NULL poisons the range's cumulative sum — both
    // must fail with the named error, not propagate silently.
    val s = spark
    import s.implicits._
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    for (bad <- Seq(Some(0L), None)) {
      val rows = Seq((1L, Some(10L)), (2L, bad), (3L, Some(7L)))
      val in = rows.toDF("doc_id", "toks")
      val e = intercept[Exception] {
        TrainingExport.packSequences(in, "doc_id", "toks", 64L, 4,
          abs(xxhash64(col("doc_id")))).collect()
      }
      assert(messages(e).exists(_.contains("packSequences")),
        s"token=$bad: expected the named guard error, got ${e.getMessage}")
    }
  }

  test("writeShards produces shard-partitioned JSONL that round-trips") {
    val dir = java.nio.file.Files.createTempDirectory("graft-shards").toString
    try {
      TrainingExport.writeShards(docs, "doc_id", "n_chars", 50000L, dir)
      val back = spark.read.json(dir)
      assert(back.count() == docs.count())
      assert(back.columns.contains("shard"))
      val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory)
        .map(_.getName).filter(_.startsWith("shard="))
      assert(dirs.nonEmpty, "expected shard= partition directories")
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
    }
  }

  test("gzip-compressed shards round-trip identically to plain JSONL") {
    // the codec a pipeline actually ships: Hadoop decompresses by
    // extension on read, so the consumer side is unchanged — pinned by
    // comparing the full row set against the uncompressed export
    val plain = java.nio.file.Files.createTempDirectory("graft-shards-p").toString
    val gz = java.nio.file.Files.createTempDirectory("graft-shards-z").toString
    try {
      TrainingExport.writeShards(docs, "doc_id", "n_chars", 50000L, plain)
      TrainingExport.writeShards(docs, "doc_id", "n_chars", 50000L, gz, Some("gzip"))
      val gzFiles = new java.io.File(gz).listFiles().filter(_.isDirectory)
        .flatMap(_.listFiles()).map(_.getName).filter(_.endsWith(".json.gz"))
      assert(gzFiles.nonEmpty, "expected .json.gz shard files")
      def rows(p: String): Set[String] = spark.read.json(p)
        .selectExpr("concat(cast(doc_id AS STRING), ':', cast(shard AS STRING)) AS k")
        .collect().map(_.getString(0)).toSet
      assert(rows(gz) == rows(plain),
        "compressed shards do not round-trip to the plain export")
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(plain)).deleteRecursively()
      new Directory(new java.io.File(gz)).deleteRecursively()
    }
  }
}
