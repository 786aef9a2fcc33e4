package graft.streaming

import org.apache.spark.sql.functions._

/** d22's arrival path run as it would actually deploy: micro-batches
  * of newly-crawled documents probe the MATERIALIZED base LSH bucket
  * index, and the union of per-batch verdicts must equal the one-shot
  * batch query exactly. This is the streaming half of the near-dup
  * ingest story `IncrementalLshSpec` pins for batch arrivals — batch
  * boundaries cannot change what gets flagged, because each doc's
  * verdict depends only on its own row and the (fixed) base index. */
class StreamingIncrLshSpec extends SparkTestBase {

  test("micro-batched LSH probes union to the batch d22 verdicts exactly") {
    val s = spark
    val sf = "/root/testdata/sf0.001"
    val ingest = graft.Tables.documents(s, sf).filter(col("doc_id") % 10 === 0)
    val stagedRoot = java.nio.file.Files.createTempDirectory("graft-d22-stream")
    try {
      val staged = stagedRoot.resolve("ingest").toString
      ingest.repartition(3).write.mode("overwrite").parquet(staged)
      val schema = s.read.parquet(staged).schema
      val acc = new java.util.concurrent.ConcurrentLinkedQueue[
        (Long, Long, Long, Boolean, Long, Double)]()
      // atomic: foreachBatch runs on the stream thread; a plain var
      // read from the test thread after processAllAvailable has no
      // happens-before edge
      val batches = new java.util.concurrent.atomic.AtomicInteger(0)
      val q = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(staged)
        .writeStream.foreachBatch {
          (batch: org.apache.spark.sql.DataFrame, _: Long) =>
            batches.incrementAndGet()
            graft.queries.DedupQueries
              .probeLshIndex(s, sf, batch, memo = false)
              .collect().foreach { r =>
                acc.add((r.getAs[Long]("doc_id"), r.getAs[Long]("n_candidates"),
                  r.getAs[Long]("n_verified"), r.getAs[Boolean]("is_neardup"),
                  r.getAs[Long]("index_doc"), r.getAs[Double]("best_jacc")))
              }
            ()
        }
        .start()
      try {
        q.processAllAvailable()
      } finally q.stop()
      assert(batches.get() >= 3, s"expected >=3 micro-batches, got ${batches.get()} — " +
        "the batch-boundary independence was not exercised")
      val streaming = acc.toArray(Array.empty[(Long, Long, Long, Boolean, Long, Double)])
        .sortBy(_._1).toSeq
      val batchRows = graft.SparkEntry.queries("d22_incremental_lsh")(s, sf)
        .collect().map { r =>
          (r.getAs[Long]("doc_id"), r.getAs[Long]("n_candidates"),
            r.getAs[Long]("n_verified"), r.getAs[Boolean]("is_neardup"),
            r.getAs[Long]("index_doc"), r.getAs[Double]("best_jacc"))
        }.sortBy(_._1).toSeq
      assert(streaming.nonEmpty && streaming == batchRows,
        s"streaming verdicts diverge from batch d22 " +
          s"(${streaming.size} vs ${batchRows.size} rows)")
    } finally deleteTree(stagedRoot)
  }

  test("a genuinely-new arrival doc (id absent from the corpus) still " +
      "verifies against the index") {
    // r16 ADVICE regression: the gh text fetch resolved candidate ids
    // against the corpus store only, so an arrival whose id is not in
    // `documents` lost its candidates to the inner join and was
    // reported n_candidates=0 / is_neardup=false. The fetch now unions
    // the ingest slice's own (doc_id, text); an exact copy of a base
    // doc under a brand-new id must verify at Jaccard 1.0.
    val s = spark
    val sf = "/root/testdata/sf0.001"
    import s.implicits._
    val base = graft.Tables.documents(s, sf)
      .filter(col("doc_id") % 10 =!= 0)
      .select("doc_id", "text").orderBy("doc_id").limit(1).collect().head
    val newId = 1000000007L // far outside the corpus id space
    val arrival = Seq((newId, base.getString(1))).toDF("doc_id", "text")
    val out = graft.queries.DedupQueries
      .probeLshIndex(s, sf, arrival, memo = false).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("doc_id") == newId)
    assert(r.getAs[Long]("n_candidates") > 0,
      "corpus-absent arrival lost its candidates to the gh inner join")
    assert(r.getAs[Boolean]("is_neardup"))
    assert(r.getAs[Long]("index_doc") == base.getLong(0))
    assert(r.getAs[Double]("best_jacc") == 1.0)
  }
}
