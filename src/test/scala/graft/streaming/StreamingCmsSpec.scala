package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The t30 count-min counter table is a sum-merge, so the SAME plan
  * must run as a streaming aggregation and converge to the batch
  * counters — the mergeable-sketch property demonstrated end-to-end
  * (per-batch partial sketches merging into state), not just claimed
  * in a scaladoc. */
class StreamingCmsSpec extends SparkTestBase {

  test("streaming CMS counters converge to the batch counter table") {
    val s = spark
    val sf = "/root/testdata/sf0.001"
    val docsSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    // Stage the table as MULTIPLE parquet files: with
    // maxFilesPerTrigger=1 each file is its own micro-batch, so the
    // cross-batch state MERGE is actually exercised (one staged file
    // would verify the sum-merge trivially in a single batch).
    val stagedRoot = java.nio.file.Files.createTempDirectory("graft-docs-stream")
    try {
    val staged = {
      graft.Tables.documents(s, sf).repartition(3)
        .write.mode("overwrite").parquet(stagedRoot.resolve("docs").toString)
      stagedRoot.resolve("docs").toString
    }
    val stream = s.readStream.schema(docsSchema)
      .option("maxFilesPerTrigger", 1)
      .parquet(staged)
    val q = graft.queries.TextQueries.cmsCounters(stream)
      .writeStream.format("memory").queryName("cms_out")
      .outputMode("complete")
      .start()
    try {
      q.processAllAvailable()
      assert(q.lastProgress.batchId >= 2,
        s"expected >=3 micro-batches, got batchId ${q.lastProgress.batchId} — " +
          "the cross-batch merge was not exercised")
      val streaming = s.sql("SELECT i, bucket, cnt FROM cms_out ORDER BY i, bucket")
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
      val batch = graft.queries.TextQueries
        .cmsCounters(graft.Tables.documents(s, sf))
        .orderBy("i", "bucket")
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
      assert(streaming.nonEmpty && streaming == batch,
        s"streaming counters diverge from batch (${streaming.length} vs ${batch.length} rows)")
      // The t32 SERVE path off the STREAMING-built table: because the
      // counter table is a sum-merge, candidate selection against the
      // converged streaming counters must pick exactly the candidates
      // the batch table picks — the sketch-serve property a streaming
      // heavy-hitter deployment rests on, demonstrated not claimed.
      import graft.queries.TextQueries
      val occ = TextQueries.cmsTokens(graft.Tables.documents(s, sf))
      val total = occ.agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n_total"))
      def served(counters: org.apache.spark.sql.DataFrame): Set[(String, Long)] =
        TextQueries.cmsServe(occ, counters, total)
          .select(col("x"), col("est_count"))
          .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      val fromStream = served(
        s.sql("SELECT i, bucket, cnt FROM cms_out"))
      val fromBatch = served(
        TextQueries.cmsCounters(graft.Tables.documents(s, sf)))
      assert(fromStream.nonEmpty && fromStream == fromBatch,
        s"serve path diverges: stream ${fromStream.size} vs batch ${fromBatch.size} candidates")
    } finally q.stop()
    } finally deleteTree(stagedRoot) // covers mid-staging failure too
  }
}
