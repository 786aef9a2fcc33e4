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
    // the file-stream source wants a directory; stage the single-file
    // table behind a symlink dir (the EventStream.stagedDir pattern)
    val staged = {
      import java.nio.file.{Files, Paths}
      val dir = Files.createTempDirectory("graft-docs-stream")
      val link = Files.createSymbolicLink(
        dir.resolve("documents.parquet"),
        Paths.get(s"$sf/documents.parquet").toAbsolutePath)
      dir.toFile.deleteOnExit(); link.toFile.deleteOnExit()
      dir.toString
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
      val streaming = s.sql("SELECT i, bucket, cnt FROM cms_out ORDER BY i, bucket")
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
      val batch = graft.queries.TextQueries
        .cmsCounters(graft.Tables.documents(s, sf))
        .orderBy("i", "bucket")
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
      assert(streaming.nonEmpty && streaming == batch,
        s"streaming counters diverge from batch (${streaming.length} vs ${batch.length} rows)")
    } finally q.stop()
  }
}
