package graft.multimodal

import graft.PlanTestUtils

/** Plan-shape regression tests for the media pipeline: the properties
  * the 100 TB story depends on but value-level oracles can't see. */
class MediaPlanSpec extends graft.streaming.SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def assertPayloadPruned(qe: org.apache.spark.sql.execution.QueryExecution,
      what: String): Unit = {
    val schemas = PlanTestUtils.scanReadSchemas(qe)
    assert(schemas.nonEmpty, s"expected at least one parquet scan in the $what plan")
    schemas.foreach { fields =>
      assert(!fields.contains("text"),
        s"payload column leaked into the $what parquet ReadSchema: $fields")
      assert(fields.contains("doc_id"), s"unexpected $what scan schema: $fields")
    }
  }

  test("m03 metadata scan prunes the payload column out of the parquet read") {
    // metadataSummary must stay answerable without touching the payload
    // (here: the `text` column the fake payload derives from). If anyone
    // widens the scan, ReadSchema regains the column and this fails.
    assertPayloadPruned(
      MediaPipeline.metadataSummary(spark, sf).queryExecution, "m03")
  }

  test("m04 token budget never reads the payload column") {
    assertPayloadPruned(
      graft.SparkEntry.queries("m04_media_token_budget")(spark, sf).queryExecution, "m04")
  }

  test("ByteStats: magic-byte sniffing and histogram stats on real binary payloads") {
    import MediaPipeline.ByteStats
    // The text-derived table can never exercise the detector's positive
    // branches, so they are pinned here on genuine container prefixes.
    def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    assert(ByteStats.sniff(bytes(0xFF, 0xD8, 0xFF, 0xE0, 0x00)) == "jpeg")
    assert(ByteStats.sniff(bytes(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A)) == "png")
    assert(ByteStats.sniff(bytes(0x47, 0x49, 0x46, 0x38, 0x39, 0x61)) == "gif")
    assert(ByteStats.sniff(bytes(0x52, 0x49, 0x46, 0x46, 0x24, 0x08)) == "riff")
    assert(ByteStats.sniff("plain text".getBytes("UTF-8")) == "unknown")
    assert(ByteStats.sniff(Array.empty[Byte]) == "unknown")

    // IoC: constant payload = 1.0 (every pair collides); all-distinct
    // payload = 0.0; "aab" = c(a)=2,c(b)=1 -> 2*1 / 3*2 = 1/3.
    assert(ByteStats.analyze(Array.fill(100)(7.toByte)).ioc == 1.0)
    assert(ByteStats.analyze(bytes(1, 2, 3, 4)).ioc == 0.0)
    assert(ByteStats.analyze("aab".getBytes("UTF-8")).ioc == 1.0 / 3.0)
    val s = ByteStats.analyze("aab".getBytes("UTF-8"))
    assert(s.distinctBytes == 2 && s.printableRatio == 1.0)
    // non-printable bytes lower the ratio
    assert(ByteStats.analyze(bytes(0x00, 0x41)).printableRatio == 0.5)
    // empty payload: all-zero stats, no division by zero
    val e = ByteStats.analyze(Array.empty[Byte])
    assert(e.distinctBytes == 0 && e.ioc == 0.0 && e.printableRatio == 0.0)
  }
}
