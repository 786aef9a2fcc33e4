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
}
