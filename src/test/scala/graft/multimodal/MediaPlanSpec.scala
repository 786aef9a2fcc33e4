package graft.multimodal

import org.apache.spark.sql.execution.{ExplainMode, FileSourceScanExec}

/** Plan-shape regression tests for the media pipeline: the properties
  * the 100 TB story depends on but value-level oracles can't see. */
class MediaPlanSpec extends graft.streaming.SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("m04 token budget never reads the payload column") {
    val qe = graft.SparkEntry.queries("m04_media_token_budget")(spark, sf).queryExecution
    val scans = qe.executedPlan.collect { case f: FileSourceScanExec => f }
    val schemas: Seq[String] =
      if (scans.nonEmpty) scans.map(_.requiredSchema.fieldNames.mkString(","))
      else qe.explainString(ExplainMode.fromString("formatted"))
        .linesIterator.filter(_.contains("ReadSchema:")).toSeq
    assert(schemas.nonEmpty)
    schemas.foreach { fields =>
      assert(!fields.contains("text"),
        s"payload column leaked into the m04 scan: $fields")
    }
  }

  test("m03 metadata scan prunes the payload column out of the parquet read") {
    // metadataSummary must stay answerable without touching the payload
    // (here: the `text` column the fake payload derives from). If anyone
    // widens the scan, ReadSchema regains the column and this fails.
    val qe = MediaPipeline.metadataSummary(spark, sf).queryExecution
    val scans = qe.executedPlan.collect { case f: FileSourceScanExec => f }
    val schemas: Seq[String] =
      if (scans.nonEmpty) scans.map(_.requiredSchema.fieldNames.mkString(","))
      else // AQE wraps the initial plan; fall back to the formatted text.
        // Whole ReadSchema lines, not a struct<...> regex — a nested
        // struct's inner '>' would truncate a capture group.
        qe.explainString(ExplainMode.fromString("formatted"))
          .linesIterator.filter(_.contains("ReadSchema:")).toSeq
    assert(schemas.nonEmpty, "expected at least one parquet scan in the plan")
    schemas.foreach { fields =>
      assert(!fields.contains("text"),
        s"payload column leaked into the parquet ReadSchema: $fields")
      assert(fields.contains("doc_id"), s"unexpected scan schema: $fields")
    }
  }
}
