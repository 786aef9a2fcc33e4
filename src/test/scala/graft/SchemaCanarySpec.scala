package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Testdata-schema canary (round-12, verdict ask #2): the driver owns
  * `/root/testdata` and has regenerated it mid-round (r11: `events.ts`
  * flipped TIMESTAMP(NANOS) → µs TIMESTAMP; 29 queries died with 29
  * scattered analysis errors). These tests pin that (a) the canary is
  * green against live testdata, (b) drift produces ONE message NAMING
  * the drifted column, and (c) `Tables.eventsFromRaw` adapts to both
  * physical `ts` encodings the generator has shipped.
  */
class SchemaCanarySpec extends AnyFunSuite {
  private lazy val spark = graft.streaming.SparkTestBase.session
  private val sfDir = "/root/testdata/sf0.001"

  test("canary is green against the live testdata") {
    assert(Tables.schemaDrift(spark, sfDir).isEmpty)
    Tables.assertExpectedSchemas(spark, sfDir) // must not throw
  }

  /** Fixture dir: 9 tables symlinked from live testdata, `events`
    * rewritten with a deliberately wrong ts dtype. */
  private def wrongSchemaDir(): String = {
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("graft-canary")
    Tables.names.filterNot(_ == "events").foreach { t =>
      Files.createSymbolicLink(
        dir.resolve(s"$t.parquet"),
        Paths.get(s"$sfDir/$t.parquet").toAbsolutePath)
    }
    spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("ts", col("ts").cast("string"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir.toString
  }

  test("drifted events.ts is named in one loud message") {
    val dir = wrongSchemaDir()
    val drift = Tables.schemaDrift(spark, dir)
    // exactly the drifted column, not 29 scattered analysis errors
    assert(drift.nonEmpty)
    assert(drift.exists(m => m.contains("events") && m.contains("ts")),
      s"drift messages should name events.ts, got: $drift")
    assert(drift.forall(_.startsWith("testdata schema changed")))
    val e = intercept[IllegalStateException] {
      Tables.assertExpectedSchemas(spark, dir)
    }
    assert(e.getMessage.contains("events.ts"))
  }

  test("content canary is green against the live testdata") {
    assert(Tables.contentDrift(spark, sfDir).isEmpty)
  }

  test("a truncated embedding dim is named by the content canary") {
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("graft-canary-dim")
    Tables.names.filterNot(_ == "embeddings").foreach { t =>
      Files.createSymbolicLink(
        dir.resolve(s"$t.parquet"),
        Paths.get(s"$sfDir/$t.parquet").toAbsolutePath)
    }
    spark.read.parquet(s"$sfDir/embeddings.parquet")
      .withColumn("embedding", slice(col("embedding"), 1, 32))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val drift = Tables.contentDrift(spark, dir.toString)
    assert(drift.exists(m => m.contains("embedding") && m.contains("64")),
      s"expected a dim message, got: $drift")
  }

  test("a multi-byte document is named by the content canary") {
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("graft-canary-ascii")
    Tables.names.filterNot(_ == "documents").foreach { t =>
      Files.createSymbolicLink(
        dir.resolve(s"$t.parquet"),
        Paths.get(s"$sfDir/$t.parquet").toAbsolutePath)
    }
    spark.read.parquet(s"$sfDir/documents.parquet")
      .withColumn("text",
        when(col("doc_id") % 100 === 0, concat(col("text"), lit(" café")))
          .otherwise(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val drift = Tables.contentDrift(spark, dir.toString)
    assert(drift.exists(_.contains("multi-byte")), s"expected an ASCII message, got: $drift")
  }

  test("eventsFromRaw adapts: legacy nanos LONG and native timestamp agree") {
    import spark.implicits._
    val micros = 1720000000000000L // 2024-07-03T10:26:40Z, µs precision
    val legacy = Seq((1L, micros * 1000L, 7L, "click", 1.5, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val native = Seq((1L, new java.sql.Timestamp(micros / 1000L), 7L, "click", 1.5, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val a = Tables.eventsFromRaw(legacy)
    val b = Tables.eventsFromRaw(native)
    assert(a.schema("ts").dataType === org.apache.spark.sql.types.TimestampType)
    assert(a.schema === b.schema)
    assert(a.collect().toSeq === b.collect().toSeq)
  }

  test("an unreadable ts dtype fails with a named message, not analysis noise") {
    import spark.implicits._
    val bad = Seq((1L, "2024-07-03", 7L, "click", 1.5, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val e = intercept[IllegalStateException](Tables.eventsFromRaw(bad))
    assert(e.getMessage.contains("events.ts"))
  }
}
