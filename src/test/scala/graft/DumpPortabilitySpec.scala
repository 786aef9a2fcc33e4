package graft

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.{LogicalTypeAnnotation, PrimitiveType}
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

/** Dump-portability canary for the Verify parquet dump.
  *
  * Round-16 lesson (the a40 red row): the dump's timestamp ENCODING,
  * not the query's answer, failed the driver's hash gate. Two distinct
  * hazards exist for a TimestampType dump column:
  *
  *  - '''INT96''' (Spark's historical parquet default): nanosecond-
  *    based readers (pyarrow/pandas — the driver's hasher) decode it
  *    by int64-ns arithmetic, so any value past 2262-04-11 wraps —
  *    a40's SCD2 open-interval sentinel `9999-12-31` came back as
  *    `1816-03-29 05:56:08` while DuckDB read the same cells fine.
  *  - '''µs adjusted-to-UTC''' (what `outputTimestampType=
  *    TIMESTAMP_MICROS` writes for TimestampType): exact and in-range,
  *    but DuckDB/pandas read it back tz-AWARE while the DuckDB oracle
  *    computes naive timestamps — same instant, failed cell equality
  *    (observed on a11/p06/p07/p11 when only the session conf was
  *    flipped).
  *
  * The portable encoding is INT64 TIMESTAMP(MICROS,
  * isAdjustedToUTC=false) — naive µs — which every reader decodes to
  * the same naive wall-clock values the old INT96 dumps displayed,
  * and which represents 9999-12-31 exactly. [[Verify.dumpPortable]]
  * produces it; this spec pins the footer bytes and the worst-case
  * round-trip so the class of bug cannot recur silently.
  */
class DumpPortabilitySpec extends AnyFunSuite {

  private val spark = graft.streaming.SparkTestBase.session

  test("Verify.dumpPortable writes timestamps as INT64 naive µs and the " +
      "out-of-ns-range SCD2 sentinel round-trips exactly") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dumpcanary")
    val out = dir.resolve("ts").toString
    try {
      val sentinel = java.sql.Timestamp.valueOf("9999-12-31 00:00:00")
      import spark.implicits._
      val df = Seq((1L, sentinel)).toDF("id", "valid_to")
      assert(df.schema("valid_to").dataType ==
        org.apache.spark.sql.types.TimestampType)
      Verify.dumpPortable(df)
        .coalesce(1).write.mode("overwrite").parquet(out)

      // 1. Footer-level encoding assertion: INT64, MICROS, NOT
      //    adjusted to UTC. INT96 would wrap the sentinel under
      //    pyarrow; adjusted=true would read tz-aware vs the naive
      //    oracle.
      val file = new java.io.File(out).listFiles()
        .filter(f => f.getName.endsWith(".parquet")).head
      val reader = ParquetFileReader.open(
        HadoopInputFile.fromPath(new Path(file.getAbsolutePath), new Configuration()))
      try {
        val schema = reader.getFooter.getFileMetaData.getSchema
        val tsField = schema.getFields.asScala
          .find(_.getName == "valid_to").get.asPrimitiveType()
        assert(tsField.getPrimitiveTypeName == PrimitiveType.PrimitiveTypeName.INT64,
          s"timestamp column written as ${tsField.getPrimitiveTypeName}, not INT64 — " +
            "INT96 dumps wrap out-of-ns-range values under pyarrow/pandas readers")
        tsField.getLogicalTypeAnnotation match {
          case ts: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
            assert(ts.getUnit == LogicalTypeAnnotation.TimeUnit.MICROS,
              s"timestamp unit ${ts.getUnit}, expected MICROS")
            assert(!ts.isAdjustedToUTC,
              "dump timestamps are adjusted-to-UTC — DuckDB/pandas read them " +
                "tz-aware and every cell fails equality vs the naive oracle")
          case other => fail(s"expected TIMESTAMP logical type, got $other")
        }
      } finally reader.close()

      // 2. Value round-trip for the registry's worst case: the naive
      //    read-back shows the same UTC wall clock the engine computed.
      val back = spark.read.parquet(out).select("valid_to").head
        .getAs[java.time.LocalDateTime]("valid_to")
      assert(back == java.time.LocalDateTime.of(9999, 12, 31, 0, 0, 0),
        s"sentinel round-trip drifted: $back")
    } finally {
      graft.streaming.SparkTestBase.deleteTree(dir)
    }
  }

  test("dumpPortable rewrites NESTED timestamps too (struct fields, array elements)") {
    // The recursion pin: a struct/array-of-timestamp column must not
    // slip through with isAdjustedToUTC=true (the a11/p06 failure
    // class would recur nested, uncovered by the top-level test).
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf("9999-12-31 00:00:00")
    val df = Seq((1L, (ts, "x"), Seq(ts))).toDF("id", "iv", "arr")
    val out = Verify.dumpPortable(df).schema
    val ivFields = out("iv").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(ivFields.fields(0).dataType == org.apache.spark.sql.types.TimestampNTZType,
      "struct-nested timestamp not normalized")
    assert(out("arr").dataType ==
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.TimestampNTZType, true),
      "array-nested timestamp not normalized")
    val r = Verify.dumpPortable(df).head
    assert(r.getStruct(1).getAs[java.time.LocalDateTime](0) ==
      java.time.LocalDateTime.of(9999, 12, 31, 0, 0, 0))
  }

  test("dumpPortable touches only timestamp columns and preserves values") {
    import spark.implicits._
    val df = Seq((1L, "x", 2.5, java.sql.Timestamp.valueOf("2024-01-02 03:04:05")))
      .toDF("id", "s", "d", "ts")
    val outSchema = Verify.dumpPortable(df).schema
    assert(outSchema("id").dataType == org.apache.spark.sql.types.LongType)
    assert(outSchema("s").dataType == org.apache.spark.sql.types.StringType)
    assert(outSchema("d").dataType == org.apache.spark.sql.types.DoubleType)
    assert(outSchema("ts").dataType == org.apache.spark.sql.types.TimestampNTZType)
    val r = Verify.dumpPortable(df).head
    assert(r.getAs[java.time.LocalDateTime]("ts") ==
      java.time.LocalDateTime.of(2024, 1, 2, 3, 4, 5))
  }
}
