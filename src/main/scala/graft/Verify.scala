package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {

  /** The portable twin of a dump type: every session-zoned timestamp
    * — at any nesting depth (struct field, array element, map
    * key/value) — becomes `timestamp_ntz`; everything else passes
    * through. Recursion matters: a top-level-only rewrite would let a
    * future struct/array-of-timestamp column silently reintroduce the
    * tz-aware-vs-naive oracle mismatch this fix exists to kill. */
  private def portableType(dt: DataType): DataType = dt match {
    case TimestampType => TimestampNTZType
    case StructType(fields) => StructType(fields.map(f =>
      f.copy(dataType = portableType(f.dataType))))
    case ArrayType(et, n) => ArrayType(portableType(et), n)
    case MapType(kt, vt, n) => MapType(portableType(kt), portableType(vt), n)
    case other => other
  }

  /** Normalize a result frame to the PORTABLE dump encoding: every
    * session-zoned timestamp (top-level or nested) → `timestamp_ntz`,
    * so the parquet carries INT64 TIMESTAMP(MICROS, isAdjustedToUTC=false).
    * Two reader hazards die here (r16, the a40 red row):
    *  - INT96 (Spark's historical default for TimestampType) wraps
    *    out-of-ns-range values under pyarrow/pandas — the 9999-12-31
    *    SCD2 sentinel decoded as 1816-03-29; µs int64 is exact.
    *  - adjusted-to-UTC µs (the TIMESTAMP_MICROS session default for
    *    TimestampType) reads back tz-AWARE in DuckDB/pandas, while the
    *    DuckDB oracle computes naive timestamps — same instant, failed
    *    equality. NTZ µs reads naive everywhere.
    * The session runs UTC ([[GraftSession]]), so the cast is
    * wall-clock-preserving and value-identical to what naive readers
    * displayed for the old INT96 dumps. [[DumpPortabilitySpec]] pins
    * footer physical type + sentinel round-trip. */
  def dumpPortable(df: DataFrame): DataFrame =
    df.schema.fields.collect {
      case f if portableType(f.dataType) != f.dataType =>
        f.name -> portableType(f.dataType)
    }.foldLeft(df) { case (d, (n, t)) => d.withColumn(n, col(n).cast(t)) }
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional trailing name prefixes: dump only matching queries (local
    // iteration aid — the driver passes exactly two args, full dump)
    val only = args.drop(2)
    def wanted(name: String): Boolean =
      only.isEmpty || only.exists(name.startsWith)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = GraftSession.local(cpus, "graft-verify")
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Testdata-schema canary FIRST: the driver regenerated the parquet
    // mid-round before (r11: events.ts type flip → 29 scattered analysis
    // errors). Name the drifted column loudly, then still run every
    // query — tolerant ones keep their green rows.
    (Tables.schemaDrift(spark, sfDir) ++ Tables.contentDrift(spark, sfDir))
      .foreach { msg =>
        System.err.println(s"[verify] CANARY: $msg")
        println(s"[verify] CANARY: $msg")
      }
    SparkEntry.queries.toSeq.sortBy(_._1)
        .filter(kv => wanted(kv._1)).foreach { case (name, fn) =>
      try dumpPortable(fn(spark, sfDir)).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
