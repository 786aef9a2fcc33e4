package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The recommended-config contract: what a builder gets, verbatim. */
class GraftSessionSpec extends AnyFunSuite {

  /** Every SQL conf `recommended` sets. getOrCreate applies them onto
    * the SHARED test session's state (the context is reused), so each
    * test snapshots all of them first and restores them afterwards —
    * restoring only shuffle.partitions (the round-4 shape) left ANSI /
    * timezone / AQE flags mutated for every later suite in the run. */
  private val touchedConfs = Seq(
    "spark.sql.shuffle.partitions",
    "spark.sql.adaptive.enabled",
    "spark.sql.adaptive.coalescePartitions.enabled",
    "spark.sql.adaptive.skewJoin.enabled",
    "spark.sql.files.maxPartitionBytes",
    "spark.sql.ansi.enabled",
    "spark.sql.session.timeZone",
    "spark.sql.parquet.outputTimestampType")

  private def withConfSnapshot[A](body: SparkSession => A): A = {
    val shared = graft.streaming.SparkTestBase.session
    // SQL confs live in the session state, not sparkContext.getConf —
    // snapshot from shared.conf (getOption: some may be unset).
    val saved = touchedConfs.map(k => k -> shared.conf.getOption(k))
    try body(shared)
    finally saved.foreach {
      case (k, Some(v)) => shared.conf.set(k, v)
      case (k, None)    => shared.conf.unset(k)
    }
  }

  test("recommended applies the sizing discipline to a builder") {
    withConfSnapshot { _ =>
      val b = GraftSession.recommended(SparkSession.builder(), 7)
      // Extract configs via a private-free route: apply to a session
      // backed by the existing context.
      val s2 = b.getOrCreate()
      assert(s2.conf.get("spark.sql.adaptive.enabled") == "true")
      assert(s2.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true")
      assert(s2.conf.get("spark.sql.adaptive.coalescePartitions.enabled") == "true")
      assert(s2.conf.get("spark.sql.files.maxPartitionBytes") == "134217728")
      assert(s2.conf.get("spark.sql.ansi.enabled") == "false")
      assert(s2.conf.get("spark.sql.session.timeZone") == "UTC")
      assert(s2.conf.get("spark.sql.shuffle.partitions") == "7")
      // Dump portability: µs int64 timestamps, never INT96 (which
      // nanosecond-based readers decode with wraparound for values
      // past 2262 — the a40 SCD2 sentinel class).
      assert(s2.conf.get("spark.sql.parquet.outputTimestampType") == "TIMESTAMP_MICROS")
    }
  }

  test("parallelism floor is 1") {
    withConfSnapshot { _ =>
      val s2 = GraftSession.recommended(SparkSession.builder(), 0).getOrCreate()
      assert(s2.conf.get("spark.sql.shuffle.partitions") == "1")
    }
  }
}
