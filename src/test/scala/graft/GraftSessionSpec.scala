package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The recommended-config contract: what a builder gets, verbatim. */
class GraftSessionSpec extends AnyFunSuite {

  test("recommended applies the sizing discipline to a builder") {
    // Piggyback on the shared test session's context: builder configs
    // land in the session conf even when the SparkContext is reused.
    val s = graft.streaming.SparkTestBase.session
    val b = GraftSession.recommended(SparkSession.builder(), 7)
    // Extract configs via a private-free route: apply to a fresh session
    // backed by the existing context.
    val s2 = b.getOrCreate()
    try {
      assert(s2.conf.get("spark.sql.adaptive.enabled") == "true")
      assert(s2.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true")
      assert(s2.conf.get("spark.sql.adaptive.coalescePartitions.enabled") == "true")
      assert(s2.conf.get("spark.sql.files.maxPartitionBytes") == "134217728")
      assert(s2.conf.get("spark.sql.ansi.enabled") == "false")
      assert(s2.conf.get("spark.sql.session.timeZone") == "UTC")
      assert(s2.conf.get("spark.sql.shuffle.partitions") == "7")
    } finally {
      // Restore the shared session's shuffle partitions (getOrCreate
      // applied ours onto the same session state).
      s2.conf.set("spark.sql.shuffle.partitions",
        s.sparkContext.getConf.get("spark.sql.shuffle.partitions", "4"))
    }
  }

  test("parallelism floor is 1") {
    val b = GraftSession.recommended(SparkSession.builder(), 0)
    val s2 = b.getOrCreate()
    try assert(s2.conf.get("spark.sql.shuffle.partitions") == "1")
    finally s2.conf.set("spark.sql.shuffle.partitions", "4")
  }
}
