package graft.streaming

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session (one per forked test JVM) with the driver's configs. */
trait SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestBase.session

  /** Delete a staged temp tree, deepest-first, closing the walk stream
    * (its directory descriptors leak otherwise). deleteOnExit is a
    * no-op on non-empty directories, so spec cleanup must call this. */
  def deleteTree(root: java.nio.file.Path): Unit = SparkTestBase.deleteTree(root)
}

object SparkTestBase {
  lazy val session: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    // same extension point the driver-facing GraftSession carries, so
    // plan tests see the plans users get (CapCollectBuckets included)
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Delete a staged temp tree, deepest-first, closing the walk stream
    * (its directory descriptors leak otherwise). deleteOnExit is a
    * no-op on non-empty directories, so spec cleanup must call this. */
  def deleteTree(root: java.nio.file.Path): Unit = {
    val walked = java.nio.file.Files.walk(root)
    try walked.sorted(java.util.Comparator.reverseOrder())
      .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
    finally walked.close()
  }
}
