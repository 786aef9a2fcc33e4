package graft.queries

import graft.streaming.SparkTestBase
import org.apache.spark.sql.functions._

/** The compaction operator's contract (s25's decision EXECUTED):
  *
  *  1. the decision actually fires on the driver corpus (tombstone
  *     fraction 1/7 ≥ the 1/8 garbage threshold), so s26's engine path
  *     exercises the compacted state, not the fallback;
  *  2. the compacted state is PHYSICAL: scan-rooted from the diskMemo
  *     materialization (supersede/retire + shutdown cleanup lifecycle
  *     for free), with no tombstoned vec_id and no emptied cell in it;
  *  3. serving equivalence, bit-identical: the s07-shape serve over
  *     the compacted state equals the serve over the query-time
  *     tombstone anti-join — the s24 reference path — row for row.
  *     (The driver's s26 hash gate re-proves this against DuckDB at
  *     every SF; this spec is the engine-side pin that fails fast.)
  */
class CompactionSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("the s25 compact decision fires on the driver corpus") {
    val d = graft.SparkEntry.queries("s25_refit_decision")(spark, sf).head
    assert(d.getAs[Boolean]("compact_for_garbage"),
      "fixture does not trigger compaction — s26 would silently test the fallback path")
    assert(d.getAs[Long]("n_deleted") > 0)
  }

  test("compacted state is scan-rooted, tombstone-free, and drops emptied cells") {
    val e = SimilarityQueries.vecs(spark, sf)
    val asg = SimilarityQueries.ivfAssigned(spark, sf)
    val tomb = SimilarityQueries.tombstones(e)
    val compacted = SimilarityQueries.compactedAssignment(spark, sf)

    // physical materialization: the returned plan reads the diskMemo
    // parquet (so the supersede/retire + shutdown-cleanup lifecycle
    // PersistedAggregatesSpec pins applies to this state too)
    val files = compacted.inputFiles
    assert(files.nonEmpty && files.forall(_.contains("graft_memo/ivf_asg_compacted")),
      s"compacted assignment is not served from its materialization: ${files.take(3).mkString(",")}")

    // no tombstoned id survives compaction
    assert(compacted.join(tomb, "vec_id").isEmpty,
      "tombstoned vec_id present in the compacted state")
    // row-set equality with the reference anti-join
    val live = SimilarityQueries.liveAssignment(asg, tomb)
    assert(compacted.count() == live.count())
    assert(compacted.exceptAll(live).isEmpty && live.exceptAll(compacted).isEmpty,
      "compacted state != live assignment")
    // emptied cells are gone by construction — and some cell really
    // empties on the fixture, or the drop claim is vacuous
    val cellsBefore = asg.select("cell").distinct().count()
    val cellsAfter = compacted.select("cell").distinct().count()
    assert(cellsAfter < cellsBefore,
      s"no cell emptied on the fixture ($cellsBefore -> $cellsAfter)")
  }

  test("serving over the compacted state is bit-identical to the anti-join path") {
    val e = SimilarityQueries.vecs(spark, sf)
    val probes = SimilarityQueries.probeTopCells(
      e, SimilarityQueries.ivfCentroids(spark, sf), SimilarityQueries.IngestProbes)
    val overCompacted = SimilarityQueries
      .serveOverAssignment(probes, e, SimilarityQueries.compactedAssignment(spark, sf))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val overAntiJoin = SimilarityQueries
      .serveOverAssignment(probes, e, SimilarityQueries.liveAssignment(
        SimilarityQueries.ivfAssigned(spark, sf), SimilarityQueries.tombstones(e)))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(overCompacted.nonEmpty && overCompacted == overAntiJoin,
      s"served results diverge (${overCompacted.size} vs ${overAntiJoin.size} rows)")
    // and the s26 registry query serves the compacted branch
    val s26 = graft.SparkEntry.queries("s26_compacted_serving")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(s26 == overCompacted)
  }
}
