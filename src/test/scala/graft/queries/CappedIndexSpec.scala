package graft.queries

import graft.streaming.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.Aggregate
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

/** r17 verdict ask #5: the incremental probes (d22 LSH bands, m15
  * audio prints, m16 image aHash bands) must NOT recompute the
  * MaxBucket cap from the full index per invocation — at 100 TB that
  * is an index-scale aggregate per arrival batch. The cap now lives IN
  * the diskMemo materialization (over-cap postings are dropped when
  * the index is built, i.e. once per source regeneration), so a probe
  * is one equi-join against the materialized frame.
  *
  * Two structural pins per family:
  *  1. the materialized index frame itself satisfies the cap — no
  *     bucket exceeds MaxBucket (the cap is in the DATA, not re-derived
  *     by consumers);
  *  2. the probe's optimized plan contains no Aggregate whose leaves
  *     are ONLY memo scans — i.e. no aggregation that runs over index
  *     state alone. (Aggregates that consume the ingest⋈index join are
  *     the probe's own verdict rollups and are fine: their leaf sets
  *     include arrival-side scans.)
  */
class CappedIndexSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  /** Aggregates in the optimized logical plan whose entire leaf set is
    * graft_memo parquet scans — index-only aggregation a probe must
    * not contain. */
  private def indexOnlyAggregates(df: DataFrame): Seq[Aggregate] = {
    def isMemoScan(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) =
      p match {
        case lr: LogicalRelation => lr.relation match {
          case r: HadoopFsRelation =>
            r.location.rootPaths.exists(_.toString.contains("graft_memo"))
          case _ => false
        }
        case _ => false
      }
    df.queryExecution.optimizedPlan.collect {
      case a: Aggregate
        if a.collectLeaves().nonEmpty && a.collectLeaves().forall(isMemoScan) => a
    }
  }

  private def maxBucketSize(index: DataFrame, cols: Seq[String]): Long =
    index.groupBy(cols.map(col): _*).count()
      .agg(max(col("count"))).head.getLong(0)

  test("d22: the band index is capped in the materialization; the probe has no index-only aggregate") {
    val idx = DedupQueries.lshBandsBase(spark, sf)
    assert(maxBucketSize(idx, Seq("b", "bkey")) <= DedupQueries.MaxBucket)
    val arrivals = graft.Tables.documents(spark, sf).filter(col("doc_id") % 10 === 0)
    val probe = DedupQueries.probeLshIndex(spark, sf, arrivals, memo = false)
    assert(indexOnlyAggregates(probe).isEmpty,
      "the d22 probe still aggregates over index state alone")
  }

  test("m15: the print index is capped in the materialization; the probe has no index-only aggregate") {
    val idx = MultimodalQueries.audioFpIndexBase(spark, sf)
    assert(maxBucketSize(idx, Seq("subfp")) <= DedupQueries.MaxBucket)
    val arrivals = graft.multimodal.MediaPipeline.load(spark, sf)
      .filter(col("media_id") % 10 === 0)
    val probe = MultimodalQueries.probeAudioIndex(spark, sf, arrivals)
    assert(indexOnlyAggregates(probe).isEmpty,
      "the m15 probe still aggregates over index state alone")
  }

  test("m16: the aHash posting index is capped in the materialization; the probe has no index-only aggregate") {
    val idx = MultimodalQueries.imageAHashIndexBase(spark, sf)
    assert(maxBucketSize(idx, Seq("band", "bv")) <= DedupQueries.MaxBucket)
    val arrivals = graft.multimodal.MediaPipeline.load(spark, sf)
      .filter(col("media_id") % 10 === 0)
    val probe = MultimodalQueries.probeImageIndex(spark, sf, arrivals)
    assert(indexOnlyAggregates(probe).isEmpty,
      "the m16 probe still aggregates over index state alone")
  }

  test("the detector is not vacuous: an index-only aggregate IS detected when present") {
    val idx = DedupQueries.lshBandsBase(spark, sf)
    val withAgg = idx.groupBy(col("b"), col("bkey")).agg(count(lit(1)).as("c"))
    assert(indexOnlyAggregates(withAgg).nonEmpty,
      "detector failed to flag a hand-built index-only aggregate — " +
        "the three probe assertions above prove nothing")
  }
}
