package graft.queries

import org.apache.spark.sql.catalyst.plans.logical.Window

/** Repo-wide unpartitioned-window whitelist (r15 verdict ask #4).
  *
  * An unpartitioned Window (`WindowExec: No Partition Defined`) runs
  * its whole input through ONE task — at 100 TB that is either a
  * deliberate, provably-bounded frame or a scalability bug. Until r17
  * the adjudications lived in scaladoc only; this spec makes them
  * structural: every registered query's optimized plan is swept for
  * Window nodes with an empty partitionSpec, and any query carrying
  * one must appear in the explicit whitelist below with its
  * boundedness reason. A NEW unpartitioned window anywhere in the
  * registry fails here by name until it is either partitioned or
  * adjudicated.
  *
  * Whitelist discipline: the frame must be bounded by a CONSTANT or a
  * pre-aggregated cardinality (bucket/cell/band counts), never by the
  * corpus. The registry's bounded single-task sorts that feed
  * TakeOrdered/Limit instead of Window are NOT in scope — Spark plans
  * those as distributed TakeOrderedAndProject.
  */
class WindowWhitelistSpec extends graft.streaming.SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  /** query name -> boundedness reason for every ADJUDICATED
    * unpartitioned window. Keep this list SHRINKING: a removal is
    * progress, an addition needs the same scrutiny the scaladoc
    * adjudications got. */
  private val whitelist: Map[String, String] = Map(
    // p-family: fleet-threshold windows run over POST-AGGREGATION rows
    // — one row per consumer (NumConsumers, a protocol constant), the
    // reduction having already happened scan-side. Computing the
    // thresholds as scalar aggregates instead would re-plan the events
    // aggregation per reference and rescan the fact table
    // (ProtocolQueries.monitorBase scaladoc).
    "p01_monitor_report" -> "post-agg rows = #consumers (protocol constant)",
    "p05_rebalance_target" -> "post-agg rows = #consumers (protocol constant)",
    "p09_claim_reassign" -> "post-agg rows = #consumers (protocol constant)",
    "p13_status_histogram" -> "post-agg rows = #consumers (protocol constant)",
    // PrefixSum hierarchical running sums: the only unpartitioned
    // window is step 3's per-range OFFSET pass over ≤ numRanges rows
    // (a parallelism constant sized like shuffle.partitions); the
    // corpus-scale running sums run partitioned inside each range
    // (PrefixSum scaladoc, 'Scale bounds, explicit').
    "t15_shard_assignment" -> "PrefixSum offsets window over <= ShardRanges rows",
    "t27_sequence_packing" -> "PrefixSum offsets window over <= numRanges rows",
    "t29_training_manifest" -> "PrefixSum offsets window over <= numRanges rows (spliced t27 packing)",
    // t33: the rank window runs AFTER .limit(ZipfTopV = 128) — a
    // constant-size frame by construction (TextQueries zipfFit
    // scaladoc: 'the rank window runs AFTER the limit').
    "t33_zipf_fit" -> "rank over <= ZipfTopV (128) post-limit rows")

  graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name: unpartitioned windows are whitelisted") {
      val unpartitioned = fn(spark, sf).queryExecution.optimizedPlan.collect {
        case w: Window if w.partitionSpec.isEmpty => w
      }
      if (unpartitioned.nonEmpty)
        assert(whitelist.contains(name),
          s"$name plans ${unpartitioned.size} unpartitioned Window(s) without " +
            s"an adjudicated boundedness reason:\n${unpartitioned.head}")
      else
        assert(!whitelist.contains(name),
          s"$name is whitelisted but plans no unpartitioned Window — remove the stale entry")
    }
  }
}
