package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Distributed connected components by iterative min-label propagation —
  * the clustering step of near-dup dedup (d07) as a reusable operator.
  *
  * Each round is one shuffle join (edges ⋈ labels) plus a
  * map-side-combinable MIN aggregate; rounds needed = max component
  * eccentricity. Near-dup clusters are shallow in practice; corpora
  * with deep similarity chains want the big-star/small-star contraction
  * (O(log n) rounds over the same join+MIN primitive) — this operator
  * fails loudly rather than emit a truncated fixpoint.
  *
  * Convergence is detected by the monotone checksum: labels only ever
  * decrease, so the fixpoint is reached exactly when sum(cluster) stops
  * changing — one scalar aggregate per round instead of a join against
  * the previous labels. Ids are cast to DECIMAL(38,0) inside the sum so
  * huge id spaces cannot wrap.
  */
object ConnectedComponents {

  /** @param pairs undirected edges as two numeric-id columns
    * @return (doc, cluster): every vertex labeled with its component's
    *         minimum id (the canonical survivor) */
  def run(pairs: DataFrame, srcCol: String, dstCol: String,
      maxIters: Int = 50): DataFrame = {
    val edges = pairs.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .unionByName(pairs.select(col(dstCol).as("src"), col(srcCol).as("dst")))
      .persist()
    var labels = edges.select(col("src").as("doc")).distinct()
      .withColumn("cluster", col("doc"))
    var prevSum: java.math.BigDecimal = null
    var iter = 0
    var done = false
    while (!done && iter < maxIters) {
      val msgs = edges.alias("e")
        .join(labels.alias("l"), col("e.dst") === col("l.doc"))
        .select(col("e.src").as("doc"), col("l.cluster"))
      // localCheckpoint, NOT persist: persist truncates re-execution but
      // the LOGICAL plan still nests the previous round's plan, doubling
      // per round — a 30-round chain OOMs merely stringifying the plan.
      // Checkpointing cuts the lineage so every round's plan is shallow.
      // (Each round's blocks stay resident until context GC — the label
      // table is one row per near-dup vertex, far smaller than the
      // corpus; bounded by maxIters.)
      val next = labels.unionByName(msgs)
        .groupBy(col("doc")).agg(min(col("cluster")).as("cluster"))
        .localCheckpoint(true)
      val sum = next.agg(org.apache.spark.sql.functions.sum(
        col("cluster").cast(DecimalType(38, 0)))).first().getDecimal(0)
      labels = next
      done = if (sum == null) prevSum == null
             else prevSum != null && sum.compareTo(prevSum) == 0
      prevSum = sum
      iter += 1
    }
    if (!done) throw new IllegalStateException(
      s"connected components did not converge in $maxIters rounds")
    edges.unpersist()
    // final labels cache stays pinned: the returned plan reads it, and
    // unpersisting here would recompute the whole fixpoint on first use.
    labels
  }
}
