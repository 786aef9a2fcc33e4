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
    val spark = pairs.sparkSession
    val edges = pairs.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .unionByName(pairs.select(col(dstCol).as("src"), col(srcCol).as("dst")))
      .persist()
    // try/finally: the non-convergence throw (or any mid-loop failure)
    // must not leave the doubled edge list pinned in a long-lived
    // session's block manager.
    var pinned: DataFrame = null // currently-cached round (the last one stays)
    try {
      var labels = edges.select(col("src").as("doc")).distinct()
        .withColumn("cluster", col("doc"))
      var prevSum: java.math.BigDecimal = null
      var iter = 0
      var done = false
      while (!done && iter < maxIters) {
        val msgs = edges.alias("e")
          .join(labels.alias("l"), col("e.dst") === col("l.doc"))
          .select(col("e.src").as("doc"), col("l.cluster"))
        val next = labels.unionByName(msgs)
          .groupBy(col("doc")).agg(min(col("cluster")).as("cluster"))
          .persist()
        val sum = next.agg(org.apache.spark.sql.functions.sum(
          col("cluster").cast(DecimalType(38, 0)))).first().getDecimal(0)
        // Truncate lineage EXPLICITLY: persist alone leaves the logical
        // plan nesting the previous round's plan (doubling per round — a
        // 30-round chain ran out of heap merely stringifying it).
        // Re-wrapping the cached rows as a fresh DataFrame makes every
        // round's plan a shallow scan of the cached data, and lets the
        // previous round's blocks be unpersisted immediately — memory
        // stays at two label-table copies regardless of depth.
        labels = spark.createDataFrame(next.toDF().rdd, next.schema)
        if (pinned != null) pinned.unpersist()
        pinned = next
        done = if (sum == null) prevSum == null
               else prevSum != null && sum.compareTo(prevSum) == 0
        prevSum = sum
        iter += 1
      }
      if (!done) {
        if (pinned != null) pinned.unpersist()
        throw new IllegalStateException(
          s"connected components did not converge in $maxIters rounds")
      }
      // the final round's cache stays pinned: the returned plan reads it
      labels
    } finally edges.unpersist()
  }
}
