package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Manual skew mitigation for equi-joins whose key distribution is too
  * hot for AQE's skew-join splitting (e.g. a power-law `user_id` where
  * one key holds 10% of 100 TB).
  *
  * The skewed (large) side gets a salt in `[0, numSalts)`; the other
  * side is replicated once per salt value. The shuffle then partitions
  * on `(key, salt)`, spreading the hot key over `numSalts` reducers at
  * the cost of replicating the small side `numSalts`×.
  */
object SkewJoin {

  /** Position-salted join.
    *
    * '''Precondition: the skewed side's partition contents and order
    * must be deterministic under task retry''' — a file/table scan (a
    * retried scan task re-reads the same split in the same order, as in
    * the a37 caller), a `localCheckpoint`ed frame, or a sorted shuffle
    * output. If the skewed side is the UNSORTED output of a shuffle,
    * a map-task retry after partial reduce fetches can replay rows in a
    * different order and re-route them to different salts, duplicating
    * or losing join rows (the SPARK-23207 failure class). For that case
    * use [[contentSaltedJoin]], which keys the salt on row content and
    * is retry-safe on any input.
    *
    * Why position and not content by default: a content hash sends all
    * duplicate rows of the hot key to ONE salt — exact-duplicate hot
    * rows (projected facts, repeated log lines) are precisely the skew
    * case, and they would still funnel through a single reducer while
    * the other side pays the full numSalts× replication.
    * monotonically_increasing_id is partition-local-sequential, so
    * consecutive duplicates round-robin across salts. The salt only
    * picks a reducer — any value yields a correct join — so under the
    * precondition above its retry behavior is reproducible.
    */
  def saltedJoin(skewed: DataFrame, other: DataFrame, key: String, numSalts: Int): DataFrame = {
    require(numSalts > 0, s"numSalts must be positive: $numSalts")
    val saltCol = pmod(monotonically_increasing_id(), lit(numSalts.toLong)).cast("int")
    joinSalted(skewed, other, key, numSalts, saltCol)
  }

  /** Content-salted join: salt = `xxhash64(all columns)` — a pure
    * function of the row, so task retries reproduce the same routing
    * regardless of upstream partition order (safe directly on shuffle
    * output, where [[saltedJoin]]'s precondition fails). The trade-off:
    * exact-duplicate rows share a salt and still funnel through one
    * reducer — use this when hot keys are many-distinct-rows (the
    * common case for wide fact rows), and [[saltedJoin]] over a
    * deterministic scan when they are exact duplicates.
    */
  def contentSaltedJoin(skewed: DataFrame, other: DataFrame, key: String, numSalts: Int): DataFrame = {
    require(numSalts > 0, s"numSalts must be positive: $numSalts")
    joinSalted(skewed, other, key, numSalts, contentSalt(skewed, numSalts))
  }

  /** The content-salt expression [[contentSaltedJoin]] routes by —
    * exposed (not inlined) so the retry-model test pins the REAL
    * expression rather than a hand-copied twin of it. */
  private[operators] def contentSalt(skewed: DataFrame, numSalts: Int): org.apache.spark.sql.Column =
    pmod(xxhash64(skewed.columns.map(col).toIndexedSeq: _*), lit(numSalts.toLong)).cast("int")

  private def joinSalted(skewed: DataFrame, other: DataFrame, key: String,
      numSalts: Int, saltCol: org.apache.spark.sql.Column): DataFrame = {
    val l = skewed.withColumn("__salt", saltCol)
    val r = other.withColumn("__salt", explode(sequence(lit(0), lit(numSalts - 1))))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }
}
