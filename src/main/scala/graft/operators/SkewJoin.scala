package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Manual skew mitigation for equi-joins whose key distribution is too
  * hot for AQE's skew-join splitting (e.g. a power-law `user_id` where
  * one key holds 10% of 100 TB).
  *
  * The skewed (large) side gets a deterministic salt in `[0, numSalts)`
  * derived from the full row hash; the other side is replicated once per
  * salt value. The shuffle then partitions on `(key, salt)`, spreading
  * the hot key over `numSalts` reducers at the cost of replicating the
  * small side `numSalts`×.
  */
object SkewJoin {

  def saltedJoin(skewed: DataFrame, other: DataFrame, key: String, numSalts: Int): DataFrame = {
    require(numSalts > 0, s"numSalts must be positive: $numSalts")
    // Salt by ROW POSITION, not row content: a content hash sends all
    // duplicate rows of the hot key to ONE salt — exact-duplicate hot
    // rows (projected facts, repeated log lines) are precisely the
    // skew case, and they would still funnel through a single reducer
    // while the other side pays the full numSalts× replication.
    // monotonically_increasing_id is partition-local-sequential, so
    // consecutive duplicates round-robin across salts. The salt only
    // picks a reducer — any value is correct — so its task-retry
    // nondeterminism is harmless to the join result.
    val saltCol = pmod(monotonically_increasing_id(), lit(numSalts.toLong)).cast("int")
    val l = skewed.withColumn("__salt", saltCol)
    val r = other.withColumn("__salt", explode(sequence(lit(0), lit(numSalts - 1))))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }
}
