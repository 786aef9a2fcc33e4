package graft.operators

import graft.streaming.SparkTestBase
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkTestBase {

  test("salted join equals the plain join and spreads the hot key") {
    val s = spark
    import s.implicits._
    // 10k rows, 90% on one hot key
    val skewed = s.range(10000)
      .select((when(col("id") % 10 =!= 0, 7L).otherwise(col("id") % 100)).as("k"),
        col("id").as("payload"))
    val dim = s.range(100).select(col("id").as("k"), concat(lit("d"), col("id")).as("attr"))

    val plain = skewed.join(dim, "k")
      .select("k", "payload", "attr").collect().toSet
    val salted = SkewJoin.saltedJoin(skewed, dim, "k", numSalts = 8)
      .select("k", "payload", "attr").collect().toSet
    assert(salted == plain)

    // the shuffle must partition on (k, __salt), not k alone
    val planText = SkewJoin.saltedJoin(skewed, dim, "k", 8)
      .queryExecution.executedPlan.toString
    assert(planText.contains("__salt"), s"salt column absent from plan:\n$planText")
  }

  test("content-salted join equals the plain join and spreads distinct hot rows") {
    val s = spark
    import s.implicits._
    val skewed = s.range(10000)
      .select((when(col("id") % 10 =!= 0, 7L).otherwise(col("id") % 100)).as("k"),
        col("id").as("payload"))
    val dim = s.range(100).select(col("id").as("k"), concat(lit("d"), col("id")).as("attr"))

    val plain = skewed.join(dim, "k")
      .select("k", "payload", "attr").collect().toSet
    val salted = SkewJoin.contentSaltedJoin(skewed, dim, "k", numSalts = 8)
      .select("k", "payload", "attr").collect().toSet
    assert(salted == plain)

    // salt is a pure function of row content: the hot key's 9000
    // distinct payloads must land on every salt value, and recomputing
    // the IMPLEMENTATION's salt expression yields identical routing
    // (retry model) — SkewJoin.contentSalt, not a hand-copied twin.
    val saltsUsed = skewed.filter(col("k") === 7)
      .select(SkewJoin.contentSalt(skewed, 8).as("s"))
      .distinct().collect().map(_.getInt(0)).toSet
    assert(saltsUsed == (0 until 8).toSet,
      s"content salt failed to spread distinct hot rows: $saltsUsed")
  }
}
