package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Cluster-wide registration of the native expressions via the
  * idiomatic extension point:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions …
  * }}}
  *
  * makes `graft_dot` / `graft_strhash` / `graft_hyperbands` available
  * in EVERY session the cluster creates — pure-SQL clients included —
  * without the imperative per-session
  * [[graft.functions.GraftFunctions.register]] call (which remains for
  * ad-hoc sessions and tests; both paths share one builder table). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  /** `DESCRIBE FUNCTION EXTENDED` must point at the implementing
    * expression, not this configurator. */
  private val implClasses: Map[String, Class[_]] = Map(
    "graft_dot" -> classOf[graft.functions.FloatDotProduct],
    "graft_strhash" -> classOf[graft.functions.StringPolyHash],
    "graft_gramhash" -> classOf[graft.functions.GramHash],
    "graft_minhash" -> classOf[graft.functions.MinHashPerms],
    "graft_simhash" -> classOf[graft.functions.SimHashFold],
    "graft_hyperbands" -> classOf[graft.functions.HyperplaneBands],
    "graft_bloom_agg" ->
      classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate],
    "graft_bloom_contains" ->
      classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain])

  override def apply(ext: SparkSessionExtensions): Unit = {
    graft.functions.GraftFunctions.builders.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(
          implClasses.getOrElse(name, this.getClass).getName, name),
        builder))
    }
    // Hot-bucket guard for user queries written collect-then-filter
    // (see the rule's scaladoc for the exact pattern and proof).
    ext.injectOptimizerRule(_ => graft.plans.CapCollectBuckets)
  }
}
