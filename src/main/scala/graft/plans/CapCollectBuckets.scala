package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, CollectList, Complete, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule generalizing the LSH hot-bucket fix
  * ([[graft.queries.DedupQueries.collectCappedBuckets]]) to ANY user
  * query written in the natural-but-hazardous shape:
  *
  * {{{
  *   df.groupBy(k…).agg(collect_list(x).as("ids"))
  *     .filter(size($"ids") <= K [&& size($"ids") >= L])
  * }}}
  *
  * As written, a degenerate hot group materializes its entire
  * collected array in one aggregation buffer BEFORE the size cap can
  * discard it — at scale, an executor OOM on the hottest key. The rule
  * rewrites to count-first:
  *
  * {{{
  *   Aggregate(k…, collect_list(x),
  *     Filter(L <= n <= K,
  *       Window(count(x) OVER (PARTITION BY k…) AS n, child)))
  * }}}
  *
  * so the group's rows are counted in a SPILLABLE window buffer and
  * dropped before any array exists; the collect then only ever sees
  * groups within the cap. Same single shuffle (the window and the
  * aggregate share the grouping keys).
  *
  * Semantics are preserved exactly: `size(collect_list(x))` equals the
  * per-group `count(x)` (both skip nulls), and a size predicate holds
  * for every row of a group or none, so dropping whole groups early
  * cannot change any other aggregate in the same Aggregate node. The
  * rule fires only when it can PROVE that reading:
  *
  *  - a single collect_list alias (optionally array_sort-wrapped —
  *    order-preserving, size-preserving), non-distinct, unfiltered;
  *  - every conjunct referencing that alias is a size-vs-literal
  *    comparison, at least one of which is an UPPER bound (the cap —
  *    without one the rewrite has nothing to guard against);
  *  - remaining conjuncts stay behind in a post-aggregation Filter.
  *
  * Activated via `spark.sql.extensions=graft.GraftExtensions`
  * (`injectOptimizerRule`); the rule is idempotent — the rewritten
  * plan no longer matches the pattern.
  */
object CapCollectBuckets extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan transformUp {
    // !isStreaming: a streaming aggregation accumulates groups ACROSS
    // micro-batches, but the rewrite's window would count only the
    // current batch's rows — filtering batch-locally against a cap
    // meant for the accumulated group. Batch plans only.
    case f @ Filter(cond, agg @ Aggregate(groupExprs, aggExprs, child, _))
        if agg.resolved && f.resolved && !child.isStreaming =>
      rewrite(cond, agg, groupExprs, aggExprs, child).getOrElse(f)
  }

  private def rewrite(cond: Expression, agg: Aggregate,
      groupExprs: Seq[Expression], aggExprs: Seq[NamedExpression],
      child: LogicalPlan): Option[LogicalPlan] = {
    // A global aggregate has no grouping keys: the rewrite's window
    // would put EVERY row in one partition — worse than the original
    // single collect buffer. Leave it alone.
    if (groupExprs.isEmpty) return None
    // The single collect_list alias (bare or array_sort-wrapped).
    val collects = aggExprs.flatMap {
      case a @ Alias(ae: AggregateExpression, _) =>
        collectListOf(ae).map(cl => (a, cl))
      case a @ Alias(ArraySort(ae: AggregateExpression, _, _), _) =>
        collectListOf(ae).map(cl => (a, cl))
      case _ => None
    }
    if (collects.length != 1) return None
    val (alias, collectFn) = collects.head
    val outAttr = alias.toAttribute

    val conjuncts = splitConjunctivePredicates(cond)
    val (sizePreds, rest) = conjuncts.partition(_.references.contains(outAttr))
    // Every predicate touching the alias must be size-vs-literal, with
    // at least one upper bound (the cap the rewrite exists to enforce).
    val bounds = sizePreds.map(asSizeBound(_, outAttr))
    if (sizePreds.isEmpty || bounds.exists(_.isEmpty)) return None
    if (!bounds.flatten.exists(_.isUpper)) return None

    val countExpr = AggregateExpression(
      Count(collectFn.child), Complete, isDistinct = false)
    val frame = SpecifiedWindowFrame(RowFrame, UnboundedPreceding, UnboundedFollowing)
    val bucketN = Alias(
      WindowExpression(countExpr, WindowSpecDefinition(groupExprs, Nil, frame)),
      "graft_bucket_n")()
    val windowNode = Window(Seq(bucketN), groupExprs, Nil, child)
    val preFilter = Filter(
      bounds.flatten.map(_.toPredicate(bucketN.toAttribute)).reduce(And),
      windowNode)
    val newAgg = agg.copy(child = preFilter)
    Some(if (rest.isEmpty) newAgg else Filter(rest.reduce(And), newAgg))
  }

  private def collectListOf(ae: AggregateExpression): Option[CollectList] =
    ae.aggregateFunction match {
      case cl: CollectList if !ae.isDistinct && ae.filter.isEmpty => Some(cl)
      case _ => None
    }

  /** A provable size-vs-literal bound on the collect output. */
  private case class SizeBound(op: String, value: Long) {
    def isUpper: Boolean = op == "<=" || op == "<" || op == "="
    def toPredicate(n: Attribute): Expression = op match {
      case "<=" => LessThanOrEqual(n, Literal(value, LongType))
      case "<"  => LessThan(n, Literal(value, LongType))
      case ">=" => GreaterThanOrEqual(n, Literal(value, LongType))
      case ">"  => GreaterThan(n, Literal(value, LongType))
      case "="  => EqualTo(n, Literal(value, LongType))
    }
  }

  private def asSizeBound(e: Expression, out: Attribute): Option[SizeBound] = {
    def sizeOf(x: Expression): Boolean = x match {
      case Size(a: Attribute, _) => a.semanticEquals(out)
      case _ => false
    }
    def litOf(x: Expression): Option[Long] = x match {
      case Literal(v: Int, IntegerType) => Some(v.toLong)
      case Literal(v: Long, LongType)   => Some(v)
      case _ => None
    }
    e match {
      case LessThanOrEqual(s, l) if sizeOf(s) => litOf(l).map(SizeBound("<=", _))
      case LessThan(s, l) if sizeOf(s)        => litOf(l).map(SizeBound("<", _))
      case GreaterThanOrEqual(s, l) if sizeOf(s) => litOf(l).map(SizeBound(">=", _))
      case GreaterThan(s, l) if sizeOf(s)     => litOf(l).map(SizeBound(">", _))
      case EqualTo(s, l) if sizeOf(s)         => litOf(l).map(SizeBound("=", _))
      case LessThanOrEqual(l, s) if sizeOf(s) => litOf(l).map(SizeBound(">=", _))
      case LessThan(l, s) if sizeOf(s)        => litOf(l).map(SizeBound(">", _))
      case GreaterThanOrEqual(l, s) if sizeOf(s) => litOf(l).map(SizeBound("<=", _))
      case GreaterThan(l, s) if sizeOf(s)     => litOf(l).map(SizeBound("<", _))
      case EqualTo(l, s) if sizeOf(s)         => litOf(l).map(SizeBound("=", _))
      case _ => None
    }
  }
}
