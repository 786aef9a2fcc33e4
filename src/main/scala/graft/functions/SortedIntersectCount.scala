package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `graft_sorted_icount(ARRAY<BIGINT>, ARRAY<BIGINT>) → BIGINT`
  *
  * Intersection cardinality of two SORTED-ascending distinct-element
  * arrays by two-pointer merge — the Jaccard verifier's inner loop.
  *
  * Why native: the verify stage runs once per CANDIDATE PAIR, and
  * pairs outnumber documents by the bucket fan-out — at 100 TB this
  * loop runs billions of times. `array_intersect` is semantically
  * identical but builds a hash set per evaluation and materializes the
  * intersection ARRAY just to take its size; the merge is
  * allocation-free, O(|a|+|b|), and compiles into whole-stage codegen.
  * The gram sets already arrive sorted — `signatures()` builds them
  * with `array_sort(collect_set(...))` — so the precondition is free.
  *
  * Contract: inputs MUST be sorted ascending with distinct elements
  * (as produced by `array_sort(collect_set(...))`); unsorted input
  * undercounts silently, exactly as an unsorted input breaks a merge
  * join. A null array or null element yields NULL (corrupt data must
  * not produce a plausible-but-wrong similarity — same policy as
  * [[FloatDotProduct]]).
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_sorted_icount expects ARRAY<BIGINT> inputs, got (${left.dataType}, ${right.dataType})")
  }

  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val (n, m) = (a.numElements(), b.numElements())
    var i = 0
    var j = 0
    var c = 0L
    while (i < n && j < m) {
      if (a.isNullAt(i) || b.isNullAt(j)) return null
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else { c += 1L; i += 1; j += 1 }
    }
    // The null contract must hold for elements PAST the shorter side's
    // exhaustion too: array_sort places nulls LAST, so trailing
    // positions are exactly where corrupt elements land — returning a
    // count here would be the plausible-but-wrong similarity the NULL
    // policy exists to prevent.
    while (i < n) { if (a.isNullAt(i)) return null; i += 1 }
    while (j < m) { if (b.isNullAt(j)) return null; j += 1 }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
        int $n = $a.numElements();
        int $m = $b.numElements();
        int $i = 0; int $j = 0; long $c = 0L;
        while ($i < $n && $j < $m) {
          if ($a.isNullAt($i) || $b.isNullAt($j)) { ${ev.isNull} = true; break; }
          long $x = $a.getLong($i);
          long $y = $b.getLong($j);
          if ($x < $y) { $i++; } else if ($x > $y) { $j++; } else { $c++; $i++; $j++; }
        }
        // trailing-null sweep of the unexhausted side (nulls sort last)
        while (!${ev.isNull} && $i < $n) { if ($a.isNullAt($i)) { ${ev.isNull} = true; } $i++; }
        while (!${ev.isNull} && $j < $m) { if ($b.isNullAt($j)) { ${ev.isNull} = true; } $j++; }
        if (!${ev.isNull}) { ${ev.value} = $c; }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
