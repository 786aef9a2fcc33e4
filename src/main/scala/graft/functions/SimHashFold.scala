package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `graft_simhash(ARRAY<BIGINT>, bits) → BIGINT`
  *
  * The SimHash fingerprint as ONE row-local fold over the document's
  * gram-hash set: bit b of the result is set iff
  * `Σ_v (((v >> b) & 1) == 1 ? +1 : −1) > 0` — exactly the 30 bit-vote
  * SUM aggregates + sign fold of the exploded formulation (and of the
  * DuckDB twin's `SUM(CASE ...) GROUP BY doc_id`), so fingerprints are
  * value-identical.
  *
  * Same rationale as [[MinHashPerms]]: the exploded formulation plans a
  * hash-aggregate with a corpus-wide exchange on doc_id; this makes the
  * fingerprint a pure projection, so d05's plan is scan → project →
  * sort and d06's only exchange is the band bucket shuffle.
  *
  * Votes are over the gram-hash SET — the caller passes the
  * deduplicated array (`array_distinct(graft_gramhash(text))`), and the
  * oracle twin applies `DISTINCT` at the same level, so multiplicity
  * semantics cannot drift between engines. NULL on a null element or
  * empty input. */
case class SimHashFold(child: Expression, bits: Int) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if bits > 0 && bits <= 62 =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash expects ARRAY<BIGINT> and 0 < bits <= 62, " +
        s"got (${child.dataType}, bits=$bits)")
  }

  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any =
    SimHashFold.compute(v.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"""
      Long ${ev.value}_boxed = graft.functions.SimHashFold$$.MODULE$$.compute($a, $bits);
      if (${ev.value}_boxed == null) { ${ev.isNull} = true; } else { ${ev.value} = ${ev.value}_boxed.longValue(); }
    """)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashFold {
  /** Hot loop shared by interpreted eval and codegen. Returns a boxed
    * Long (null = corrupt/empty input) so codegen can distinguish. */
  def compute(a: ArrayData, bits: Int): java.lang.Long = {
    val n = a.numElements()
    if (n == 0) return null
    val votes = new Array[Int](bits)
    var j = 0
    while (j < n) {
      if (a.isNullAt(j)) return null
      val v = a.getLong(j)
      var b = 0
      while (b < bits) {
        if (((v >> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      j += 1
    }
    var out = 0L
    var b = 0
    while (b < bits) {
      if (votes(b) > 0) out |= 1L << b
      b += 1
    }
    out
  }
}
