package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `graft_minhash(ARRAY<BIGINT>, nperms) → ARRAY<BIGINT>`
  *
  * The 16-permutation MinHash signature as ONE row-local fold over the
  * document's gram-hash set: entry i is
  * `MIN((2i+1)·v + 40503·i mod 1e9+7)` over the input values — exactly
  * the MIN aggregates of the exploded formulation (and of the DuckDB
  * twin's `MIN(...) GROUP BY doc_id`), so signatures are value-identical.
  *
  * Why native, and why this matters more than the CPU constant: the
  * exploded formulation (`explode(gram hashes)` → `groupBy(doc_id)` →
  * 16 MIN aggregates) is an aggregation over a key the row ALREADY
  * holds — Spark still plans a hash-aggregate with a corpus-wide
  * exchange on doc_id under it. As a row-local expression the signature
  * stage becomes a pure projection: the MinHash/LSH pipeline's first
  * shuffle disappears entirely, and the only exchange left in the
  * d03/d04 family is the band-key bucket shuffle. At 100 TB that is a
  * full pass of the corpus that never hits the network.
  *
  * MIN over the hash SET equals MIN over the multiset, so the input may
  * be deduplicated or not. NULL on a null element or empty input (an
  * empty signature would collide with everything; corrupt data must
  * not look like a duplicate of it). */
case class MinHashPerms(child: Expression, nperms: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if nperms > 0 && nperms <= 1024 =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash expects ARRAY<BIGINT> and 0 < nperms <= 1024, " +
        s"got (${child.dataType}, nperms=$nperms)")
  }

  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any =
    MinHashPerms.compute(v.asInstanceOf[ArrayData], nperms)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"""
      ${ev.value} = graft.functions.MinHashPerms$$.MODULE$$.compute($a, $nperms);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashPerms {
  private val P = 1000000007L

  /** Hot loop shared by interpreted eval and codegen. Values v are
    * expected in [0, p) (gram hashes); (2i+1)·v stays < 2^41 for
    * nperms ≤ 1024, far from overflow. */
  def compute(a: ArrayData, nperms: Int): GenericArrayData = {
    val n = a.numElements()
    if (n == 0) return null
    val out = new Array[Long](nperms)
    java.util.Arrays.fill(out, Long.MaxValue)
    var j = 0
    while (j < n) {
      if (a.isNullAt(j)) return null
      val v = a.getLong(j)
      var i = 0
      while (i < nperms) {
        val h = ((2L * i + 1L) * v + 40503L * i) % P
        if (h < out(i)) out(i) = h
        i += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }
}
