package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `graft_hyperbands(ARRAY<FLOAT|DOUBLE>, bands, bits) → ARRAY<BIGINT>`
  *
  * Random-hyperplane SimHash band values for embedding LSH (s03): band
  * b's value has bit r set iff `v · hyperplane(b·bits + r) > 0`, where
  * component i of hyperplane k is the integer-valued (hence
  * DOUBLE-exact) LCG draw `((1103515245·(k·dim+i) + 12345) mod 2³¹)
  * mod 2001 − 1000` with `dim` = the input vector length. The DuckDB
  * oracle regenerates the identical values inline and folds the dot in
  * the same left-to-right IEEE order, so signs are bit-identical.
  *
  * Exists because the composed formulation — `bands·bits` `graft_dot`
  * calls against literal hyperplane arrays — inlines ~25 KB of
  * constants into the projection, bloating the generated method past
  * what JIT handles well (measured ~1.2 s/2k rows vs ~ms here). One
  * small codegen'd call with the LCG fused into the dot loop keeps the
  * stage inside tight compiled code at any signature width.
  */
case class HyperplaneBands(child: Expression, bands: Int, bits: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    // bands·bits <= 4096: hyperplane index k·dim+i must stay far below
    // Long.MaxValue / 1103515245 (~8.4e9) or the LCG multiply wraps and
    // the components silently diverge from the oracle's exact
    // arithmetic — with k < 4096 even million-dimensional vectors keep
    // k·dim+i < 4.1e9. (The sibling bound: MinHashPerms caps nperms.)
    case ArrayType(FloatType | DoubleType, _)
        if bands > 0 && bits > 0 && bits <= 63 && bands.toLong * bits <= 4096 =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"graft_hyperbands expects ARRAY<FLOAT|DOUBLE>, 0 < bits <= 63, " +
        s"and bands*bits <= 4096, got (${child.dataType}, bands=$bands, bits=$bits)")
  }

  /** NULL on a null element — a partial signature would silently put
    * the vector in wrong buckets exactly when the data is corrupt. */
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any =
    HyperplaneBands.compute(v.asInstanceOf[ArrayData], bands, bits, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"""
      ${ev.value} = graft.functions.HyperplaneBands$$.MODULE$$.compute($a, $bands, $bits, $isFloat);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneBands {
  /** Hot loop shared by interpreted eval and codegen: `bands·bits`
    * dots of `v` against LCG-generated hyperplanes, sequential double
    * accumulation. Returns null on a null element — and on an EMPTY
    * vector: every dot of a zero-length vector is 0, so empties would
    * all share the all-zero signature and collide into one hot bucket
    * with each other (the corrupt-data-must-not-look-like-a-duplicate
    * policy of MinHashPerms/SimHashFold, applied here). */
  def compute(a: ArrayData, bands: Int, bits: Int, isFloat: Boolean): GenericArrayData = {
    val n = a.numElements()
    if (n == 0) return null
    val out = new Array[Long](bands)
    var k = 0
    var b = 0
    while (b < bands) {
      var bv = 0L
      var r = 0
      while (r < bits) {
        val base = k.toLong * n
        var s = 0.0
        var i = 0
        while (i < n) {
          if (a.isNullAt(i)) return null
          val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
          val h = ((1103515245L * (base + i) + 12345L) % 2147483648L) % 2001L - 1000L
          s += x * h.toDouble
          i += 1
        }
        if (s > 0) bv |= 1L << r
        r += 1
        k += 1
      }
      out(b) = bv
      b += 1
    }
    new GenericArrayData(out)
  }
}
