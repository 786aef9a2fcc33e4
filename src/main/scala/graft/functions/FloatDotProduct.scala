package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `graft_dot(ARRAY<FLOAT|DOUBLE>, ARRAY<FLOAT|DOUBLE>) → DOUBLE`
  *
  * Native codegen'd dot product for embedding similarity. The
  * higher-order-function formulation (`aggregate(zip_with(...))`)
  * allocates a lambda frame per element and is interpreted; this
  * expression compiles to a tight scalar loop inside whole-stage
  * codegen — the hot inner op of brute-force ANN over 100 TB of
  * vectors, so it must not be the interpreter's problem.
  *
  * Accumulation is a sequential left-to-right double sum (elements
  * widened float→double first), bit-identical to the DuckDB oracle's
  * `list_reduce(list_prepend(0.0, list_transform(...)))` formulation.
  */
case class FloatDotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): DataType = e.dataType match {
    case ArrayType(t, _) => t
    case _ => NullType
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(e => elemType(e) == FloatType || elemType(e) == DoubleType)
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects ARRAY<FLOAT|DOUBLE> inputs, got (${left.dataType}, ${right.dataType})")
  }

  /** NULL on ragged input: mismatched lengths or a null element yield
    * NULL (matching the SQL-oracle semantics of indexing past the end /
    * null propagation) — a silently truncated dot product would be a
    * plausible-but-wrong similarity exactly when the data is corrupt. */
  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) return null
    val aF = elemType(left) == FloatType
    val bF = elemType(right) == FloatType
    var s = 0.0
    var i = 0
    val n = a.numElements()
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aF) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bF) b.getFloat(i).toDouble else b.getDouble(i)
      s += x * y
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aGet = if (elemType(left) == FloatType) "getFloat" else "getDouble"
    val bGet = if (elemType(right) == FloatType) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
        if ($a.numElements() != $b.numElements()) {
          ${ev.isNull} = true;
        } else {
          int $n = $a.numElements();
          double $s = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
            $s += (double) $a.$aGet($i) * (double) $b.$bGet($i);
          }
          if (!${ev.isNull}) { ${ev.value} = $s; }
        }
      """
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Session-scoped registration of graft native functions (idempotent).
  * The builders are shared with [[graft.GraftExtensions]], which
  * injects the same functions at session construction for clusters
  * configured with `spark.sql.extensions=graft.GraftExtensions`. */
object GraftFunctions {

  /** name → expression builder, one definition for both registration
    * paths. */
  private[graft] val builders:
      Seq[(String, Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.expressions.Expression)] = Seq(
    "graft_dot" -> (exprs => FloatDotProduct(exprs(0), exprs(1))),
    "graft_strhash" -> (exprs => StringPolyHash(exprs.head)),
    "graft_gramhash" -> (exprs => GramHash(exprs.head)),
    "graft_minhash" -> (exprs => {
      require(exprs.length == 2 && exprs(1).foldable,
        "graft_minhash(hashes, nperms) expects a literal integer nperms")
      MinHashPerms(exprs.head, exprs(1).eval().asInstanceOf[Number].intValue)
    }),
    "graft_simhash" -> (exprs => {
      require(exprs.length == 2 && exprs(1).foldable,
        "graft_simhash(hashes, bits) expects a literal integer bits")
      SimHashFold(exprs.head, exprs(1).eval().asInstanceOf[Number].intValue)
    }),
    "graft_sorted_icount" -> (exprs => SortedIntersectCount(exprs(0), exprs(1))),
    "graft_hyperbands" -> (exprs => {
      require(exprs.length == 3 && exprs(1).foldable && exprs(2).foldable,
        "graft_hyperbands(vector, bands, bits) expects literal integer bands/bits")
      HyperplaneBands(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue,
        exprs(2).eval().asInstanceOf[Number].intValue)
    }),
    // Spark ships a production bloom filter pair for its own runtime
    // row-filtering but registers it internal-only
    // (FunctionRegistry.registerInternalExpression) — unreachable from
    // user SQL. Re-exposing the SAME expressions under graft names
    // (zero new sketch code) gives queries the ship-a-sketch-not-a-join
    // prefilter shape (d11): graft_bloom_agg(xxhash64(x), estItems,
    // numBits) builds a constant-size sketch with map-side partial
    // merges; graft_bloom_contains(sketchScalarSubquery, xxhash64(x))
    // probes it row-locally.
    "graft_bloom_agg" -> (exprs => {
      require(exprs.length == 3,
        "graft_bloom_agg(hash64, est_items, num_bits) expects 3 arguments")
      new org.apache.spark.sql.catalyst.expressions.aggregate
        .BloomFilterAggregate(exprs(0), exprs(1), exprs(2))
    }),
    "graft_bloom_contains" -> (exprs => {
      require(exprs.length == 2,
        "graft_bloom_contains(bloom, hash64) expects 2 arguments")
      org.apache.spark.sql.catalyst.expressions
        .BloomFilterMightContain(exprs(0), exprs(1))
    }))

  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}
