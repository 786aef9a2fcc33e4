package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `graft_strhash(STRING) → BIGINT`
  *
  * Polynomial char-code hash `fold((a, c) -> (a*131 + c) mod 1e9+7)` —
  * the shingle hash of the MinHash pipeline. The higher-order-function
  * formulation folds an interpreted lambda per character; at 100 TB the
  * shingle hashing IS the dedup pipeline's CPU bill, so it compiles to
  * a static loop inside whole-stage codegen instead.
  *
  * Arithmetic is identical to the DuckDB oracle twin
  * (`list_reduce(list_prepend(0, list_transform(...ascii(substr(x,i,1))...)))`):
  * per-character code points, 131 multiplier, mod 1_000_000_007.
  *
  * '''Unicode contract: the fold iterates CODE POINTS, not UTF-16 code
  * units.''' DuckDB's `substr`/`length`/`ascii` all operate on code
  * points, so folding Java `charAt` units would diverge on any
  * astral-plane character (emoji, rare CJK): one 🦀 is ONE fold step
  * with value 0x1F980 in both engines, not two surrogate steps.
  * Pinned by FunctionsParitySpec's astral-plane case.
  */
case class StringPolyHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_strhash expects STRING, got ${child.dataType}")

  override def nullSafeEval(v: Any): Any =
    StringPolyHash.hash(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.StringPolyHash.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object StringPolyHash {
  /** Static hot loop, callable from generated code. Decodes code
    * points STRAIGHT FROM THE UTF-8 BYTES of the UnsafeRow-backed
    * string — zero per-row allocation (the previous `toString` +
    * `codePointAt` form paid a full byte[]→char[] decode and String
    * allocation per value, in the loop whose scaladoc calls it the
    * dedup pipeline's CPU bill). One fold step per code point, ASCII
    * fast path one byte; astral characters decode as single 4-byte
    * sequences — no surrogate recombination at all. Malformed input
    * (stray continuation bytes, truncated tails — SQL-exposed strings
    * aren't guaranteed valid UTF-8, and getByte is an unchecked
    * Platform read) steps one byte / clamps to the buffer:
    * deterministic hash, never an out-of-bounds read. */
  def hash(s: UTF8String): Long = {
    val n = s.numBytes
    var a = 0L
    var i = 0
    while (i < n) {
      val b0 = s.getByte(i) & 0xFF
      var cp = 0
      var len = 1
      if (b0 < 0x80) cp = b0
      else if ((b0 & 0xE0) == 0xC0) { cp = b0 & 0x1F; len = 2 }
      else if ((b0 & 0xF0) == 0xE0) { cp = b0 & 0x0F; len = 3 }
      else if ((b0 & 0xF8) == 0xF0) { cp = b0 & 0x07; len = 4 }
      else cp = b0 // stray continuation / invalid lead: one step, no tail read
      if (i + len > n) len = n - i // truncated tail: never read past the buffer
      // genuine continuation bytes only: a malformed lead must not
      // swallow following ASCII — GramHash splits words on 0x20 with
      // this same rule, and the two decoders must agree byte-for-byte
      var j = 1
      while (j < len && (s.getByte(i + j) & 0xC0) == 0x80) {
        cp = (cp << 6) | (s.getByte(i + j) & 0x3F); j += 1
      }
      a = (a * 131 + cp) % 1000000007L
      i += j
    }
    a
  }
}
