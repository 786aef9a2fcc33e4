package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `graft_gramhash(STRING) → ARRAY<BIGINT>`
  *
  * Fused word-trigram shingle hashing: for `words = split(text, ' ')`
  * (Java split semantics with limit -1 — empty words kept), emits
  * `[polyhash(words(i) ∘ ' ' ∘ words(i+1) ∘ ' ' ∘ words(i+2))]` for
  * every trigram position, or `[polyhash(text)]` when the document has
  * fewer than three words — exactly the values of the composed
  * `transform(sequence(...), i -> concat_ws(' ', ...))` →
  * `graft_strhash(x)` pipeline, where `polyhash` is
  * [[StringPolyHash.hash]] (`fold((a, c) -> (a*131 + c) mod 1e9+7)`).
  *
  * Why native: the composed form materializes a transient STRING per
  * trigram per document (each word copied into ~3 shingle strings,
  * each shingle's characters folded from scratch) — at 100 TB that
  * allocation and triple re-hashing IS the dedup pipeline's CPU bill
  * (d03–d08). This expression makes ONE pass over the raw text:
  * each word's hash `h(w)` and length weight `131^|w| mod p` are
  * computed once, and each trigram hash is composed in O(1) from the
  * identity `h(x ∘ y) = h(x)·131^|y| + h(y) (mod p)` — zero string
  * allocation, each character folded exactly once.
  *
  * Value parity with the composed form (and therefore with the DuckDB
  * oracle's `w1 || ' ' || w2 || ' ' || w3` + char-fold twin) is pinned
  * by [[FunctionsParitySpec]] per trigram POSITION, not just as a set.
  *
  * The output is NOT deduplicated: every consumer either aggregates
  * idempotently (`MIN` permutation minima, `collect_set`) or wraps the
  * call in `array_distinct(...)` — deduplication on the hashed VALUES,
  * which both engines then apply identically (the string-level
  * `array_distinct` of the composed form differs only on intra-document
  * mod-1e9+7 collisions between distinct trigrams, a cross-engine
  * parity hazard this formulation removes).
  */
case class GramHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_gramhash expects STRING, got ${child.dataType}")

  override def nullSafeEval(v: Any): Any =
    GramHash.hashGrams(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GramHash.hashGrams($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GramHash {
  private val P = 1000000007L

  /** Static hot loop, callable from generated code. One pass over the
    * text; per-word `(hash, 131^len)` then O(1) composition per
    * trigram. Folds CODE POINTS (one step per astral character), and
    * the length weight counts code points, matching
    * [[StringPolyHash.hash]] and the DuckDB `ascii()` twin exactly —
    * the composition identity `h(x ∘ y) = h(x)·131^|y| + h(y) (mod p)`
    * needs `|y|` in fold steps, which are code points.
    *
    * MUST NOT be named `eval`: the expression class inherits
    * `eval(InternalRow)` from UnaryExpression, and scalac suppresses
    * the companion's static forwarder when the name collides — the
    * generated `graft.functions.GramHash.eval(utf8)` call then fails
    * Janino compilation and every whole-stage containing this
    * expression silently fell back to interpreted execution (found by
    * chasing the `ERROR CodeGenerator` in d03's verify log, round 8). */
  def hashGrams(text: UTF8String): ArrayData = {
    // Decode code points straight from the UTF-8 bytes — no toString,
    // no char[] copy (this loop is the dedup pipeline's CPU bill).
    // The space separator is the single byte 0x20, which can never be
    // confused with a continuation byte (those are >= 0x80).
    val n = text.numBytes
    var spaces = 0
    var k = 0
    while (k < n) { if (text.getByte(k) == 0x20) spaces += 1; k += 1 }
    val nWords = spaces + 1

    if (nWords < 3) {
      // < 3 words ⇒ the composed form falls back to hashing the whole
      // text (`ELSE array(text)`), spaces included.
      var a = 0L
      var i = 0
      while (i < n) {
        val b0 = text.getByte(i) & 0xFF
        var cp = 0
        var len = 1
        if (b0 < 0x80) cp = b0
        else if ((b0 & 0xE0) == 0xC0) { cp = b0 & 0x1F; len = 2 }
        else if ((b0 & 0xF0) == 0xE0) { cp = b0 & 0x0F; len = 3 }
        else if ((b0 & 0xF8) == 0xF0) { cp = b0 & 0x07; len = 4 }
        else cp = b0 // stray continuation / invalid lead: one step
        if (i + len > n) len = n - i // truncated tail: stay in bounds
        // Consume only GENUINE continuation bytes (0x80-0xBF): a
        // malformed lead must never swallow a following ASCII byte —
        // in the word loop below that byte can be the 0x20 separator,
        // and swallowing it desyncs this decode from the byte-level
        // space pre-count (zero-filled word slots, wrong trigrams).
        var j = 1
        while (j < len && (text.getByte(i + j) & 0xC0) == 0x80) {
          cp = (cp << 6) | (text.getByte(i + j) & 0x3F); j += 1
        }
        a = (a * 131 + cp) % P
        i += j
      }
      return new GenericArrayData(Array(a))
    }

    // Per-word hash and length weight: wh(w) = h(word_w),
    // wp(w) = 131^|word_w| mod p. Split on EVERY space (limit -1):
    // leading/trailing/double spaces yield empty words with
    // (hash 0, weight 1), exactly as split(text, ' ') produces them.
    val wh = new Array[Long](nWords)
    val wp = new Array[Long](nWords)
    var w = 0
    var a = 0L
    var pw = 1L
    var i = 0
    while (i < n) {
      val b0 = text.getByte(i) & 0xFF
      if (b0 == 0x20) {
        wh(w) = a; wp(w) = pw; w += 1; a = 0L; pw = 1L
        i += 1
      } else {
        var cp = 0
        var len = 1
        if (b0 < 0x80) cp = b0
        else if ((b0 & 0xE0) == 0xC0) { cp = b0 & 0x1F; len = 2 }
        else if ((b0 & 0xF0) == 0xE0) { cp = b0 & 0x0F; len = 3 }
        else if ((b0 & 0xF8) == 0xF0) { cp = b0 & 0x07; len = 4 }
        else cp = b0 // stray continuation / invalid lead: one step
        if (i + len > n) len = n - i // truncated tail: stay in bounds
        // genuine continuations only — never swallow a 0x20 separator
        // after a malformed lead (see the fallback loop's comment)
        var j = 1
        while (j < len && (text.getByte(i + j) & 0xC0) == 0x80) {
          cp = (cp << 6) | (text.getByte(i + j) & 0x3F); j += 1
        }
        a = (a * 131 + cp) % P
        pw = (pw * 131L) % P
        i += j
      }
    }
    wh(w) = a; wp(w) = pw

    // h(w1 ∘ ' ' ∘ w2 ∘ ' ' ∘ w3) composed left-to-right; every
    // intermediate stays < 2^60 (operands < p < 2^30).
    val out = new Array[Long](nWords - 2)
    var j = 0
    while (j < nWords - 2) {
      var h = wh(j)
      h = (h * 131 + 32L) % P
      h = (h * wp(j + 1) + wh(j + 1)) % P
      h = (h * 131 + 32L) % P
      h = (h * wp(j + 2) + wh(j + 2)) % P
      out(j) = h
      j += 1
    }
    new GenericArrayData(out)
  }
}
