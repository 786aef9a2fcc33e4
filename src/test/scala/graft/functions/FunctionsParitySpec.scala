package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The two cross-engine primitives every dedup/similarity oracle rests
  * on, checked against plain-Scala models of the DuckDB formulas —
  * bit-for-bit, over randomized and adversarial inputs. The oracle gate
  * exercises them only through whole queries; this pins the primitives
  * themselves. */
class FunctionsParitySpec extends graft.streaming.SparkTestBase {

  /** DuckDB twin model: list_reduce(list_prepend(0, ascii codes),
    * (a, c) -> (a*131 + c) % 1e9+7). DuckDB's substr/ascii walk CODE
    * POINTS, so the model folds code points — one step per 🦀, value
    * 0x1F980, never two surrogate steps. */
  private def strhashModel(s: String): Long = {
    var a = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      a = (a * 131 + cp) % 1000000007L
      i += Character.charCount(cp)
    }
    a
  }

  /** DuckDB twin model: sequential left-to-right double fold. */
  private def dotModel(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0
    for (i <- a.indices) s += a(i).toDouble * b(i).toDouble
    s
  }

  test("graft_strhash matches the DuckDB fold model on random + edge ASCII strings") {
    val s = spark
    GraftFunctions.register(s)
    val rnd = new scala.util.Random(42)
    val printable = (32 to 126).map(_.toChar)
    val cases = Seq("", "a", " ", "~", "zzzzzzzzzzzzzzzzzzzzzzzz",
      printable.mkString) ++
      Seq.fill(200)(Seq.fill(rnd.nextInt(60) + 1)(
        printable(rnd.nextInt(printable.size))).mkString)
    val df = s.createDataFrame(
      java.util.Arrays.asList(cases.map(Row(_)): _*),
      StructType(Seq(StructField("x", StringType))))
    val got = df.select(expr("graft_strhash(x)")).collect().map(_.getLong(0))
    cases.zip(got).foreach { case (in, h) =>
      assert(h == strhashModel(in), s"hash mismatch for ${in.take(20)}…")
    }
  }

  test("graft_strhash folds astral-plane characters as single code points (DuckDB contract)") {
    val s = spark
    GraftFunctions.register(s)
    // 🦀 = U+1F980 (two UTF-16 units); a UTF-16 code-unit fold would
    // take two steps (0xD83E then 0xDD80) and diverge from DuckDB's
    // per-character ascii() model. Each expectation below is the
    // code-point fold computed by hand — the test passes DELIBERATELY,
    // not because model and implementation share a bug.
    val crab = 0x1F980L
    val cases = Seq(
      "🦀" -> crab % 1000000007L,
      "a🦀" -> (('a'.toLong * 131 + crab) % 1000000007L),
      "🦀b" -> ((crab % 1000000007L) * 131 + 'b'.toLong) % 1000000007L,
      // mixed BMP CJK (single unit) + astral musical symbol U+1D11E
      "水𝄞" -> (('水'.toLong * 131 + 0x1D11EL) % 1000000007L))
    val df = s.createDataFrame(
      java.util.Arrays.asList(cases.map(c => Row(c._1)): _*),
      StructType(Seq(StructField("x", StringType))))
    val got = df.select(expr("graft_strhash(x)")).collect().map(_.getLong(0))
    cases.zip(got).foreach { case ((in, want), h) =>
      assert(h == want, s"astral fold mismatch for '$in': got $h want $want")
      assert(h == strhashModel(in), s"model drift for '$in'")
    }
  }

  test("length() counts code points — Spark and DuckDB agree beyond the BMP") {
    // Pins the cross-engine contract the t01/t02 char metrics lean on:
    // Spark's `length` is UTF8String.numChars (UTF-8 sequences = code
    // points), DuckDB's `length` is code points — verified 3 for
    // '🦀ab' on both engines (🦀 = U+1F980, TWO UTF-16 units, so a
    // code-UNIT length would report 4 and diverge). No remaining
    // ASCII-only assumption in the length-based metrics.
    val s = spark
    val df = s.createDataFrame(
      java.util.Arrays.asList(Row("🦀ab"), Row("水𝄞"), Row("")),
      StructType(Seq(StructField("x", StringType))))
    val got = df.select(expr("length(x)")).collect().map(_.getInt(0)).toSeq
    assert(got == Seq(3, 2, 0), s"length() not code-point-counting: $got")
  }

  test("levenshtein edits code points in Spark — the d21 twin boundary is ASCII-only") {
    // Pins the Spark half of the d21 parity note: Spark's levenshtein
    // DP runs over CODE POINTS ('müller'→'muller' = 1 edit), while
    // DuckDB's runs over UTF-8 BYTES (measured: 2 for the same pair,
    // 4 for inserting 😀). On the single-byte driver corpus the two
    // coincide exactly (the m05/m08 ASCII assumption); a multilingual
    // deployment keeps these Spark semantics and demotes the DuckDB
    // twin to rows-only. This test fails if Spark ever switches its
    // unit, which would silently WIDEN the divergence to ASCII too.
    val s = spark
    val df = s.createDataFrame(
      java.util.Arrays.asList(
        Row("müller", "muller"), Row("a😀b", "ab"), Row("abc", "axc")),
      StructType(Seq(StructField("a", StringType), StructField("b", StringType))))
    val got = df.select(expr("levenshtein(a, b)")).collect().map(_.getInt(0)).toSeq
    assert(got == Seq(1, 1, 1), s"levenshtein not code-point-based: $got")
  }

  test("graft_gramhash equals the composed form on astral-plane words") {
    val s = spark
    GraftFunctions.register(s)
    // Words containing astral characters exercise the composition
    // identity h(x∘y) = h(x)·131^|y| + h(y): |y| must count code
    // points (🦀 = 1), or trigram hashes diverge from the composed
    // concat_ws+strhash form even when strhash itself is fixed.
    val cases = Seq("🦀 crab 🦀", "a🦀b c𝄞d e f", "🦀🦀 🦀 🦀 x", "水 𝄞水 水𝄞水 y")
    val df = s.createDataFrame(
      java.util.Arrays.asList(cases.map(Row(_)): _*),
      StructType(Seq(StructField("text", StringType))))
      .withColumn("words", split(col("text"), " "))
    val rows = df.select(expr("graft_gramhash(text)"), expr(composedGramHash)).collect()
    cases.zip(rows).foreach { case (in, r) =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"astral gramhash mismatch for '$in'")
    }
  }

  test("graft_dot is bit-identical to the sequential-fold model") {
    val s = spark
    GraftFunctions.register(s)
    val rnd = new scala.util.Random(7)
    val pairs = Seq.fill(100)((
      Array.fill(64)(rnd.nextFloat() * 2e3f - 1e3f),
      Array.fill(64)(rnd.nextFloat() * 2e3f - 1e3f))) :+
      ((Array.empty[Float], Array.empty[Float]))
    val df = s.createDataFrame(
      java.util.Arrays.asList(pairs.map { case (a, b) => Row(a.toSeq, b.toSeq) }: _*),
      StructType(Seq(
        StructField("a", ArrayType(FloatType, containsNull = false)),
        StructField("b", ArrayType(FloatType, containsNull = false)))))
    val got = df.select(expr("graft_dot(a, b)")).collect().map(_.getDouble(0))
    pairs.zip(got).foreach { case ((a, b), d) =>
      assert(java.lang.Double.doubleToLongBits(d) ==
        java.lang.Double.doubleToLongBits(dotModel(a, b)),
        s"dot bits differ: got $d want ${dotModel(a, b)}")
    }
  }

  test("graft_sorted_icount equals size(array_intersect) on random sorted sets") {
    val s = spark
    GraftFunctions.register(s)
    val rnd = new scala.util.Random(13)
    // Random distinct sorted sets over a small value domain so overlaps
    // are common; plus adversarial edges: empty, identical, disjoint.
    def set(): Seq[Long] =
      Seq.fill(rnd.nextInt(40))(rnd.nextInt(60).toLong).distinct.sorted
    val shared = set()
    val pairs = Seq.fill(200)((set(), set())) ++ Seq(
      (Seq.empty[Long], set()), (shared, shared),
      (Seq(1L, 2L, 3L), Seq(4L, 5L)))
    val df = s.createDataFrame(
      java.util.Arrays.asList(pairs.map { case (a, b) => Row(a, b) }: _*),
      StructType(Seq(
        StructField("a", ArrayType(LongType, containsNull = false)),
        StructField("b", ArrayType(LongType, containsNull = false)))))
    val rows = df.select(expr("graft_sorted_icount(a, b)"),
      size(array_intersect(col("a"), col("b"))).cast(LongType)).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1),
      s"merge count ${r.getLong(0)} != array_intersect ${r.getLong(1)}"))
  }

  /** The composed trigram-hash pipeline graft_gramhash fuses away:
    * split → per-position concat_ws(' ', wᵢ, wᵢ₊₁, wᵢ₊₂) →
    * graft_strhash — per POSITION (no dedup), so the test pins order
    * and multiplicity, not just the value set. */
  private val composedGramHash = """CASE WHEN size(words) >= 3
    THEN transform(sequence(1, size(words) - 2),
         i -> graft_strhash(concat_ws(' ', element_at(words, i),
                element_at(words, i+1), element_at(words, i+2))))
    ELSE array(graft_strhash(text)) END"""

  test("graft_gramhash equals the composed concat_ws+strhash form per position") {
    val s = spark
    GraftFunctions.register(s)
    val rnd = new scala.util.Random(99)
    val vocab = Seq("alpha", "b", "gamma7", "Zz", "~!", "0")
    def doc(): String =
      Seq.fill(rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    // Edges exercise the split(limit=-1) contract: empty text, <3 words,
    // leading/trailing/double spaces (empty words), repeated trigrams.
    val cases = Seq("", "one", "one two", "a b c", "a b c d e",
      " lead", "trail ", "dbl  space", "  ", "   ", "a a a a a a",
      "x y z x y z x y z") ++ Seq.fill(300)(doc())
    val df = s.createDataFrame(
      java.util.Arrays.asList(cases.map(Row(_)): _*),
      StructType(Seq(StructField("text", StringType))))
      .withColumn("words", split(col("text"), " "))
    val rows = df.select(expr("graft_gramhash(text)"),
      expr(composedGramHash)).collect()
    cases.zip(rows).foreach { case (in, r) =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1),
        s"gramhash mismatch for '${in.take(30)}'")
    }
  }

  test("graft_gramhash fallback hashes the whole text for <3-word docs") {
    val s = spark
    GraftFunctions.register(s)
    val df = s.createDataFrame(
      java.util.Arrays.asList(Row("two words"), Row(""), Row("  ")),
      StructType(Seq(StructField("text", StringType))))
    val rows = df.select(expr("graft_gramhash(text)"), expr("graft_strhash(text)")).collect()
    // "  " is three empty words → one trigram "  " = the whole text;
    // either branch must equal the full-text hash here.
    rows.foreach(r => assert(r.getSeq[Long](0) == Seq(r.getLong(1))))
  }

  test("graft_minhash equals the exploded MIN-aggregate model; graft_simhash the bit-vote model") {
    val s = spark
    GraftFunctions.register(s)
    val rnd = new scala.util.Random(4242)
    val arrays = Seq(Seq(0L), Seq(999999999L), Seq(1L, 1L, 1L)) ++
      Seq.fill(150)(Seq.fill(rnd.nextInt(80) + 1)(rnd.nextLong(1000000007L)))
    def minhashModel(vs: Seq[Long], nperms: Int): Seq[Long] =
      (0 until nperms).map(i => vs.map(v => ((2L * i + 1) * v + 40503L * i) % 1000000007L).min)
    def simhashModel(vs: Seq[Long], bits: Int): Long =
      (0 until bits).map { b =>
        val vote = vs.map(v => if (((v >> b) & 1L) == 1L) 1 else -1).sum
        if (vote > 0) 1L << b else 0L
      }.sum
    val df = s.createDataFrame(
      java.util.Arrays.asList(arrays.map(Row(_)): _*),
      StructType(Seq(StructField("g", ArrayType(LongType, containsNull = false)))))
    val rows = df.select(expr("graft_minhash(g, 16)"), expr("graft_simhash(g, 30)")).collect()
    arrays.zip(rows).foreach { case (vs, r) =>
      assert(r.getSeq[Long](0) == minhashModel(vs, 16), s"minhash mismatch for ${vs.take(5)}…")
      assert(r.getLong(1) == simhashModel(vs, 30), s"simhash mismatch for ${vs.take(5)}…")
    }
  }

  test("graft_minhash / graft_simhash null on empty or null-element input") {
    val s = spark
    GraftFunctions.register(s)
    val df = s.createDataFrame(
      java.util.Arrays.asList(Row(Seq.empty[java.lang.Long]), Row(Seq[java.lang.Long](1L, null))),
      StructType(Seq(StructField("g", ArrayType(LongType, containsNull = true)))))
    val rows = df.select(expr("graft_minhash(g, 16)"), expr("graft_simhash(g, 30)")).collect()
    assert(rows.forall(r => r.isNullAt(0) && r.isNullAt(1)))
  }

  test("malformed UTF-8 decodes in-bounds and deterministically (stray continuations, truncated tails)") {
    import org.apache.spark.unsafe.types.UTF8String
    // SQL-exposed functions see whatever bytes arrive; getByte is an
    // unchecked Platform read, so the decoder must never step past
    // numBytes. Contract (pinned by hand below): stray continuation or
    // invalid lead = one fold step of its raw byte value; a truncated
    // multi-byte tail clamps to the remaining bytes.
    def h(bytes: Int*): Long =
      StringPolyHash.hash(UTF8String.fromBytes(bytes.map(_.toByte).toArray))
    assert(h(0x80) == 128L) // lone continuation byte
    assert(h(0xFF) == 255L) // invalid lead (0xF8-0xFF)
    assert(h(0x41, 0xF0) == 65L * 131 + 0) // 4-byte lead truncated at end
    assert(h(0xE4, 0xB8) == ((0x04 << 6) | 0x38).toLong) // 3-byte lead, one continuation
    // gramhash self-consistency: a 3-word doc has exactly one trigram —
    // the whole text — so both decoders must agree on malformed bytes.
    def grams(bytes: Int*): Seq[Long] = {
      val u = UTF8String.fromBytes(bytes.map(_.toByte).toArray)
      val arr = GramHash.hashGrams(u)
      (0 until arr.numElements()).map(arr.getLong)
    }
    val doc = Seq(0x61, 0x20, 0x62, 0x20, 0x80, 0xF0) // "a b <80><F0>"
    assert(grams(doc: _*) == Seq(h(doc: _*)))
    val short = Seq(0x61, 0xFF, 0x20, 0xE4) // 2 words -> whole-text fallback
    assert(grams(short: _*) == Seq(h(short: _*)))
    // A malformed 4-byte lead RIGHT BEFORE a space separator: the lead
    // must not swallow the 0x20 (only genuine continuation bytes are
    // consumed), or the word decode desyncs from the byte-level space
    // pre-count and emits zero-filled word slots. 4 words -> 2 trigrams,
    // each equal to the strhash of its exact byte slice.
    val sep = Seq(0x61, 0x20, 0xF0, 0x20, 0x62, 0x20, 0x63) // "a <F0> b c"
    assert(grams(sep: _*) == Seq(h(sep.slice(0, 5): _*), h(sep.slice(2, 7): _*)))
  }

  test("graft_dot nulls on ragged or null-element input") {
    val s = spark
    GraftFunctions.register(s)
    val df = s.createDataFrame(
      java.util.Arrays.asList(
        Row(Seq[java.lang.Float](1f, 2f), Seq[java.lang.Float](1f)),
        Row(Seq[java.lang.Float](1f, null), Seq[java.lang.Float](1f, 2f))),
      StructType(Seq(
        StructField("a", ArrayType(FloatType, containsNull = true)),
        StructField("b", ArrayType(FloatType, containsNull = true)))))
    assert(df.select(expr("graft_dot(a, b)")).collect().forall(_.isNullAt(0)))
  }
}
