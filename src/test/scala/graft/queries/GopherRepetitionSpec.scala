package graft.queries

import org.apache.spark.sql.functions._

/** Contract tests for t19's row-local mass reductions.
  *
  * The corpus genuinely contains zero duplicated 5-grams (verified by
  * direct DuckDB count at sf0.001 and sf0.01), so the oracle exercises
  * the dup-{5..10} branch only at mass 0 — these tests pin the nonzero
  * semantics against hand-computed expectations on constructed
  * documents, so the branch is tested even though the synthetic corpus
  * never trips it. */
class GopherRepetitionSpec extends graft.streaming.SparkTestBase {

  private def masses(text: String, n: Int): (Long, Long) = {
    val s = spark
    import s.implicits._
    val sg = TextQueries.sortedGramsExpr(n)
    val row = Seq(text).toDF("text")
      .withColumn("words", split(col("text"), " "))
      .select(
        expr(TextQueries.topMassExpr(s"($sg)")).as("top"),
        expr(TextQueries.dupMassExpr(s"($sg)")).as("dup"))
      .head()
    (row.getLong(0), row.getLong(1))
  }

  test("top mass: most frequent bigram's occurrence-summed chars") {
    // "a b" x3 (3 chars each), "b a" x2 -> top = 3*3 = 9.
    assert(masses("a b a b a b", 2) == ((9L, 15L)))
    // dup = 3*3 + 2*3 = 15 (both bigrams duplicated).
  }

  test("dup mass: sum over duplicated grams only, singletons excluded") {
    // 8 words, 5-grams: "x y x y x" x2 (9 chars), "y x y x y" x2 -> 2*9+2*9=36.
    assert(masses("x y x y x y x y", 5) == ((18L, 36L)))
    // A gram occurring once adds nothing: 5 distinct words, 1 gram.
    assert(masses("a b c d e", 5) == ((9L, 0L)))
  }

  test("longer gram beats more-frequent shorter gram when its mass is larger") {
    // bigrams: "aa bb" x2 (5 chars, mass 10), "bb aa" x1, "bb cc" x1
    // -> top mass 10 even though it ties nothing in count terms.
    assert(masses("aa bb aa bb cc", 2)._1 == 10L)
  }

  test("docs shorter than n produce zero masses, no flags") {
    assert(masses("solo", 5) == ((0L, 0L)))
    assert(masses("one two", 5) == ((0L, 0L)))
    // Exactly n words: one gram, top = its length, dup = 0.
    assert(masses("a b c d e", 5)._1 == 9L)
  }

  test("run-length reduction equals the relational groupBy formulation") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val vocab = Vector("a", "bb", "ccc", "dd", "e")
    val texts = Seq.tabulate(50)(_ =>
      Seq.fill(3 + rnd.nextInt(40))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    for (n <- Seq(2, 5)) {
      val sg = TextQueries.sortedGramsExpr(n)
      val got = texts.toDF("text").withColumn("doc_id", monotonically_increasing_id())
        .withColumn("words", split(col("text"), " "))
        .select(col("doc_id"),
          expr(TextQueries.topMassExpr(s"($sg)")).as("top"),
          expr(TextQueries.dupMassExpr(s"($sg)")).as("dup"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val want = texts.toDF("text").withColumn("doc_id", monotonically_increasing_id())
        .withColumn("words", split(col("text"), " "))
        .select(col("doc_id"), explode_outer(expr(TextQueries.sortedGramsExpr(n))).as("g"))
        .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"))
        .agg(
          coalesce(max(col("c") * length(col("g"))), lit(0L)).as("top"),
          coalesce(sum(when(col("c") > 1, col("c") * length(col("g"))).otherwise(0L)),
            lit(0L)).as("dup"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == want, s"n=$n")
    }
  }
}
