package graft.queries

import graft.streaming.SparkTestBase
import org.apache.spark.sql.functions._

/** t36 contract — the s25 decision-table discipline applied to the BPE
  * layer: the refit trigger must be an exact integer comparison of the
  * report's own columns, non-degenerate on the fixture (sources land
  * on BOTH sides, or the threshold measures nothing), and the drift
  * mechanism — the character-fallback miss path for words the fitted
  * vocabulary has never seen — must actually be the tokenize behavior
  * the delta is built from. */
class BpeDriftSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("refit_needed is the exact cross-multiplied comparison of the row's own sums") {
    val rows = graft.SparkEntry.queries("t36_bpe_fertility_drift")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (tf, wf) = (r.getAs[Long]("n_tokens_fit"), r.getAs[Long]("n_words_fit"))
      val (ta, wa) = (r.getAs[Long]("n_tokens_arr"), r.getAs[Long]("n_words_arr"))
      val expected = BigInt(TextQueries.BpeDriftDen) *
        (BigInt(ta) * BigInt(wf) - BigInt(tf) * BigInt(wa)) >
        BigInt(TextQueries.BpeDriftNum) * BigInt(wa) * BigInt(wf)
      assert(r.getAs[Boolean]("refit_needed") == expected,
        s"${r.getAs[String]("source")}: refit_needed != exact integer comparison")
      // the rounded doubles derive from the same sums (valueOf, not
      // the exact-binary BigDecimal(double) constructor — Spark's
      // round goes through the canonical decimal representation)
      assert(r.getAs[Double]("fertility_fit") ==
        BigDecimal(java.math.BigDecimal.valueOf(tf.toDouble / wf))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
  }

  test("the decision is non-degenerate: sources land on both sides of the threshold") {
    val verdicts = graft.SparkEntry.queries("t36_bpe_fertility_drift")(spark, sf)
      .select(col("refit_needed")).collect().map(_.getBoolean(0)).toSet
    assert(verdicts == Set(true, false),
      s"threshold 1/64 is degenerate on the fixture: only $verdicts")
  }

  test("every source has BOTH a fitted history and an arrival batch " +
      "(the block convention de-confounds source from the arrival slice)") {
    // the driver corpus assigns source = src(doc_id % 20); the d09
    // %-10 convention would give src0/src10 arrivals with no fit-time
    // rows at all — the t36 block convention must cover every source
    // on both sides, or the per-source delta silently loses sources
    val all = graft.Tables.documents(spark, sf)
      .select(col("source")).distinct().collect().map(_.getString(0)).toSet
    val reported = graft.SparkEntry.queries("t36_bpe_fertility_drift")(spark, sf)
      .collect()
    assert(reported.map(_.getAs[String]("source")).toSet == all,
      "a source is missing from the drift report")
    reported.foreach { r =>
      assert(r.getAs[Long]("n_docs_fit") > 0 && r.getAs[Long]("n_docs_arr") > 0,
        s"${r.getAs[String]("source")}: one slice is empty")
    }
  }

  test("an arrival word the base vocabulary never saw pays the character fallback") {
    val s = spark
    import s.implicits._
    // fitted base vocabulary: two words; the arrival doc carries one
    // in-vocabulary word and one unseen word
    val words = Seq(("abab", 5L), ("cd", 3L)).toDF("word", "wcount")
    val (_, vocabFull) = graft.operators.BpeTrainer.fit(words, 2)
    val vocab = vocabFull.select(col("word"), col("syms"))
    val arrival = Seq((1L, "abab zzzzz")).toDF("doc_id", "text")
    val row = graft.operators.BpeTrainer
      .tokenize(arrival, "doc_id", "text", vocab).collect().head
    val ababSyms = vocabFull.filter(col("word") === "abab")
      .select(size(col("syms"))).head.getInt(0)
    assert(row.getAs[Long]("n_words") == 2L)
    assert(row.getAs[Long]("n_tokens") == ababSyms.toLong + 5L,
      "unseen word did not fall back to character count")
    vocabFull.unpersist()
  }
}
