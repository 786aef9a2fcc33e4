package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** BpeTrainer contract: the distributed trainer reproduces classic BPE
  * (Sennrich et al. 2016) exactly — merge sequence AND final symbol
  * tables — against a plain-Scala replica, including the greedy
  * overlap rule, and its round-1 decision coincides with the t34
  * query's first row on the real corpus. */
class BpeTrainerSpec extends graft.streaming.SparkTestBase {

  // ---- plain-Scala replica of classic BPE ----
  private def replicaPairs(vocab: Map[Vector[String], Long]): Map[(String, String), Long] =
    vocab.toSeq.flatMap { case (syms, c) =>
      syms.zip(syms.tail).map(p => p -> c)
    }.groupMapReduce(_._1)(_._2)(_ + _)

  private def replicaApply(syms: Vector[String], a: String, b: String): Vector[String] =
    syms.foldLeft(Vector.empty[String]) { (acc, x) =>
      if (acc.nonEmpty && acc.last == a && x == b) acc.init :+ (a + b)
      else acc :+ x
    }

  private def replicaFit(words: Map[String, Long], k: Int)
      : (Seq[(String, String, Long)], Map[String, Vector[String]]) = {
    var vocab = words.map { case (w, c) => w.map(_.toString).toVector -> (w, c) }
      .map { case (syms, (w, c)) => (w, syms, c) }.toSeq
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var done = false
    while (merges.length < k && !done) {
      val counts = replicaPairs(vocab.map(t => t._2 -> t._3).toMap)
      if (counts.isEmpty) done = true
      else {
        val ((a, b), n) = counts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
        merges += ((a, b, n))
        vocab = vocab.map { case (w, syms, c) => (w, replicaApply(syms, a, b), c) }
      }
    }
    (merges.toSeq, vocab.map(t => t._1 -> t._2).toMap)
  }

  private def wordsDf(words: Map[String, Long]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        words.toSeq.map { case (w, c) => Row(w, c) }, 2),
      StructType(Seq(StructField("word", StringType), StructField("wcount", LongType))))

  test("fit reproduces the Sennrich example's merge sequence and symbol tables") {
    // the worked example from the BPE paper: low/lower/newest/widest
    val words = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val (expMerges, expVocab) = replicaFit(words, 6)
    val (gotMerges, vocabDf) = BpeTrainer.fit(wordsDf(words), 6)
    try {
      assert(gotMerges.map(m => (m.a, m.b, m.count)) == expMerges,
        s"merge sequences diverge:\n got $gotMerges\n exp $expMerges")
      val gotVocab = vocabDf.collect()
        .map(r => r.getAs[String]("word") -> r.getSeq[String](r.fieldIndex("syms")).toVector)
        .toMap
      assert(gotVocab == expVocab)
    } finally vocabDf.unpersist()
  }

  test("greedy overlap rule: merging (a,a) on runs fuses left-to-right") {
    val words = Map("aaaa" -> 1L, "aaa" -> 2L, "aa" -> 3L)
    val (merges, vocabDf) = BpeTrainer.fit(wordsDf(words), 1)
    try {
      // positions: aaaa→3, aaa→2·2, aa→1·3 ⇒ (a,a) count 10
      assert(merges == Seq(BpeTrainer.Merge("a", "a", 10L)))
      val syms = vocabDf.collect()
        .map(r => r.getAs[String]("word") -> r.getSeq[String](r.fieldIndex("syms")).toVector)
        .toMap
      assert(syms("aaaa") == Vector("aa", "aa"))
      assert(syms("aaa") == Vector("aa", "a"))
      assert(syms("aa") == Vector("aa"))
    } finally vocabDf.unpersist()
  }

  test("empty and 1-char words contribute no pairs (sequence(1,0) counts DOWN)") {
    // Unguarded, Spark's descending sequence(1, 0) would hand the
    // empty word the symbol array ["", ""] and a phantom ("", "")
    // pair outweighing every real merge at high empty-token counts.
    val words = Map("" -> 1000000L, "x" -> 999L, "ab" -> 7L)
    val (merges, vocabDf) = BpeTrainer.fit(wordsDf(words), 2)
    try {
      assert(merges == Seq(BpeTrainer.Merge("a", "b", 7L)),
        s"expected the single real pair, got $merges")
      val syms = vocabDf.collect()
        .map(r => r.getAs[String]("word") -> r.getSeq[String](r.fieldIndex("syms")).toVector)
        .toMap
      assert(syms("") == Vector.empty)
      assert(syms("x") == Vector("x"))
    } finally vocabDf.unpersist()
  }

  test("symbols with SQL-literal metacharacters survive the merge fold") {
    val words = Map("d'o" -> 2L, "a\\b" -> 3L)
    val (merges, vocabDf) = BpeTrainer.fit(wordsDf(words), 2)
    try {
      val (expMerges, expVocab) = replicaFit(words, 2)
      assert(merges.map(m => (m.a, m.b, m.count)) == expMerges)
      val gotVocab = vocabDf.collect()
        .map(r => r.getAs[String]("word") -> r.getSeq[String](r.fieldIndex("syms")).toVector)
        .toMap
      assert(gotVocab == expVocab)
    } finally vocabDf.unpersist()
  }

  test("tokenize: fertility is monotone non-increasing in merge count, exact vs replica") {
    val sf = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, sf).limit(50)
      .select(col("doc_id"), col("text")).cache()
    try {
      val words = docs
        .select(explode(split(col("text"), " ")).as("word"))
        .groupBy(col("word")).agg(count(lit(1)).as("wcount"))
      val totals = Seq(0, 2, 5).map { k =>
        val (merges, vocab) = BpeTrainer.fit(words, k)
        try {
          val t = BpeTrainer.tokenize(docs, "doc_id", "text", vocab)
            .agg(sum(col("n_tokens")), sum(col("n_words"))).collect().head
          (merges.length, t.getLong(0), t.getLong(1))
        } finally vocab.unpersist()
      }
      // k=0: every token is a character — exact replica check
      val charTotal = docs.collect().map(_.getString(1).split(" ", -1)
        .map(_.length.max(0)).map(_.toLong).sum).sum
      assert(totals.head._2 == charTotal,
        s"k=0 token total ${totals.head._2} != character replica $charTotal")
      // same word universe each time, so n_words is invariant…
      assert(totals.map(_._3).distinct.size == 1)
      // …and each merge can only shorten segmentations
      assert(totals.sliding(2).forall { case Seq(a, b) => b._2 <= a._2 },
        s"fertility not monotone: $totals")
      assert(totals.last._2 < totals.head._2,
        "5 merges shortened nothing — the fixture measures nothing")
    } finally docs.unpersist()
  }

  test("on the corpus: 3 fitted merges match the replica, round 1 matches t34's top row") {
    val sf = "/root/testdata/sf0.001"
    val words = graft.Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("wcount"))
    val collected = words.collect()
      .map(r => r.getAs[String]("word") -> r.getAs[Long]("wcount")).toMap
    val (expMerges, _) = replicaFit(collected, 3)
    val (gotMerges, vocabDf) = BpeTrainer.fit(words, 3)
    try {
      assert(gotMerges.map(m => (m.a, m.b, m.count)) == expMerges)
      val top = graft.SparkEntry.queries("t34_bpe_merge_stats")(spark, sf)
        .collect().head
      assert(top.getAs[String]("pair") == gotMerges.head.a + gotMerges.head.b,
        "t34's top merge candidate is not the trainer's first merge")
      assert(top.getAs[Long]("n_occurrences") == gotMerges.head.count)
    } finally vocabDf.unpersist()
  }

  test("tokenize plans a BROADCAST hash join on the vocabulary side") {
    // The production apply path's scale contract: the corpus word
    // stream must never shuffle on `word` to meet the vocabulary —
    // the vocabulary (distinct words, ~MBs even at production merge
    // counts) broadcasts, and the per-doc rollup is the only
    // corpus-scale exchange. t35 rides this join at every SF.
    val sf = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, sf)
    val words = docs.select(explode(split(col("text"), " ")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("wcount"))
    val (_, vocab) = BpeTrainer.fit(words, 2)
    try {
      val qe = BpeTrainer.tokenize(docs, "doc_id", "text", vocab).queryExecution
      val text = graft.PlanTestUtils.formatted(qe)
      assert(text.contains("BroadcastHashJoin"),
        s"tokenize's vocabulary join is not a broadcast:\n$text")
      assert(!text.contains("SortMergeJoin"),
        "tokenize shuffles the corpus word stream to meet the vocabulary")
    } finally vocab.unpersist()
  }
}
