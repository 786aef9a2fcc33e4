package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Document deduplication for training-data pipelines, over `documents`:
  *
  *  - exact dedup        — full-text hash groupBy (shuffle on 128-bit hash,
  *                         not raw text: at 100 TB only the digest moves)
  *  - prefix fingerprint — cheap canonical-form dedup
  *  - MinHash + LSH      — shingle → 16-perm signature → 4 bands → bucket
  *                         equi-join. The join is on the band key, so the
  *                         shuffle is O(#docs·#bands), never O(#docs²).
  *  - n-gram Jaccard     — exact verification ONLY on LSH candidate pairs
  *                         (the classic prune-then-verify pipeline)
  *  - SimHash            — 32-bit near-dup fingerprint per document
  *
  * All hashing is md5-based so the DuckDB oracle computes bit-identical
  * values. MinHash permutation i is simulated as md5(i || ':' || shingle)
  * and the per-seed minimum is taken over the fixed-width hex strings
  * (lexicographic = numeric order for fixed-length hex).
  */
object DedupQueries {

  private def docs(s: SparkSession, dir: String): DataFrame = Tables.documents(s, dir)

  // ---- shared expression fragments (Spark SQL + DuckDB twins) ----

  private val shinglesSpark =
    "array_distinct(transform(sequence(1, greatest(length(text) - 4, 1)), i -> substring(text, i, 5)))"
  private val shinglesDuck =
    "list_distinct(list_transform(generate_series(1, greatest(length(text) - 4, 1)), i -> substr(text, i, 5)))"

  private val sigSpark =
    "transform(sequence(0, 15), s -> array_min(transform(sh, x -> md5(concat(cast(s AS string), ':', x)))))"
  private val sigDuck =
    "list_transform(generate_series(0, 15), s -> list_min(list_transform(sh, x -> md5(s::VARCHAR || ':' || x))))"

  /** DuckDB CTE producing (doc_id, b, bkey) band rows — twin of [[bands]]. */
  private val bandsDuckCte = s"""
    WITH shc AS (SELECT doc_id, $shinglesDuck AS sh FROM documents),
    sigc AS (SELECT doc_id, $sigDuck AS sig FROM shc),
    bands AS (
      SELECT doc_id, b,
             md5(sig[b*4+1] || '|' || sig[b*4+2] || '|' || sig[b*4+3] || '|' || sig[b*4+4]) AS bkey
      FROM sigc, (SELECT UNNEST(generate_series(0, 3)) AS b) bs)"""

  /** (doc_id, b, bkey): each doc emits 4 LSH band keys. */
  private def bands(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), expr(shinglesSpark).as("sh"))
      .select(col("doc_id"), expr(sigSpark).as("sig"))
      .select(col("doc_id"), explode(sequence(lit(0), lit(3))).as("b"), col("sig"))
      .select(col("doc_id"), col("b"),
        md5(concat_ws("|",
          expr("element_at(sig, b*4+1)"), expr("element_at(sig, b*4+2)"),
          expr("element_at(sig, b*4+3)"), expr("element_at(sig, b*4+4)"))).as("bkey"))

  /** Candidate near-dup pairs: docs sharing any LSH band bucket. */
  private def minhashPairs(s: SparkSession, dir: String): DataFrame = {
    val b = bands(s, dir)
    val l = b.select(col("b").as("lb"), col("bkey").as("lkey"), col("doc_id").as("doc_a"))
    val r = b.select(col("b").as("rb"), col("bkey").as("rkey"), col("doc_id").as("doc_b"))
    l.join(r, col("lb") === col("rb") && col("lkey") === col("rkey") && col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b")).distinct()
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Exact dedup summary: documents collapsed by full-text hash. */
  private def exactDedup(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .agg(count(lit(1)).as("total_docs"), countDistinct(md5(col("text"))).as("distinct_docs"))
      .select(col("total_docs"), col("distinct_docs"),
        (col("total_docs") - col("distinct_docs")).as("dups_removed"))

  /** Prefix-fingerprint dedup: emit every doc that would be dropped in
    * favor of the smallest doc_id sharing its 40-char-prefix hash. */
  private def prefixDedup(s: SparkSession, dir: String): DataFrame = {
    val t = docs(s, dir).select(col("doc_id"), md5(substring(col("text"), 1, 40)).as("fp"))
    val part = Window.partitionBy(col("fp"))
    t.withColumn("rn", row_number().over(part.orderBy(col("doc_id"))))
      .withColumn("keep_doc", min(col("doc_id")).over(part))
      .filter(col("rn") > 1)
      .select(col("doc_id"), col("keep_doc"), col("fp"))
      .orderBy(col("doc_id"))
  }

  /** Word-trigram sets for Jaccard verification. */
  private val gramsSpark = """array_distinct(CASE WHEN size(words) >= 3
    THEN transform(sequence(1, size(words) - 2),
         i -> concat_ws(' ', element_at(words, i), element_at(words, i+1), element_at(words, i+2)))
    ELSE array(text) END)"""
  private val gramsDuck = """CASE WHEN len(words) >= 3
    THEN list_distinct(list_transform(generate_series(1, len(words) - 2),
         i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]))
    ELSE [text] END"""

  /** Verify LSH candidates with exact n-gram Jaccard (prune-then-verify). */
  private def ngramJaccard(s: SparkSession, dir: String): DataFrame = {
    val g = docs(s, dir)
      .withColumn("words", split(col("text"), " "))
      .select(col("doc_id"), expr(gramsSpark).as("grams"))
    val pairs = minhashPairs(s, dir)
    pairs
      .join(g.select(col("doc_id").as("doc_a"), col("grams").as("ga")), Seq("doc_a"))
      .join(g.select(col("doc_id").as("doc_b"), col("grams").as("gb")), Seq("doc_b"))
      .withColumn("n_inter", size(array_intersect(col("ga"), col("gb"))).cast(LongType))
      .withColumn("n_union",
        (size(col("ga")) + size(col("gb"))).cast(LongType) - col("n_inter"))
      .select(col("doc_a"), col("doc_b"), col("n_inter"), col("n_union"),
        round(col("n_inter").cast(DoubleType) / col("n_union"), 4).as("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** 32-bit SimHash fingerprint per document (distinct-token majority
    * vote over md5 nibble bits). */
  private def simhash(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"),
        expr("transform(array_distinct(split(text, ' ')), t -> md5(t))").as("hs"))
      .select(col("doc_id"), expr("""
        aggregate(
          transform(sequence(0, 31), b ->
            CASE WHEN aggregate(hs, 0L, (acc, h) -> acc +
              (CASE WHEN (shiftright(
                 instr('0123456789abcdef', substring(h, CAST(b DIV 4 AS INT) + 1, 1)) - 1,
                 CAST(b % 4 AS INT)) % 2) = 1 THEN 1 ELSE -1 END)) > 0
            THEN shiftleft(CAST(1 AS BIGINT), CAST(b AS INT)) ELSE CAST(0 AS BIGINT) END),
          CAST(0 AS BIGINT), (a, x) -> a + x)""").as("simhash"))
      .orderBy(col("doc_id"))

  val defs: Seq[(String, QueryDef)] = Seq(
    "d01_exact_dedup" -> QueryDef(exactDedup, Some("""
      SELECT total_docs, distinct_docs, total_docs - distinct_docs AS dups_removed
      FROM (SELECT COUNT(*) AS total_docs, COUNT(DISTINCT md5(text)) AS distinct_docs
            FROM documents) t"""),
      "exact dedup by full-text hash"),

    "d02_prefix_dedup" -> QueryDef(prefixDedup, Some("""
      WITH t AS (SELECT doc_id, md5(substr(text, 1, 40)) AS fp FROM documents),
      w AS (SELECT doc_id, fp,
              ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn,
              MIN(doc_id) OVER (PARTITION BY fp) AS keep_doc
            FROM t)
      SELECT doc_id, keep_doc, fp FROM w WHERE rn > 1 ORDER BY doc_id"""),
      "prefix-fingerprint dedup (drop list)"),

    "d03_minhash_lsh" -> QueryDef(minhashPairs, Some(s"""$bandsDuckCte
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.b = b.b AND a.bkey = b.bkey AND a.doc_id < b.doc_id
      ORDER BY doc_a, doc_b"""),
      "MinHash LSH candidate pairs (16 perms, 4 bands)"),

    "d04_ngram_jaccard" -> QueryDef(ngramJaccard, Some(s"""$bandsDuckCte,
      cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
          ON a.b = b.b AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
      g AS (
        SELECT doc_id, $gramsDuck AS grams
        FROM (SELECT doc_id, text, string_split(text, ' ') AS words FROM documents) t)
      SELECT doc_a, doc_b,
        CAST(len(list_intersect(ga.grams, gb.grams)) AS BIGINT) AS n_inter,
        CAST(len(ga.grams) + len(gb.grams) - len(list_intersect(ga.grams, gb.grams)) AS BIGINT) AS n_union,
        ROUND(CAST(len(list_intersect(ga.grams, gb.grams)) AS DOUBLE) /
          (len(ga.grams) + len(gb.grams) - len(list_intersect(ga.grams, gb.grams))), 4) AS jaccard
      FROM cand JOIN g ga ON ga.doc_id = cand.doc_a JOIN g gb ON gb.doc_id = cand.doc_b
      ORDER BY doc_a, doc_b"""),
      "n-gram Jaccard verification of LSH candidates"),

    "d05_simhash" -> QueryDef(simhash, Some("""
      WITH h AS (SELECT doc_id,
                   list_transform(list_distinct(string_split(text, ' ')), t -> md5(t)) AS hs
                 FROM documents)
      SELECT doc_id,
        list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(generate_series(0, 31), b ->
          CASE WHEN list_reduce(list_prepend(0, list_transform(hs, h ->
                 CASE WHEN ((instr('0123456789abcdef', h[(b // 4) + 1]) - 1) >> (b % 4)) % 2 = 1
                      THEN 1 ELSE -1 END)), (a, x) -> a + x) > 0
          THEN (CAST(1 AS BIGINT) << b) ELSE CAST(0 AS BIGINT) END)), (a, x) -> a + x) AS simhash
      FROM h ORDER BY doc_id"""),
      "32-bit SimHash fingerprint per doc"))
}
