package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Similarity search over the `embeddings` table (ARRAY<FLOAT>, 64-dim):
  *
  *  - s01: brute-force cosine top-k — the correctness baseline. Query set
  *    is a broadcastable slice; candidates stream through, so the plan is
  *    a broadcast-nested-loop + per-partition top-k (no full shuffle).
  *  - s02: cluster-pruned (IVF-style) top-k — candidates restricted to
  *    the query's cluster. This is the 100 TB path: with C clusters the
  *    scan shrinks ~C×, and the cluster equi-join shuffles by cluster id.
  *  - s03: embedding near-dup pairs within clusters — cosine analog of
  *    the MinHash prune-then-verify dedup.
  *
  * Dot products run in DOUBLE via a sequential higher-order fold, which
  * both Spark (`aggregate`) and DuckDB (`list_reduce`) evaluate in the
  * same IEEE order → bit-identical cosines.
  */
object SimilarityQueries {

  /** Native codegen'd dot product (graft.functions.FloatDotProduct) —
    * same sequential-double accumulation as the DuckDB oracle. */
  private def dotSpark(a: String, b: String): String = s"graft_dot($a, $b)"

  /** (vec_id, label, v FLOAT[], nrm) — normalized working set. */
  private def vecs(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    Tables.embeddings(s, dir)
      .select(col("vec_id"), col("label"), col("embedding").as("v"))
      .withColumn("nrm", expr(s"sqrt(${dotSpark("v", "v")})"))
  }

  private val vecsDuckCte = """
    WITH v AS (
      SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings),
    n AS (
      SELECT vec_id, label, v,
        sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
          list_transform(generate_series(1, len(v)), i -> v[i] * v[i])), (a, z) -> a + z)) AS nrm
      FROM v)"""

  private val cosDuck =
    """list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       list_transform(generate_series(1, greatest(len(q.v), len(c.v))), i -> q.v[i] * c.v[i])), (a, z) -> a + z)
       / (q.nrm * c.nrm)"""

  /** Brute-force cosine top-5 for each query vector (vec_id % 50 = 0). */
  private def annBruteForce(s: SparkSession, dir: String): DataFrame = {
    val e = vecs(s, dir)
    val q = e.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
    val c = e.select(col("vec_id").as("c_id"), col("v").as("cv"), col("nrm").as("cn"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("c_id"))
    broadcast(q).join(c, col("q_id") =!= col("c_id"))
      .withColumn("cos", expr(dotSpark("qv", "cv")) / (col("qn") * col("cn")))
      .withColumn("rnk", row_number().over(w).cast(LongType))
      .filter(col("rnk") <= 5)
      .select(col("q_id"), col("c_id"), col("rnk"), round(col("cos"), 6).as("cosine"))
      .orderBy(col("q_id"), col("rnk"))
  }

  /** IVF-style pruned top-5: only candidates in the query's cluster
    * (cluster = label) are scored. */
  private def annClusterPruned(s: SparkSession, dir: String): DataFrame = {
    val e = vecs(s, dir)
    val q = e.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("q_id"), col("label").as("q_label"),
        col("v").as("qv"), col("nrm").as("qn"))
    val c = e.select(col("vec_id").as("c_id"), col("label").as("c_label"),
      col("v").as("cv"), col("nrm").as("cn"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("c_id"))
    q.join(c, col("q_label") === col("c_label") && col("q_id") =!= col("c_id"))
      .withColumn("cos", expr(dotSpark("qv", "cv")) / (col("qn") * col("cn")))
      .withColumn("rnk", row_number().over(w).cast(LongType))
      .filter(col("rnk") <= 5)
      .select(col("q_id"), col("c_id"), col("q_label").as("label"),
        col("rnk"), round(col("cos"), 6).as("cosine"))
      .orderBy(col("q_id"), col("rnk"))
  }

  /** Near-dup pairs within clusters: top-50 same-label pairs by cosine. */
  private def embeddingNearDup(s: SparkSession, dir: String): DataFrame = {
    val e = vecs(s, dir)
    val a = e.select(col("vec_id").as("id_a"), col("label").as("la"),
      col("v").as("va"), col("nrm").as("na"))
    val b = e.select(col("vec_id").as("id_b"), col("label").as("lb"),
      col("v").as("vb"), col("nrm").as("nb"))
    a.join(b, col("la") === col("lb") && col("id_a") < col("id_b"))
      .withColumn("cos", expr(dotSpark("va", "vb")) / (col("na") * col("nb")))
      .select(col("id_a"), col("id_b"), col("la").as("label"), col("cos"))
      .orderBy(col("cos").desc, col("id_a"), col("id_b"))
      .limit(50)
      .select(col("id_a"), col("id_b"), col("label"), round(col("cos"), 6).as("cosine"))
  }

  val defs: Seq[(String, QueryDef)] = Seq(
    "s01_ann_bruteforce" -> QueryDef(annBruteForce, Some(s"""$vecsDuckCte,
      p AS (
        SELECT q.vec_id AS q_id, c.vec_id AS c_id, $cosDuck AS cos
        FROM n q, n c WHERE q.vec_id % 50 = 0 AND q.vec_id <> c.vec_id),
      r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS rnk FROM p)
      SELECT q_id, c_id, CAST(rnk AS BIGINT) AS rnk, ROUND(cos, 6) AS cosine
      FROM r WHERE rnk <= 5 ORDER BY q_id, rnk"""),
      "brute-force cosine top-k ANN baseline"),

    "s02_ann_cluster" -> QueryDef(annClusterPruned, Some(s"""$vecsDuckCte,
      p AS (
        SELECT q.vec_id AS q_id, c.vec_id AS c_id, q.label AS label, $cosDuck AS cos
        FROM n q, n c
        WHERE q.vec_id % 50 = 0 AND q.label = c.label AND q.vec_id <> c.vec_id),
      r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS rnk FROM p)
      SELECT q_id, c_id, label, CAST(rnk AS BIGINT) AS rnk, ROUND(cos, 6) AS cosine
      FROM r WHERE rnk <= 5 ORDER BY q_id, rnk"""),
      "IVF-style cluster-pruned cosine top-k"),

    "s03_embedding_neardup" -> QueryDef(embeddingNearDup, Some(s"""$vecsDuckCte,
      p AS (
        SELECT q.vec_id AS id_a, c.vec_id AS id_b, q.label AS label, $cosDuck AS cos
        FROM n q, n c WHERE q.label = c.label AND q.vec_id < c.vec_id)
      SELECT id_a, id_b, label, ROUND(cos, 6) AS cosine
      FROM p ORDER BY cos DESC, id_a, id_b LIMIT 50"""),
      "embedding-cosine near-dup pairs (cluster-pruned)"))
}
