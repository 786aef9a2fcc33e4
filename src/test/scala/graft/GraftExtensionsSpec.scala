package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

/** The cluster-operator path for the native functions. spark-submit's
  * `--conf spark.sql.extensions=graft.GraftExtensions` does two things:
  * reflectively instantiates the class by name (zero-arg constructor)
  * and applies it to the session's extensions at construction. The
  * static conf is read from the SparkContext, which in this suite
  * already exists, so the two halves are asserted directly: reflective
  * load-and-apply, and a freshly built session via the equivalent
  * public `Builder.withExtensions` hook. */
class GraftExtensionsSpec extends graft.streaming.SparkTestBase {

  test("extensions class loads by name and registers via a fresh session") {
    val base = spark // force the shared context into existence
    // Half 1: the reflective path spark-submit uses.
    val byName = Class.forName("graft.GraftExtensions")
      .getDeclaredConstructor().newInstance()
      .asInstanceOf[SparkSessionExtensions => Unit]
    byName.apply(new SparkSessionExtensions) // must inject without error

    // Half 2: a session constructed WITH the extensions exposes the
    // functions with no imperative register call.
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[4]")
        .withExtensions(byName)
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
      assert(s2 ne base, "test needs a freshly constructed session")
      val r = s2.sql(
        """SELECT graft_strhash('abc') AS h,
                  graft_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
                            array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d,
                  graft_hyperbands(array(CAST(1.0 AS FLOAT)), 2, 2) AS bands,
                  graft_sorted_icount(array(1L, 3L, 5L), array(3L, 4L, 5L)) AS ic,
                  graft_gramhash('a b c d') AS gh""")
        .collect().head
      // (97·131 + 98)·131 + 99 mod 1e9+7
      assert(r.getLong(0) == 1677554L)
      assert(r.getDouble(1) == 11.0)
      val bands = r.getSeq[Long](2)
      assert(bands.length == 2 && bands.forall(b => b >= 0 && b < 4))
      assert(r.getLong(3) == 2L)
      // two trigrams: h("a b c") and h("b c d")
      val gh = r.getSeq[Long](4)
      def m(s: String) = s.foldLeft(0L)((a, c) => (a * 131 + c.toLong) % 1000000007L)
      assert(gh == Seq(m("a b c"), m("b c d")))
      // The re-exposed bloom pair resolves through the same injection:
      // members always hit, and a disjoint probe range mostly misses.
      s2.range(100).selectExpr("xxhash64(CAST(id AS STRING)) AS h")
        .createOrReplaceTempView("ext_bloom_in")
      val bl = s2.sql(
        """WITH bf AS (SELECT graft_bloom_agg(h, 1000L, 8192L) AS b FROM ext_bloom_in)
           SELECT SUM(CASE WHEN graft_bloom_contains((SELECT b FROM bf),
                             xxhash64(CAST(id AS STRING))) THEN 1L ELSE 0L END) AS hits,
                  SUM(CASE WHEN id >= 100 AND graft_bloom_contains((SELECT b FROM bf),
                             xxhash64(CAST(id AS STRING))) THEN 1L ELSE 0L END) AS fp
           FROM range(1100)""").collect().head
      assert(bl.getLong(0) >= 100L, "bloom missed a member via the extensions path")
      assert(bl.getLong(1) * 5 <= 1000L, s"bloom FP rate broken: ${bl.getLong(1)}/1000")
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
