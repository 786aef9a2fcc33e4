package graft.queries

import org.apache.spark.sql.functions._

/** t33 contract: the integer-exact regression reproduces an
  * independently computed double-precision least-squares fit, and the
  * reported statistics are internally consistent. The independent
  * replica below computes x/y through the SAME integerization rule
  * (floor(ln·2^20 + 0.5)) but with plain Scala math and double sums —
  * a different code path whose result must agree to float tolerance,
  * pinning the normal-equation algebra rather than echoing the SQL. */
class ZipfFitSpec extends graft.streaming.SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("t33: slope/intercept/r2 match an independent least-squares replica") {
    val row = graft.SparkEntry.queries("t33_zipf_fit")(spark, sf).collect().head
    // independent term counting + fit
    val freqs = graft.Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("freq"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (t, f) => (-f, t) }
      .take(TextQueries.ZipfTopV)
    def l(n: Long): Long = math.floor(math.log(n.toDouble) * 1048576.0 + 0.5).toLong
    val xy = freqs.zipWithIndex.map { case ((_, f), i) => (l(i + 1L), l(f)) }
    val n = xy.length.toDouble
    val (sx, sy) = (xy.map(_._1).sum.toDouble, xy.map(_._2).sum.toDouble)
    val sxx = xy.map(p => p._1.toDouble * p._1).sum
    val sxy = xy.map(p => p._1.toDouble * p._2).sum
    val syy = xy.map(p => p._2.toDouble * p._2).sum
    val num = n * sxy - sx * sy
    val den = n * sxx - sx * sx
    val slope = num / den
    assert(row.getAs[Long]("n_terms") == xy.length)
    assert(row.getAs[Long]("sum_x_u") == xy.map(_._1).sum)
    assert(row.getAs[Long]("sum_y_u") == xy.map(_._2).sum)
    assert(math.abs(row.getAs[Double]("slope") - slope) < 1e-9,
      s"slope ${row.getAs[Double]("slope")} != replica $slope")
    val intercept = (sy - slope * sx) / n / 1048576.0
    assert(math.abs(row.getAs[Double]("intercept_ln") - intercept) < 1e-9)
    val r2 = num * num / (den * (n * syy - sy * sy))
    assert(math.abs(row.getAs[Double]("r2") - r2) < 1e-9)
  }

  test("t33: the fit is sane — negative slope, r2 in [0,1], bounded width") {
    val row = graft.SparkEntry.queries("t33_zipf_fit")(spark, sf).collect().head
    assert(row.getAs[Long]("n_terms") >= 2)
    assert(row.getAs[Long]("n_terms") <= TextQueries.ZipfTopV)
    assert(row.getAs[Double]("slope") < 0.0,
      "frequency did not decrease with rank — the counting is broken")
    val r2 = row.getAs[Double]("r2")
    assert(r2 >= 0.0 && r2 <= 1.0)
  }

  test("t33: degenerate vocabulary (single term) yields NULL slope/r2, not NaN") {
    // r15 ADVICE: with one distinct term den = n*sxx - sx*sx = 0 and
    // the regression is undefined. The guarded division must yield SQL
    // NULL (matching the twin's NULLIF) rather than engine-dependent
    // NaN — hash parity on degenerate corpora depends on it.
    val dir = java.nio.file.Files.createTempDirectory("t33degen").toString
    try {
      val one = spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(
          org.apache.spark.sql.Row(1L, "foo foo foo foo", "en", "web", 15L)), 1),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("doc_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("text",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("lang",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("source",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("n_chars",
            org.apache.spark.sql.types.LongType))))
      one.write.parquet(s"$dir/documents.parquet")
      val row = graft.SparkEntry.queries("t33_zipf_fit")(spark, dir).collect().head
      assert(row.getAs[Long]("n_terms") == 1L)
      assert(row.isNullAt(row.fieldIndex("slope")),
        s"degenerate slope should be NULL, got ${row.get(row.fieldIndex("slope"))}")
      assert(row.isNullAt(row.fieldIndex("intercept_ln")))
      assert(row.isNullAt(row.fieldIndex("r2")))
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("ilogBig: shift decomposition matches a replica at every magnitude band") {
    // the t33 y-input is unbounded in corpus size; this pins the CASE
    // ladder (k = smallest k with n <= 5e6*2^k, ELSE 41) and the
    // L(n>>k) + k*L(2) arithmetic against an independent Scala replica
    // across band edges, including counts past the ilogSql refusal
    val vals = Seq(1L, 2L, 4999999L, 5000000L, 5000001L, 9999999L,
      10000000L, 10000001L, 20000001L, (37L << 40) + 12345L,
      5000000L << 40, (5000000L << 40) + 1L, Long.MaxValue)
    def replicaK(n: Long): Int =
      (0 to 40).find(k => n <= (5000000L << k)).getOrElse(41)
    def replica(n: Long): Long = {
      val k = replicaK(n)
      math.floor(math.log((n >> k).toDouble) * 1048576.0 + 0.5).toLong +
        k.toLong * TextQueries.Ln2U
    }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(vals.map(org.apache.spark.sql.Row(_)), 2),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("n",
          org.apache.spark.sql.types.LongType))))
    val got = df.selectExpr("n", TextQueries.ilogBigSql("n") + " AS y")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    vals.foreach { n =>
      assert(got(n) == replica(n), s"ilogBig($n): ${got(n)} != ${replica(n)}")
    }
    // in-range counts reduce to plain ilog (k = 0)
    val plain = df.filter("n <= 5000000")
      .selectExpr("n", TextQueries.ilogSql("n") + " AS y")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    plain.foreach { case (n, y) => assert(got(n) == y, s"k=0 branch drifts at $n") }
  }
}
