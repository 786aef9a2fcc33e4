package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** graft_hyperbands must reproduce the reference formulation exactly:
  * sign of sequential-double dot against LCG hyperplanes. */
class HyperplaneBandsSpec extends graft.streaming.SparkTestBase {

  /** Plain-Scala reference: the formulation the DuckDB twin also uses. */
  private def reference(v: Array[Float], bands: Int, bits: Int): Seq[Long] =
    (0 until bands).map { b =>
      (0 until bits).foldLeft(0L) { (bv, r) =>
        val k = b * bits + r
        var s = 0.0
        for (i <- v.indices) {
          val h = ((1103515245L * (k.toLong * v.length + i) + 12345L) % (1L << 31)) % 2001L - 1000L
          s += v(i).toDouble * h.toDouble
        }
        if (s > 0) bv | (1L << r) else bv
      }
    }

  test("band values match the LCG+sequential-dot reference on random vectors") {
    val s = spark
    GraftFunctions.register(s)
    val rnd = new scala.util.Random(7)
    val vecs = Seq.fill(20)(Array.fill(64)(rnd.nextFloat() * 2f - 1f))
    val df = s.createDataFrame(
      java.util.Arrays.asList(vecs.map(v => Row(v.toSeq)): _*),
      StructType(Seq(StructField("v", ArrayType(FloatType, containsNull = false)))))
    val got = df.select(expr("graft_hyperbands(v, 8, 8)")).collect()
      .map(_.getSeq[Long](0))
    vecs.zip(got).foreach { case (v, g) =>
      assert(g == reference(v, 8, 8), s"mismatch for ${v.take(4).mkString(",")}…")
    }
    // every band value stays within its bit width
    got.flatten.foreach(bv => assert(bv >= 0L && bv < 256L))
  }

  test("hyperplane indices derive from the actual vector length") {
    // The DuckDB twins derive the LCG index from len(v) too, so any
    // dimensionality — not just the corpus's 64 — must agree with the
    // reference model (guards the k·dim+i indexing against a silently
    // hardcoded dim on either side).
    val s = spark
    GraftFunctions.register(s)
    val rnd = new scala.util.Random(11)
    for (dim <- Seq(1, 3, 16, 100)) {
      val vecs = Seq.fill(5)(Array.fill(dim)(rnd.nextFloat() * 2f - 1f))
      val df = s.createDataFrame(
        java.util.Arrays.asList(vecs.map(v => Row(v.toSeq)): _*),
        StructType(Seq(StructField("v", ArrayType(FloatType, containsNull = false)))))
      val got = df.select(expr("graft_hyperbands(v, 4, 6)")).collect()
        .map(_.getSeq[Long](0))
      vecs.zip(got).foreach { case (v, g) =>
        assert(g == reference(v, 4, 6), s"dim=$dim mismatch")
      }
    }
  }

  test("null element nulls the signature; type errors are rejected") {
    val s = spark
    GraftFunctions.register(s)
    val df = s.createDataFrame(
      java.util.Arrays.asList(Row(Seq[java.lang.Float](1.0f, null, 2.0f))),
      StructType(Seq(StructField("v", ArrayType(FloatType, containsNull = true)))))
    assert(df.select(expr("graft_hyperbands(v, 4, 4)")).collect().head.isNullAt(0))
    intercept[Exception] {
      s.sql("SELECT graft_hyperbands(array('a'), 4, 4)").collect()
    }
  }
}
