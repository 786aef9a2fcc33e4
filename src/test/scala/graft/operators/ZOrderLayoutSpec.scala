package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ZOrder contract: (1) the Column-side Morton key is bit-identical to
  * an independent Scala bit-twiddling replica; (2) on a partitioned
  * write of the a41 layout, per-bucket min/max stats make 2-D box
  * predicates SOUND to prune on (pruned read ≡ full read) and actually
  * skip most files; (3) the property a single-dimension sort cannot
  * give: a slice on the NON-leading dimension still prunes under
  * Z-order, while the same stats under a custkey-linear layout keep
  * every bucket. */
class ZOrderLayoutSpec extends graft.streaming.SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  // independent replica: interleave bit i of a onto 2i, b onto 2i+1
  private def mortonReplica(a: Long, b: Long): Long =
    (0 until 16).foldLeft(0L) { (z, i) =>
      z | ((a >> i) & 1L) << (2 * i) | ((b >> i) & 1L) << (2 * i + 1)
    }

  test("interleave16 is bit-identical to a per-bit replica across the domain") {
    val vals = Seq(0L, 1L, 2L, 3L, 255L, 256L, 4095L, 21845L, 43690L, 65535L)
    val rows = for (a <- vals; b <- vals) yield (a, b)
    val df = spark.createDataFrame(rows).toDF("a", "b")
      .withColumn("z", ZOrder.interleave16(col("a"), col("b")))
    df.collect().foreach { r =>
      val (a, b, z) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(z == mortonReplica(a, b), s"interleave16($a,$b)=$z != replica")
    }
  }

  /** The a41 frame: one row per order with (ck, day, u, v, z). */
  private def keyed(): DataFrame = {
    val o = graft.Tables.orders(spark, sf)
      .select(col("o_custkey").as("ck"),
        datediff(col("o_orderdate").cast("date"),
          lit("1970-01-01").cast("date")).cast("long").as("day"))
    val b = o.agg(min(col("ck")).as("cklo"), max(col("ck")).as("ckhi"),
      min(col("day")).as("dlo"), max(col("day")).as("dhi"))
    o.join(broadcast(b))
      .withColumn("u", expr(ZOrder.rangeBucketSpark("ck", "cklo", "ckhi")))
      .withColumn("v", expr(ZOrder.rangeBucketSpark("day", "dlo", "dhi")))
      .withColumn("z", ZOrder.interleave16(col("u"), col("v")))
      .select(col("ck"), col("day"), col("u"), col("v"), col("z"))
  }

  private def filesRead(df: DataFrame): Long = {
    df.collect()
    df.queryExecution.executedPlan.collectLeaves().collectFirst {
      case fs: org.apache.spark.sql.execution.FileSourceScanExec =>
        fs.metrics.get("numFiles").map(_.value).getOrElse(-1L)
    }.getOrElse(-1L)
  }

  /** (bucket → (uLo, uHi, vLo, vHi)): the per-file min/max stats a
    * lakehouse keeps; pruning keeps buckets whose bbox intersects. */
  private def stats(df: DataFrame, bucketCol: String): Map[Long, (Long, Long, Long, Long)] =
    df.groupBy(col(bucketCol)).agg(min(col("u")).as("ul"), max(col("u")).as("uh"),
      min(col("v")).as("vl"), max(col("v")).as("vh"))
      // partition columns read back from directory names infer as INT
      .collect().map(r => r.getAs[Number](0).longValue ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap

  test("z-layout: bbox stats prune 2-D boxes soundly, and day slices prune where a linear layout cannot") {
    val s = spark
    val zdir = java.nio.file.Files.createTempDirectory("graft-zlay").toString
    val ldir = java.nio.file.Files.createTempDirectory("graft-linlay").toString
    try {
      val k = keyed()
      // 64 partitions each: z-prefix grid (8×8 over u,v) vs u-linear
      k.withColumn("zb", shiftright(col("z"), 26))
        .write.mode("overwrite").partitionBy("zb").parquet(zdir)
      k.withColumn("ub", shiftright(col("u"), 10))
        .write.mode("overwrite").partitionBy("ub").parquet(ldir)
      val zread = s.read.parquet(zdir)
      val lread = s.read.parquet(ldir)
      val zstats = stats(zread, "zb")
      val lstats = stats(lread, "ub")

      // --- 2-D box: the densest z-bucket's own bbox ---
      val (_, (bu1, bu2, bv1, bv2)) = zstats.maxBy { case (zb, _) =>
        zread.filter(col("zb") === zb).count()
      }
      val box = col("u").between(bu1, bu2) && col("v").between(bv1, bv2)
      val zcands = zstats.filter { case (_, (ul, uh, vl, vh)) =>
        ul <= bu2 && uh >= bu1 && vl <= bv2 && vh >= bv1
      }.keys.toSeq
      val full = zread.filter(box)
      val pruned = zread.filter(col("zb").isin(zcands: _*) && box)
      assert(full.count() > 0, "empty box — the fixture measures nothing")
      // soundness: stats-pruned read returns exactly the full-scan rows
      assert(pruned.count() == full.count(),
        "bbox pruning dropped matching rows — the stats are not sound")
      val (fFull, fPruned) = (filesRead(full), filesRead(pruned))
      assert(fPruned < fFull / 2,
        s"2-D box should skip most files: pruned=$fPruned full=$fFull")

      // --- day-only slice: non-leading-dimension pruning ---
      val vs = zstats.values
      val (vloAll, vhiAll) = (vs.map(_._3).min, vs.map(_._4).max)
      val mid = (vloAll + vhiAll) / 2
      val span = (vhiAll - vloAll + 1) / 8
      val (svl, svh) = (mid, mid + span)
      def vCands(st: Map[Long, (Long, Long, Long, Long)]) =
        st.filter { case (_, (_, _, vl, vh)) => vl <= svh && vh >= svl }.keys.toSeq
      val (zv, lv) = (vCands(zstats), vCands(lstats))
      // Z-order: the day slice hits a minority of z-buckets…
      assert(zv.size * 2 < zstats.size,
        s"z-layout day slice kept ${zv.size}/${zstats.size} buckets — no pruning")
      // …while under the custkey-linear layout every bucket spans all
      // days, so the same stats cannot exclude anything
      assert(lv.size == lstats.size,
        s"linear layout unexpectedly pruned: ${lv.size}/${lstats.size}")
      // and the pruned z-read is still sound for the slice
      val sliceFull = zread.filter(col("v").between(svl, svh))
      val slicePruned = zread.filter(col("zb").isin(zv: _*) && col("v").between(svl, svh))
      assert(sliceFull.count() == slicePruned.count())
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(zdir)).deleteRecursively()
      new Directory(new java.io.File(ldir)).deleteRecursively()
    }
  }
}
