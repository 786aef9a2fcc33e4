package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.SimilarityQueries

/** The index LIFECYCLE driven from streaming (r17 verdict ask #3):
  * s26/s27 execute compaction and refit from a batch epoch decision;
  * this spec proves the serve path actually SWITCHES under live
  * arrivals — the a39/d22/m14 batch≡streaming discipline applied to
  * the lifecycle VERBS, not just the arrival probes.
  *
  * Test 1 streams the delete arrivals through real file-source
  * micro-batches and re-evaluates the s25 decision per epoch over the
  * accumulated tombstone state: the compaction trigger flips exactly
  * when the garbage fraction crosses [[SimilarityQueries.GarbageTau]],
  * the serve path switches from the query-time anti-join to a physical
  * per-epoch compacted materialization, served results stay bit-equal
  * across the switch, and the final epoch reproduces the one-shot
  * s25 decision and s26 serving exactly.
  *
  * Test 2 drives the REFIT flip with a constructed world (the
  * TombstoneSpec fixture style — the driver corpus's imbalance trigger
  * is already tripped at epoch 0, so a real flip needs a fixture that
  * starts healthy): a balanced 4-cell index absorbs skewed ingest
  * arrivals into one cell until the FAISS imbalance factor crosses
  * [[SimilarityQueries.ImbalanceTau]]; the decision flips at the
  * predicted epoch, the refit executes over exactly the accumulated
  * live population as physical state, and serving switches to the
  * refit centroids. */
class StreamingLifecycleSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("streamed deletes flip the compaction decision; the serve path " +
      "switches to the compacted state; final epoch ≡ batch s25/s26") {
    val s = spark
    import s.implicits._
    val e = SimilarityQueries.vecs(s, sf)
    val cent = SimilarityQueries.ivfCentroids(s, sf)
    val asg = SimilarityQueries.ivfAssigned(s, sf)
    val (bcent, basg, iasg, _) = SimilarityQueries.ingestAssignments(s, sf)
    val probes = SimilarityQueries.probeTopCells(e, cent, SimilarityQueries.IngestProbes)
    def serveRows(a: DataFrame): Seq[(Long, Long)] =
      SimilarityQueries.serveOverAssignment(probes, e, a)
        .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("c_id")))
        .sorted.toSeq

    val stagedRoot = java.nio.file.Files.createTempDirectory("graft-lifecycle-stream")
    try {
      val staged = stagedRoot.resolve("deletes").toString
      SimilarityQueries.tombstones(e)
        .repartition(3).write.mode("overwrite").parquet(staged)
      val schema = s.read.parquet(staged).schema

      // (epoch, compactFired, servedRows) per micro-batch, driven by a
      // real file stream — one delete file per trigger
      val epochs = new java.util.concurrent.ConcurrentLinkedQueue[
        (Int, Boolean, Seq[(Long, Long)])]()
      val arrived = scala.collection.mutable.Set.empty[Long]
      val epochN = new java.util.concurrent.atomic.AtomicInteger(0)
      val q = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(staged)
        .writeStream.foreachBatch {
          (batch: org.apache.spark.sql.DataFrame, _: Long) =>
            val n = epochN.incrementAndGet()
            arrived.synchronized {
              arrived ++= batch.collect().map(_.getAs[Long]("vec_id"))
            }
            val tombState = arrived.toSeq.sorted.toDF("vec_id")
            val dec = SimilarityQueries
              .decisionFor(e, asg, bcent, basg, iasg, tombState).head
            val compact = dec.getAs[Boolean]("compact_for_garbage")
            // the serve path the lifecycle picks at this epoch: the
            // query-time anti-join until compaction fires, a physical
            // per-epoch compacted materialization after
            val antiJoin = SimilarityQueries.liveAssignment(asg, tombState)
            val servingAsg =
              if (compact) {
                val c = SimilarityQueries.compactAssignmentFor(
                  s, sf, s"s26_stream_epoch_$n", asg, tombState)
                assert(c.inputFiles.exists(_.contains(s"graft_memo/s26_stream_epoch_$n")),
                  s"epoch $n: compacted state is not served from its materialization")
                // the switch must be invisible to queries: bit-equal
                // served results across the anti-join → compacted flip
                assert(serveRows(c) == serveRows(antiJoin),
                  s"epoch $n: compacted serving diverges from the anti-join path")
                c
              } else antiJoin
            epochs.add((n, compact, serveRows(servingAsg)))
            ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()

      val byEpoch = epochs.toArray(Array.empty[(Int, Boolean, Seq[(Long, Long)])])
        .sortBy(_._1).toSeq
      assert(byEpoch.size >= 3, s"expected >=3 delete micro-batches, got ${byEpoch.size}")
      // the flip is genuine: the trigger is OFF while the accumulated
      // garbage fraction is below tau and ON once it crosses — a spec
      // that only ever saw one phase would prove nothing
      assert(!byEpoch.head._2,
        "compaction already triggered at epoch 1 — the flip is unexercised")
      assert(byEpoch.last._2,
        "compaction never triggered — the fixture's garbage fraction is miscalibrated")
      val flips = byEpoch.map(_._2).sliding(2).count(w => w(0) != w(1))
      assert(flips == 1, s"decision flipped $flips times; tombstone accumulation " +
        "is monotone so the trigger must flip exactly once")

      // batch≡streaming for the lifecycle verbs: the final epoch's
      // decision row and served results are the one-shot s25/s26 paths
      val s25 = graft.SparkEntry.queries("s25_refit_decision")(s, sf).head
      assert(s25.getAs[Boolean]("compact_for_garbage") == byEpoch.last._2)
      assert(s25.getAs[Long]("n_deleted") == arrived.size.toLong)
      val s26 = graft.SparkEntry.queries("s26_compacted_serving")(s, sf)
        .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("c_id")))
        .sorted.toSeq
      assert(byEpoch.last._3 == s26,
        "final-epoch streamed serving diverges from the one-shot s26 rows")
    } finally deleteTree(stagedRoot)
  }

  test("skewed ingest arrivals flip the refit decision at the predicted " +
      "epoch; the refit executes over exactly the accumulated live population") {
    val s = spark
    import s.implicits._
    // constructed world: 4 unit directions, 10 base vectors each —
    // imbalance exactly 1.0, drift exactly 0 (every vector sits ON its
    // centroid), no tombstones: neither s25 trigger fires at rest
    val dirs = Seq(Seq(1f, 0f), Seq(0f, 1f), Seq(-1f, 0f), Seq(0f, -1f))
    val base = (0L until 40L).map(i =>
      (i, s"b$i", dirs((i % 4).toInt)))
    val eBase = SimilarityQueries.vecsOf(s,
      base.toDF("vec_id", "label", "embedding"))
    val bcent = dirs.zipWithIndex.map { case (d, i) => (i.toLong, d) }
      .toDF("s_id", "sv").withColumn("sn", lit(1.0))
    val basg = SimilarityQueries.assignCells(eBase, bcent)
    val noTomb = Seq.empty[Long].toDF("vec_id")

    // arrivals: 12 vectors fanned over 2.5°-30° off the (1,0) axis —
    // every one is nearest cell 0 under the old fit (all angles < 45°),
    // so imbalance after k arrivals is (10+k)·4/(40+k): 1.27 at k=4,
    // 1.50 at k=8 (not > tau), 1.69 at k=12 — the flip must land
    // exactly at epoch 3. The fan (rather than 12 identical copies)
    // gives the refit something Lloyd can actually re-split: identical
    // points can never leave one cell, whatever the decision says.
    val arrivals = (100L until 112L).map { i =>
      val theta = math.toRadians((i - 99) * 2.5)
      (i, s"i$i", Seq(math.cos(theta).toFloat, math.sin(theta).toFloat))
    }
    val decisions = (1 to 3).map { epoch =>
      val arrived = arrivals.take(epoch * 4)
      val eEpoch = SimilarityQueries.vecsOf(s,
        (base ++ arrived).toDF("vec_id", "label", "embedding"))
      val iasg = SimilarityQueries.assignCells(
        SimilarityQueries.vecsOf(s, arrived.toDF("vec_id", "label", "embedding")),
        bcent)
      val masg = basg.union(iasg)
      val dec = SimilarityQueries
        .decisionFor(eEpoch, masg, bcent, basg, iasg, noTomb).head
      (epoch, dec.getAs[Boolean]("refit_needed"),
        dec.getAs[Double]("imbalance"), dec.getAs[Double]("drift"), eEpoch, masg)
    }
    decisions.foreach { case (ep, _, imb, drift, _, _) =>
      // off-axis arrivals drag the mean assigned cosine down a little;
      // the fan is calibrated to stay well under the drift trigger so
      // the flip below is attributable to the imbalance rule alone
      assert(drift >= 0.0 && drift < SimilarityQueries.DriftTau,
        s"epoch $ep: drift $drift would contaminate the imbalance flip")
      assert(math.abs(imb - (10.0 + ep * 4) * 4 / (40 + ep * 4)) < 1e-12,
        s"epoch $ep: imbalance $imb off the closed form")
    }
    assert(decisions.map(_._2) == Seq(false, false, true),
      s"refit flip sequence ${decisions.map(_._2)} != (false, false, true)")

    // the refit VERB executes from the streamed state: fitted over
    // exactly the accumulated live population, landed as physical
    // diskMemo state, and the serve-side assignment switches to it
    val (_, _, _, _, eFinal, masgFinal) = decisions.last
    val (newCent, newAsg) = SimilarityQueries.refitStateFor(
      s, sf, "lifecycle_spec_cent", "lifecycle_spec_asg", eFinal)
    assert(newCent.inputFiles.exists(_.contains("graft_memo/lifecycle_spec_cent")) &&
      newAsg.inputFiles.exists(_.contains("graft_memo/lifecycle_spec_asg")),
      "refit state is not served from its materialization")
    val ids = eFinal.select("vec_id").collect().map(_.getLong(0)).toSet
    val asgIds = newAsg.select("vec_id").collect().map(_.getLong(0))
    assert(asgIds.toSet == ids && asgIds.length == ids.size,
      "refit assignment does not cover the accumulated population exactly once")
    // the trigger the flip asserted is real on the final state…
    def imbalanceOf(a: DataFrame): Double =
      a.groupBy(col("cell")).agg(count(lit(1)).as("c"))
        .agg((max(col("c")) * count(lit(1))).cast("double")
          .divide(sum(col("c"))).as("i")).head.getDouble(0)
    assert(imbalanceOf(masgFinal) > SimilarityQueries.ImbalanceTau,
      "pre-refit imbalance does not trip the trigger the flip asserted")
    // …and the switch lands on a genuinely NEW fit: the refit
    // centroids differ from the serving fit (an identical fit would
    // make the serve-path switch vacuous). No imbalance-improvement
    // claim here — Lloyd does not guarantee the FAISS factor drops,
    // least of all on a 52-vector world whose stride seeding was never
    // tuned (the r17-ADVICE discipline; RefitExecutionSpec carries the
    // real-corpus improvement as an explicit fixture pin).
    def centSet(c: DataFrame): Set[(Long, Seq[Float])] =
      c.collect().map(r => (r.getAs[Long]("s_id"),
        r.getAs[scala.collection.Seq[Float]]("sv").toSeq)).toSet
    assert(centSet(newCent) != centSet(bcent),
      "refit centroids identical to the serving fit — the switch proves nothing")
  }
}
