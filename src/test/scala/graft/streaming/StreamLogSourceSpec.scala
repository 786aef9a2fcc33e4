package graft.streaming

import scala.collection.mutable

/** E2E of the DataSource V2 micro-batch source: the C1/C3 count-quota
  * admission control must cap every micro-batch at batchSize, deliver
  * everything exactly once to the sink, and commit offsets (ack). */
class StreamLogSourceSpec extends SparkTestBase {

  test("offsets are stable under MAXLEN trims between micro-batches (no re-delivery, no skips)") {
    val s = spark
    val clock = new ManualClock(1700000000000L)
    val log = new StreamLog(clock)
    (1 to 6).foreach { i => log.add(Map("i" -> i)); clock.advance(1) }
    val key = StreamLogRegistry.register(log)

    val seen = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val q = s.readStream
      .format("graft.streaming.StreamLogSourceProvider")
      .option("log", key).option("batchSize", "4")
      .load()
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        seen.synchronized {
          seen ++= df.collect().map(r => (r.getString(0), r.getMap[String, String](1)("i")))
        }
        ()
      }
      .start()
    try {
      q.processAllAvailable()
      // trim away the head (messages 1-4 are gone), append new ones: a
      // position-based offset would now re-deliver or skip
      log.trim(2)
      (7 to 8).foreach { i => log.add(Map("i" -> i)); clock.advance(1) }
      q.processAllAvailable()
      val payloads = seen.synchronized(seen.toSeq.map(_._2))
      assert(payloads == (1 to 8).map(_.toString),
        s"trim shifted delivery: $payloads")
      assert(payloads.distinct.size == payloads.size, "no re-delivery after trim")
    } finally q.stop()
  }

  test("micro-batches respect the batch_size admission quota and deliver all messages") {
    val s = spark
    val clock = new ManualClock(1700000000000L)
    val log = new StreamLog(clock)
    (1 to 10).foreach { i => log.add(Map("i" -> i)); clock.advance(1) }
    val key = StreamLogRegistry.register(log)

    val batchSizes = mutable.ArrayBuffer.empty[Long]
    val seen = mutable.ArrayBuffer.empty[String]
    val q = s.readStream
      .format("graft.streaming.StreamLogSourceProvider")
      .option("log", key).option("batchSize", "3")
      .load()
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = df.collect()
        batchSizes.synchronized {
          batchSizes += rows.length.toLong
          seen ++= rows.map(_.getString(0))
        }
        ()
      }
      .start()
    try {
      q.processAllAvailable()
      assert(batchSizes.forall(_ <= 3), s"admission quota violated: $batchSizes")
      assert(batchSizes.sum == 10, s"lost or duplicated messages: $batchSizes")
      assert(batchSizes.count(_ == 3) >= 3, "expected three full batches of 3")
      assert(seen.distinct.size == 10, "exactly-once per epoch")
      assert(seen.toSeq == seen.toSeq.sorted(MsgId.ordering), "delivery in id order")
      // the final epoch's commit lands on the next trigger — require
      // progress, not the very last id yet
      assert(MsgId.lt(MsgId.Zero, StreamLogRegistry.committedId(key)),
        "epoch commit (ack boundary) must advance")
      val wave1Last = seen.toSeq.sorted(MsgId.ordering).last

      // late arrivals are picked up by subsequent triggers
      (11 to 12).foreach { i => log.add(Map("i" -> i)); clock.advance(1) }
      q.processAllAvailable()
      assert(batchSizes.sum == 12)
      assert(MsgId.lte(wave1Last, StreamLogRegistry.committedId(key)),
        "commit must cover the first wave after the next trigger")
    } finally q.stop()
  }
}
