package graft.queries

import org.apache.spark.sql.Row

/** Contract tests for d20's gaps-and-islands interval merge.
  *
  * The synthetic corpus's duplicated passages are whole-document
  * copies, so every real doc merges to exactly ONE span — these tests
  * pin the multi-span, gap, overlap, and adjacency semantics on
  * constructed intervals (the m11/t19 rule: when the data can't
  * exercise a branch, a fixture must). */
class SpanMergeSpec extends graft.streaming.SparkTestBase {

  private def merged(ivs: (Long, Long, Long)*): Seq[(Long, Long, Long, Long, Long)] = {
    val s = spark
    import s.implicits._
    DedupQueries.mergeSpans(ivs.toDF("doc_id", "i", "j"))
      .collect()
      .map { case Row(d: Long, sp: Long, a: Long, b: Long, n: Long) => (d, sp, a, b, n) }
      .toSeq
  }

  test("overlapping windows chain into one span (the stride-1 copied-paragraph case)") {
    // [1,16] [2,17] [3,18] -> one span [1,18]
    assert(merged((1L, 1L, 16L), (1L, 2L, 17L), (1L, 3L, 18L)) ==
      Seq((1L, 1L, 1L, 18L, 18L)))
  }

  test("adjacent (end+1 = start) intervals merge; a 2-word gap splits") {
    // [1,16] then [17,32]: adjacent -> merge. [35,50]: gap -> new span.
    assert(merged((2L, 1L, 16L), (2L, 17L, 32L), (2L, 35L, 50L)) ==
      Seq((2L, 1L, 1L, 32L, 32L), (2L, 2L, 35L, 50L, 16L)))
  }

  test("a contained interval never reopens a span") {
    // [1,30] swallows [5,20]; [25,40] overlaps the running end -> still one span
    assert(merged((3L, 1L, 30L), (3L, 5L, 20L), (3L, 25L, 40L)) ==
      Seq((3L, 1L, 1L, 40L, 40L)))
  }

  test("spans are per-document: same offsets in two docs stay separate") {
    val r = merged((4L, 1L, 16L), (5L, 1L, 16L)).sortBy(_._1)
    assert(r == Seq((4L, 1L, 1L, 16L, 16L), (5L, 1L, 1L, 16L, 16L)))
  }

  test("three islands count up in order") {
    val r = merged((6L, 1L, 16L), (6L, 40L, 55L), (6L, 100L, 115L))
    assert(r.map(x => (x._2, x._3, x._4)) ==
      Seq((1L, 1L, 16L), (2L, 40L, 55L), (3L, 100L, 115L)))
  }
}
