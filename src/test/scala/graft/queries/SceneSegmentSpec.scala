package graft.queries

import org.apache.spark.sql.Row

/** Contract tests for m11's run-length scene segmentation.
  *
  * The synthetic corpus contains zero adjacent-identical sampled frames
  * (verified at sf0.01: max longest_scene = 1 across all media), so the
  * oracle exercises only the every-frame-is-a-cut case — these tests pin
  * the multi-frame-scene semantics against hand-computed sequences (the
  * t19 rule: when the data can't exercise a branch, a constructed
  * fixture must). */
class SceneSegmentSpec extends graft.streaming.SparkTestBase {

  private def seg(frames: (Long, Int, String)*): Map[Long, (Long, Long, Long, Long)] = {
    val s = spark
    import s.implicits._
    MultimodalQueries.segmentStats(
      frames.toDF("media_id", "frame_idx", "frame_md5"))
      .collect()
      .map { case Row(m: Long, nf: Long, nd: Long, ns: Long, ls: Long) =>
        m -> ((nf, nd, ns, ls))
      }.toMap
  }

  test("static shots collapse to runs: AAABBA -> 3 scenes, longest 3, 2 distinct") {
    val r = seg((1L, 0, "A"), (1L, 4, "A"), (1L, 8, "A"),
      (1L, 12, "B"), (1L, 16, "B"), (1L, 20, "A"))
    assert(r(1L) == ((6L, 2L, 3L, 3L)))
  }

  test("all-distinct sequence degenerates to one scene per frame (the corpus case)") {
    val r = seg((2L, 0, "A"), (2L, 4, "B"), (2L, 8, "C"))
    assert(r(2L) == ((3L, 3L, 3L, 1L)))
  }

  test("single-frame media: one scene of length one") {
    assert(seg((3L, 0, "Z"))(3L) == ((1L, 1L, 1L, 1L)))
  }

  test("fully static media: one scene spanning every frame") {
    val r = seg((4L, 0, "A"), (4L, 4, "A"), (4L, 8, "A"), (4L, 12, "A"))
    assert(r(4L) == ((4L, 1L, 1L, 4L)))
  }

  test("runs are per-media: identical fingerprints across media never merge") {
    val r = seg((5L, 0, "A"), (5L, 4, "A"), (6L, 0, "A"), (6L, 4, "B"))
    assert(r(5L) == ((2L, 1L, 1L, 2L)))
    assert(r(6L) == ((2L, 2L, 2L, 1L)))
  }

  test("segmentation orders by frame_idx, not input order: interleaved input, same runs") {
    val r = seg((7L, 8, "A"), (7L, 0, "A"), (7L, 4, "B"))
    // ordered: A(0) B(4) A(8) -> 3 scenes of length 1
    assert(r(7L) == ((3L, 2L, 3L, 1L)))
  }
}
