package graft.multimodal

import org.apache.spark.sql.functions._

/** r13 ADVICE fix pin: m10 (octet_length over documents.text) and m13
  * (length over the MediaRecord's UTF-8 `bytes`) must use the SAME
  * payload-length definition, or the per-cluster keeper choice silently
  * diverges on any non-single-byte corpus. Both are UTF-8 byte counts;
  * this spec proves the agreement on strings where code-point count,
  * UTF-16 unit count, and byte count all differ. */
class MediaPayloadLengthSpec extends graft.streaming.SparkTestBase {

  test("octet_length(text) == length(encode(text,'UTF-8')) on multi-byte text") {
    import spark.implicits._
    val fixtures = Seq(
      "ascii only",
      "café",                 // 2-byte UTF-8 char
      "日本語",        // 3-byte chars
      "emoji 😀 pair",   // surrogate pair, 4-byte UTF-8
      "")
    val df = fixtures.toDF("text")
      .select(col("text"),
        expr("octet_length(text)").cast("long").as("m10_len"),
        length(encode(col("text"), "UTF-8")).cast("long").as("m13_len"),
        length(col("text")).cast("long").as("char_len"))
    val rows = df.collect()
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2),
        s"definitions disagree on '${r.getString(0)}': ${r.getLong(1)} != ${r.getLong(2)}")
    }
    // the fixture is non-trivial: at least one string where byte count
    // and code-point count actually differ
    assert(rows.exists(r => r.getLong(1) != r.getLong(3)),
      "fixture has no multi-byte string; the pin proves nothing")
  }
}
