package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B micro-benchmark for the gram-hash pipeline: the fused
  * [[graft.functions.GramHash]] vs the composed
  * split→transform→concat_ws→strhash formulation, both reduced with the
  * same checksum so nothing else differs. Run:
  * `SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.GramBench /root/testdata/sf0.1 5"`. */
object GramBench {
  /** The exact round-4 formulation: distinct gram STRINGS exploded,
    * then one strhash per string. */
  private val composedGrams = """array_distinct(CASE WHEN size(words) >= 3
    THEN transform(sequence(1, size(words) - 2),
         i -> concat_ws(' ', element_at(words, i), element_at(words, i+1), element_at(words, i+2)))
    ELSE array(text) END)"""

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val n = if (args.length > 1) args(1).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    val docs = graft.Tables.documents(spark, sfDir)

    def time(label: String, mk: () => org.apache.spark.sql.DataFrame): Unit =
      (1 to n).foreach { i =>
        val t0 = System.nanoTime()
        val r = mk().agg(sum(col("c")), expr("bit_xor(h)")).collect()(0)
        println(f"[gram] $label run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s " +
          s"(sum ${r.getLong(0)} xor ${r.getLong(1)})")
      }

    time("fused   ", () => docs
      .select(explode(expr("array_distinct(graft_gramhash(text))")).as("h"))
      .select(col("h"), lit(1L).as("c")))
    time("composed", () => docs
      .withColumn("words", split(col("text"), " "))
      .select(explode(expr(composedGrams)).as("x"))
      .select(expr("graft_strhash(x)").as("h"), lit(1L).as("c")))
    spark.stop()
  }
}
