package graft.tools

/** Verifies the t18 cross-engine exactness premise: the JVM's
  * `Math.log` and DuckDB's `ln` integerize identically as
  * `floor(ln(n)·2^20 + 0.5)` over every integer count the test SFs can
  * produce. Dumps the JVM side as big-endian longs; compare with
  *
  * {{{
  * python3 - <<'EOF'
  * import duckdb, numpy as np
  * d = duckdb.sql("SELECT CAST(floor(ln(CAST(n AS DOUBLE)) * 1048576.0 + 0.5) AS BIGINT) "
  *                "FROM generate_series(1, 5000000) t(n) ORDER BY n").fetchnumpy()
  * duck = list(d.values())[0].astype(np.int64)
  * java = np.fromfile('/tmp/ln_java.bin', dtype='>i8')
  * print("mismatches:", int((duck != java).sum()))
  * EOF
  * }}}
  *
  * Measured (r10, this container): 0 mismatches over n ∈ [1, 5·10^6].
  * Both libms are sub-ulp, so a flip at larger n needs ln(n)·2^20
  * within ~4e-9 of a half-integer — ~1e-8 per distinct count value.
  *
  * Usage: runMain graft.tools.LnProbe [maxN] [outPath]
  */
object LnProbe {
  def main(args: Array[String]): Unit = {
    val maxN = args.headOption.map(_.toLong).getOrElse(5000000L)
    val out = args.drop(1).headOption.getOrElse("/tmp/ln_java.bin")
    val o = new java.io.DataOutputStream(
      new java.io.BufferedOutputStream(new java.io.FileOutputStream(out)))
    try {
      var n = 1L
      while (n <= maxN) {
        o.writeLong(math.floor(math.log(n.toDouble) * 1048576.0 + 0.5).toLong)
        n += 1
      }
    } finally o.close()
    println(s"wrote ${maxN} integerized logs to $out")
  }
}
