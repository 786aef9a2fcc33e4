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
  *
  * Sampled mode (r14): `runMain graft.tools.LnProbe sample [count]
  * [outPath]` emits (n, L(n)) PAIRS for a deterministic SplitMix64
  * sample over (5·10⁶, 2⁴⁰] plus every 2^k ± 2 neighborhood (the
  * places a libm is most likely to disagree are near power-of-two
  * argument boundaries); compare with
  *
  * {{{
  * python3 - <<'EOF'
  * import duckdb, numpy as np
  * a = np.fromfile('/tmp/ln_sample.bin', dtype='>i8').reshape(-1, 2).astype(np.int64)
  * duckdb.register('t', __import__('pandas').DataFrame({'n': a[:,0], 'j': a[:,1]}))
  * d = duckdb.sql("SELECT COUNT(*) FROM t WHERE "
  *                "CAST(floor(ln(CAST(n AS DOUBLE)) * 1048576.0 + 0.5) AS BIGINT) <> j").fetchone()
  * print("mismatches:", d[0])
  * EOF
  * }}}
  *
  * Measured (r14, this container): 0 mismatches over 2·10⁷ samples.
  * This does NOT extend the enforced exhaustive bound (sampling proves
  * absence of systematic divergence, not of isolated half-integer
  * flips) — TextQueries.IlogVerifiedMax stays at the exhaustive 5·10⁶
  * and the ilogSql guard refuses anything above it.
  */
object LnProbe {
  private def lnU(n: Long): Long =
    math.floor(math.log(n.toDouble) * 1048576.0 + 0.5).toLong

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("sample")) { sample(args.drop(1)); return }
    val maxN = args.headOption.map(_.toLong).getOrElse(5000000L)
    val out = args.drop(1).headOption.getOrElse("/tmp/ln_java.bin")
    val o = new java.io.DataOutputStream(
      new java.io.BufferedOutputStream(new java.io.FileOutputStream(out)))
    try {
      var n = 1L
      while (n <= maxN) {
        o.writeLong(lnU(n))
        n += 1
      }
    } finally o.close()
    println(s"wrote ${maxN} integerized logs to $out")
  }

  private def sample(args: Array[String]): Unit = {
    val count = args.headOption.map(_.toLong).getOrElse(20000000L)
    val out = args.drop(1).headOption.getOrElse("/tmp/ln_sample.bin")
    val lo = 5000000L
    val hi = 1L << 40
    val o = new java.io.DataOutputStream(
      new java.io.BufferedOutputStream(new java.io.FileOutputStream(out)))
    def emit(n: Long): Unit = { o.writeLong(n); o.writeLong(lnU(n)) }
    try {
      // power-of-two neighborhoods first (deterministic, boundary-heavy)
      for (k <- 23 to 40; d <- -2 to 2) {
        val n = (1L << k) + d
        if (n > lo && n <= hi) emit(n)
      }
      // SplitMix64 stream, fixed seed — reproducible sample of the range
      var x = 0x9E3779B97F4A7C15L
      var i = 0L
      while (i < count) {
        x += 0x9E3779B97F4A7C15L
        var z = x
        z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
        z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
        z = z ^ (z >>> 31)
        val n = lo + 1 + java.lang.Long.remainderUnsigned(z, hi - lo)
        emit(n)
        i += 1
      }
    } finally o.close()
    println(s"wrote ${count} sampled (n, L(n)) pairs to $out")
  }
}
