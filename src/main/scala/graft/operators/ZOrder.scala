package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Morton (Z-order) interleaving — the multi-dimensional CLUSTERING key
  * a 100 TB table is laid out on so that range predicates on EITHER
  * dimension prune files. A single-dimension sort gives perfect
  * pruning on that dimension and none on any other; interleaving the
  * bits of two range-bucketed dimensions keeps rows that are close in
  * BOTH dimensions close in the file order, so per-file min/max
  * statistics (or a partition directory per Z-bucket) turn any 2-D box
  * — or either single-dimension slice — into a small set of files.
  * This is the layout move behind Delta/Iceberg `OPTIMIZE ZORDER BY`,
  * rebuilt here from public bit-twiddling (Morton 1966; the standard
  * parallel-prefix spread masks).
  *
  * Everything is exact BIGINT arithmetic on codegen'd builtins
  * (shiftleft / bitwise and-or), replicated verbatim by the DuckDB
  * oracle — no UDF, no floating point, so the key is bit-identical
  * across engines and partitionings.
  */
object ZOrder {

  /** Number of bits per dimension (two dims → a 32-bit Z key). 16 bits
    * = 65,536 range buckets per dimension: at 1000 files/bucket that
    * addresses ~65M files per dimension pair — past any single table's
    * file count — while keeping the interleave 4 mask steps. */
  val BitsPerDim = 16
  /** Bucket count per dimension (2^16). */
  val DimBuckets = 65536L

  /** Exact range bucketing of `v` (any BIGINT) into [0, 65536):
    * ((v - lo) * 65536) div (hi - lo + 1). Emitted as a SQL fragment
    * for `expr(...)` because BIGINT-exact division is the `div`
    * operator (`/` on longs is double division, whose rounding could
    * cross a bucket boundary). Monotone in v; lo ↦ 0, and hi ↦ 65535
    * when the value range has ≥ 65536 distinct values — for smaller
    * domains of n = hi-lo+1 values, hi maps to floor((n-1)·65536/n)
    * (< 65535; e.g. the ~2500-value order-day dimension tops out at
    * 65509). Parity with the Duck twin is unaffected either way.
    * Safe while (v - lo) * 65536 fits in BIGINT, i.e. value ranges up
    * to ~1.4e14 — domain keys and epoch-days are far inside. */
  def rangeBucketSpark(v: String, lo: String, hi: String): String =
    s"(((($v) - ($lo)) * ${DimBuckets}L) div (($hi) - ($lo) + 1L))"

  /** The DuckDB twin of [[rangeBucketSpark]]. */
  def rangeBucketDuck(v: String, lo: String, hi: String): String =
    s"((($v) - ($lo)) * 65536) // (($hi) - ($lo) + 1)"

  /** Spread the low 16 bits of `c` onto the even bit positions 0,2,…,30
    * (parallel-prefix masks; each step doubles the gap). Input must be
    * in [0, 65536) — [[rangeBucketSpark]] output. */
  def spread16(c: Column): Column = {
    val s1 = (c.bitwiseOR(shiftleft(c, 8))).bitwiseAND(lit(0x00FF00FFL))
    val s2 = (s1.bitwiseOR(shiftleft(s1, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val s3 = (s2.bitwiseOR(shiftleft(s2, 2))).bitwiseAND(lit(0x33333333L))
    (s3.bitwiseOR(shiftleft(s3, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** The DuckDB twin of [[spread16]] — same four mask steps, spelled
    * with `&`/`|`/`<<` (DuckDB evaluates them on BIGINT). Emitted as a
    * nested expression so the oracle needs no engine-side function. */
  def spread16Duck(e: String): String = {
    val s1 = s"((($e) | (($e) << 8)) & 16711935)"
    val s2 = s"(($s1 | ($s1 << 4)) & 252645135)"
    val s3 = s"(($s2 | ($s2 << 2)) & 858993459)"
    s"(($s3 | ($s3 << 1)) & 1431655765)"
  }

  /** 32-bit Morton key of two 16-bit bucket ids: `a` on even bits,
    * `b` on odd bits. */
  def interleave16(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))
}
