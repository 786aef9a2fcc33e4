package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Cross-engine-deterministic arithmetic helpers.
  *
  * The driver hash-compares our parquet output against DuckDB running the
  * `oracleSql` twin. Double-precision SUMs are order-dependent (Spark's
  * partial aggregation makes the addition order nondeterministic), so every
  * aggregated money/quantity column goes through exact DECIMAL arithmetic
  * and is cast back to DOUBLE only at the end. The decimal intermediates
  * are sized so neither Spark nor DuckDB (both cap precision at 38) ever
  * rounds: inputs are 2-dp doubles, discounts/taxes are 2-dp fractions.
  *
  * This also matters at 100 TB: a plan whose result changes with partition
  * count is not reproducible; decimal partial aggregation keeps the whole
  * pipeline associative AND exact, at negligible CPU cost next to the scan.
  */
object Portable {
  /** Exact sum of a column holding 2-decimal values, emitted as DOUBLE. */
  def dsum2(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast(DoubleType)

  /** Exact mean of a 2-decimal column: decimal sum, then a single
    * IEEE-deterministic double division. */
  def davg2(c: Column): Column =
    sum(c.cast(DecimalType(18, 2))).cast(DoubleType) / count(lit(1))

  /** price * (1 - discount) in exact decimal: DECIMAL(12,2) * DECIMAL(6,4). */
  def discPrice(price: Column, disc: Column): Column =
    (price.cast(DecimalType(12, 2)) * (lit(1.0) - disc).cast(DecimalType(6, 4)))
      .cast(DecimalType(24, 6))

  /** price * (1 - discount) * (1 + tax) in exact decimal. */
  def charge(price: Column, disc: Column, tax: Column): Column =
    (discPrice(price, disc) * (lit(1.0) + tax).cast(DecimalType(6, 4)))
      .cast(DecimalType(30, 10))

  /** Sum an exact-decimal column and emit DOUBLE. The sum is rounded to
    * scale 2 BEFORE the double cast: a high-scale decimal sum can exceed
    * 2^53 in scaled-integer form, where DuckDB's int128→double + /10^s
    * double-rounding can differ from Spark's correctly-rounded
    * BigDecimal→double by 1 ulp. At scale 2 the conversion is exact in
    * both engines. */
  def sumd(c: Column): Column = round(sum(c), 2).cast(DoubleType)

  /** Milliseconds since epoch of a timestamp column (portable: DuckDB
    * epoch_ms has identical semantics under a UTC session). */
  def epochMs(c: Column): Column = unix_millis(c)
}
