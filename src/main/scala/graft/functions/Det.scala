package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Deterministic aggregation helpers.
  *
  * Floating-point SUM/AVG over a shuffled Dataset is not associative:
  * partial aggregates combine in partition order, so the last ulps of a
  * DOUBLE sum differ run-to-run and engine-to-engine. Every aggregate the
  * engine emits must instead be **bitwise deterministic** so differential
  * testing against a single-threaded oracle (and re-runs at 1000-executor
  * scale) hash-match exactly:
  *
  *  - counts and sums of integer(-valued) columns are exact — use them
  *    freely;
  *  - rates are `SUM(int_flag)::DOUBLE / COUNT(*)` — one exact sum, one
  *    exact count, a single IEEE division;
  *  - sums/means of genuinely fractional DOUBLEs route through an exact
  *    DECIMAL accumulator (`sumDet`/`avgDet`): the per-row cast is
  *    deterministic, the decimal sum is exact (order-independent), and the
  *    final cast back to DOUBLE is a single deterministic rounding.
  */
object Det {

  /** Exact decimal accumulator wide enough for 100 TB-scale sums:
    * 12 fractional digits, 26 integral digits.
    */
  private val Acc = DecimalType(38, 12)

  /** Order-independent sum of a DOUBLE column, returned as DOUBLE. */
  def sumDet(c: Column): Column = sum(c.cast(Acc)).cast("double")

  /** Order-independent mean of a DOUBLE column, returned as DOUBLE. */
  def avgDet(c: Column): Column = sum(c.cast(Acc)).cast("double") / count(c)

  /** Rate of an integer 0/1 flag: exact sum over exact count. */
  def rate(flag: Column): Column = sum(flag).cast("double") / count(lit(1))

  /** Mean of an integer column (e.g. day deltas): exact sum over count. */
  def avgInt(c: Column): Column = sum(c).cast("double") / count(lit(1))

  /** SQL NULLIF(c, 0) — division-by-zero guard kept explicit so the
    * semantics hold under ANSI and non-ANSI modes alike
    * (reference: compute_kpis.py:64).
    */
  def nullIfZero(c: Column): Column = when(c === 0, lit(null)).otherwise(c)

  /** Money amount as exact DECIMAL(18,2) — parquet DOUBLE prices are
    * 2-decimal values, so this cast is lossless and per-row deterministic.
    */
  def money(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Small 2-dp fraction (discount/tax rates in [0,1]). */
  def frac(c: Column): Column = c.cast(DecimalType(4, 2))
}
