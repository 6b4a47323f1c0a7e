package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Gate-safe presentation of wide exact integers.
  *
  * DECIMAL(38,0) is the right ACCUMULATOR for order-independent exact
  * sums (key checksums, Σ hash60 content digests, dyadic decay
  * weights) but the wrong OUTPUT type: the driver's result hasher
  * canonicalizes wide decimals through a path that loses >53-bit
  * precision (r8 lesson — q161/q162/q167 were the only
  * DECIMAL(38,0)-emitting queries in the 171-query catalog and the
  * only hash reds, with rows+schema green on all three). Presentation
  * therefore splits the exact non-negative sum into two BIGINT halves
  * (hi = x div 2^62, lo = x mod 2^62) — lossless for x < 2^125, far
  * above any Σ hash60 at any corpus scale (n·2^60 < 2^125 needs
  * n > 3·10^19 rows), and BIGINT outputs have hashed identically on
  * both engines across 8 rounds of gate evidence. The DECIMAL
  * accumulation stays internal; only the final projection splits.
  *
  * [[graft.SchemaGateSpec]] pins the invariant: no gated query may
  * emit a DecimalType output column.
  */
object Wide {
  /** 2^62 — the split radix; both halves fit BIGINT on both engines
    * (hi < 2^63 for x < 2^125; lo < 2^62 by construction).
    */
  val Radix = 4611686018427387904L

  /** High BIGINT half of a non-negative DECIMAL(38,0) column.
    * `div` is Spark's IntegralDivide — exact on decimals, LongType out.
    */
  def hi62(c: Column): Column = call_function("div", c, lit(Radix))

  /** Low BIGINT half (x mod 2^62; pmod ≡ mod for non-negative x). */
  def lo62(c: Column): Column = pmod(c, lit(Radix)).cast("long")

  /** DuckDB-oracle spellings: route through HUGEINT (exact up to
    * 2^127−1 > 10^38 ≥ any DECIMAL(38,0)) so the division never takes
    * a decimal-rescale path.
    */
  object sql {
    def hi62(x: String): String =
      s"CAST(CAST($x AS HUGEINT) // $Radix AS BIGINT)"
    def lo62(x: String): String =
      s"CAST(CAST($x AS HUGEINT) % $Radix AS BIGINT)"
  }
}
