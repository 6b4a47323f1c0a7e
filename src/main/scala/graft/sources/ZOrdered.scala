package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-ORDER (Morton) clustered event layout — the multi-dimensional
  * third of the storage-layout family ([[Partitioned]] prunes on one
  * dimension, [[Bucketing]] co-locates a join key, this clusters TWO
  * filter dimensions at once). Rows are range-partitioned and sorted by
  * the interleaved (user cell, day cell) key, so each output file
  * covers a contiguous z-range — a small rectangle in (user, time)
  * space — and its parquet footer min/max statistics are tight on BOTH
  * columns. A query filtering user AND date then skips files on either
  * bound, where the date layout can only skip days.
  *
  * The cell geometry and the audit query over it live in
  * `operators.Events` (q107): this object owns the physical key and the
  * writer, the operator derives the portable statistics table.
  *
  * Scale shape: the key is map-side integer arithmetic; the one
  * range-exchange IS the clustering cost (identical shape to any sorted
  * write); file count is the caller's dial. At 100 TB the same write
  * runs per date partition (z-order WITHIN each day) so clustering
  * composes with retention and backfill instead of replacing them.
  */
object ZOrdered {

  /** Interleave the low 8 bits of `c` with zeros (bit i → bit 2i). */
  private def spread8(c: Column): Column = {
    val x0 = c.bitwiseAND(lit(255L))
    val x1 = x0.bitwiseOR(shiftleft(x0, 4)).bitwiseAND(lit(0x0F0FL))
    val x2 = x1.bitwiseOR(shiftleft(x1, 2)).bitwiseAND(lit(0x3333L))
    x2.bitwiseOR(shiftleft(x2, 1)).bitwiseAND(lit(0x5555L))
  }

  /** Exact integer FLOOR division (the oracle's `//`): subtracting the
    * non-negative `pmod` remainder makes the division exact, so the
    * double-typed `/` introduces no rounding for |x| < 2^53 (any
    * realistic cell coordinate; a corpus outgrowing that re-tunes the
    * cell dials long before the arithmetic bound bites).
    */
  private def floorDiv(x: Column, d: Long): Column =
    ((x - pmod(x, lit(d))) / d).cast("long")

  /** Morton key for an event: user cell (user_id ÷ `userCell`, odd
    * bits) interleaved with the day cell (days since `epochUs`, even
    * bits). Shared by the writer and the q107 audit so layout and
    * statistics table agree by construction.
    *
    * Cells use FLOOR division and non-negative `pmod` — matching the
    * oracle's `//` + wrapped `%` — so an event before the epoch or a
    * negative user id lands in the same cell on both engines
    * (truncate-toward-zero plus a sign-blind bitmask would not).
    */
  def zKeyFor(user: Column, ts: Column, userCell: Long, epochUs: Long): Column = {
    val dayUs = 86400L * 1000000L
    val uCell = pmod(floorDiv(user, userCell), lit(256L))
    val dCell = pmod(floorDiv(unix_micros(ts) - epochUs, dayUs), lit(256L))
    spread8(uCell) * 2 + spread8(dCell)
  }

  /** Write `events` z-clustered into `numFiles` files: one range
    * exchange on the Morton key, rows sorted by it within each file.
    */
  def writeEventsZOrdered(events: DataFrame, path: String,
      userCell: Long, epochUs: Long, numFiles: Int = 16): Unit =
    events
      .withColumn("zkey", zKeyFor(col("user_id"), col("ts"), userCell, epochUs))
      .repartitionByRange(numFiles, col("zkey"))
      .sortWithinPartitions("zkey")
      .write.mode("overwrite").parquet(path)

  def readEvents(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
