package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Date-partitioned event layout — the other storage-layout half of the
  * 100 TB design next to [[Bucketing]]: facts land in one directory per
  * event date, so every time-bounded query prunes to the touched days
  * at PLANNING time (`PartitionFilters` on the scan — zero I/O for the
  * rest), retention is a directory drop, and backfills replace a single
  * partition idempotently via dynamic partition overwrite.
  *
  * The partition column is DERIVED (`to_date(ts)`) and kept alongside
  * the full-precision `ts`: queries keep their exact event-time
  * semantics, the layout only adds the coarse pruning key — predicates
  * on `event_date` prune directories, predicates on `ts` still push to
  * parquet row groups within them.
  */
object Partitioned {

  /** Write `events` partitioned by event date. Dynamic overwrite mode
    * replaces only the partitions present in `df` — the backfill
    * contract (a full-overwrite would drop every other day).
    */
  def writeEventsByDay(events: DataFrame, path: String): Unit =
    events
      .withColumn("event_date", to_date(col("ts")))
      .write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("event_date")
      .parquet(path)

  /** Read the partitioned layout back (partition discovery gives
    * `event_date` as a column usable in pruning predicates).
    */
  def readEvents(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
