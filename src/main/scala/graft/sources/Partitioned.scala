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
    * `event_date` as a column usable in pruning predicates). Uncached:
    * callers may backfill the path between reads — only [[eventsFor]]'s
    * write-once materializations are safe to memoize.
    */
  def readEvents(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Analyzed-relation cache for [[eventsFor]]'s materializations: the
    * layout is write-once per corpus (`_SUCCESS`-gated, fixtures
    * immutable), yet partition DISCOVERY walks every day directory — a
    * real listing constant at hundreds of days, paid by every
    * q27/q40/q41/q74 invocation in the round-5 bench. One discovered
    * `InMemoryFileIndex` per (session, path) serves every read;
    * partition PRUNING still happens per query against the cached index.
    */
  private[sources] val relCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  /** The `events` table of corpus `dir` THROUGH the date-partitioned
    * layout: ingested once per corpus (the production shape — facts land
    * partitioned at ingest; queries never re-read the raw drop), then
    * every caller reads the partitioned directory with `event_date`
    * available for planning-time pruning. The gated event queries
    * (q27/q40/q41/q74) source from here, so partition discovery and
    * pruning are exercised end-to-end under the driver's hash gate, not
    * just in `PartitionedSpec` isolation.
    *
    * Idempotent and cached via [[Materialize.once]] (the atomic-rename +
    * `_SUCCESS`-gate + source-fingerprint discipline, shared with the
    * ORC mirror).
    */
  def eventsFor(spark: SparkSession, dir: String): DataFrame = {
    val path = Materialize.once(dir, "events", s"$dir/events.parquet")(
      tmp => writeEventsByDay(Tables.events(spark, dir), tmp))
    relCache.computeIfAbsent((spark, path), _ => readEvents(spark, path))
  }

  /** EXECUTE the q111 compaction plan: rewrite a (possibly
    * trickle-ingested, many-small-files) date-partitioned event layout
    * into `dst` with each day's rows in ⌈rows/targetRows⌉ files — the
    * rewrite half of the small-file compaction whose planning table
    * q111 gates (`Events.compactionPlan` says what to touch; this
    * touches it). Rewrite-to-new-location, never in place: readers of
    * `src` (including a streaming sink's `_spark_metadata` log) stay
    * consistent, and the caller swaps directories atomically (the
    * AtomicWarehouse pointer discipline) when the rewrite lands.
    *
    * Scale shape: one exchange hash-keyed on the day routes each
    * partition's rows to a single writer task, and `maxRecordsPerFile`
    * splits that task's output at the target — exactly
    * ⌈rows/targetRows⌉ files per day, no global sort. A skew-heavy day
    * that outgrows one writer adds an intra-day salt to the
    * repartition key (q112's factors say how many) at the cost of up
    * to one extra under-filled file per salt — the usual
    * exactness-vs-parallelism dial.
    */
  def compactEvents(spark: SparkSession, src: String, dst: String,
      targetRows: Long): Unit =
    readEvents(spark, src)
      .repartition(col("event_date"))
      // within a day the q107 Morton order degenerates to user order
      // (the day bits are constant), so the compacted files ALSO gain
      // tight user_id footer bounds — sequential splitting of the
      // sorted stream hands each file a near-disjoint user range, and
      // a (user × date) rectangle prunes compacted files on both
      // dimensions (spec-gated)
      .sortWithinPartitions(col("event_date"), col("user_id"))
      .write.mode("overwrite")
      .option("maxRecordsPerFile", targetRows)
      .partitionBy("event_date")
      .parquet(dst)
}
