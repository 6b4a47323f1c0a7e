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

  /** Root for materialized layouts: tmpfs, like the bench warehouse —
    * derived data, safe to drop.
    */
  private val MaterializeRoot = "/dev/shm/graft-partitioned"

  private val materialized = scala.collection.mutable.Set[String]()

  /** Analyzed-relation cache for [[eventsFor]]'s materializations: the
    * layout is write-once per corpus (`_SUCCESS`-gated, fixtures
    * immutable), yet partition DISCOVERY walks every day directory — a
    * real listing constant at hundreds of days, paid by every
    * q27/q40/q41/q74 invocation in the round-5 bench. One discovered
    * `InMemoryFileIndex` per (session, path) serves every read;
    * partition PRUNING still happens per query against the cached index.
    */
  private val relCache =
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
    * Idempotent and cached: ingest writes to a PRIVATE temp directory
    * and atomically renames it into place (the [[AtomicWarehouse]]
    * pointer discipline applied to the layout cache), so a reader can
    * never observe a half-written layout and concurrent driver JVMs
    * can't clobber each other mid-write — the loser of the rename race
    * discards its (bitwise-identical, the write is deterministic) copy.
    * The `_SUCCESS` marker only ever exists inside a fully-landed
    * rename, so its presence is a sound re-ingest gate; a directory
    * WITHOUT it is a crashed pre-rename leftover and is rebuilt. The
    * cache key fingerprints the source files (name/size/mtime), so a
    * regenerated fixture at the same path lands a fresh layout instead
    * of silently serving the stale one.
    */
  def eventsFor(spark: SparkSession, dir: String): DataFrame = {
    val src = java.nio.file.Paths.get(s"$dir/events.parquet")
    val stamp =
      if (!java.nio.file.Files.exists(src)) "absent"
      else if (java.nio.file.Files.isDirectory(src)) {
        import scala.jdk.CollectionConverters._
        val s = java.nio.file.Files.list(src)
        try s.iterator().asScala
          .map(p => s"${p.getFileName}:${java.nio.file.Files.size(p)}:" +
            s"${java.nio.file.Files.getLastModifiedTime(p).toMillis}")
          .toSeq.sorted.mkString("|")
        finally s.close()
      } else s"${java.nio.file.Files.size(src)}:" +
        s"${java.nio.file.Files.getLastModifiedTime(src).toMillis}"
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$dir|$stamp".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.take(12)
    val path = s"$MaterializeRoot/$key/events"
    materialized.synchronized {
      if (!materialized.contains(path)) {
        val dst = java.nio.file.Paths.get(path)
        val marker = dst.resolve("_SUCCESS")
        if (!java.nio.file.Files.exists(marker)) {
          // build the layout FIRST, then decide whether dst still needs
          // clearing: the in-process lock doesn't cover other JVMs, so a
          // concurrent writer's atomic rename can land a valid layout at
          // any moment — re-checking the marker immediately before the
          // delete closes the check-then-delete window (we never clobber
          // a layout that landed after the outer check; marker-less dst
          // is a crashed pre-rename leftover no JVM ever reads)
          val tmp = dst.resolveSibling(
            s".tmp-events-${java.util.UUID.randomUUID().toString.take(13)}")
          writeEventsByDay(Tables.events(spark, dir), tmp.toString)
          if (!java.nio.file.Files.exists(marker)) {
            deleteRecursively(dst)
            try
              java.nio.file.Files.move(tmp, dst,
                java.nio.file.StandardCopyOption.ATOMIC_MOVE)
            catch {
              // either another JVM landed the (deterministic, identical)
              // layout between our delete and rename — keep theirs — or
              // the move failed outright (permissions, cross-filesystem
              // ATOMIC_MOVE): distinguish by the marker, and rethrow the
              // original failure rather than surfacing later as an
              // unrelated parquet read error on an absent layout
              case e: java.nio.file.FileSystemException =>
                if (java.nio.file.Files.exists(marker)) deleteRecursively(tmp)
                else throw e
            }
          } else deleteRecursively(tmp) // concurrent JVM won; identical bytes
        }
        materialized += path
      }
    }
    relCache.computeIfAbsent((spark, path), _ => readEvents(spark, path))
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(p)) {
      val walk = java.nio.file.Files.walk(p)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(f => java.nio.file.Files.deleteIfExists(f))
      finally walk.close()
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
