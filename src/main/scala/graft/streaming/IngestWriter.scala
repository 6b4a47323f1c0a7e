package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming INGEST into the date-partitioned event layout — the
  * write-path that produces what `sources.Partitioned` reads: an
  * unbounded event stream lands micro-batch by micro-batch into one
  * directory per `event_date`, exactly-once via the parquet sink's
  * checkpoint + `_spark_metadata` commit log (a replayed batch is
  * skipped by the log, never double-written).
  *
  * This is the piece that makes the layout family operational: stream →
  * [[start]] (trickle files per day) → `Events.compactionPlan` (q111,
  * what to rewrite) → `Partitioned.compactEvents` (the rewrite) →
  * `Partitioned.readEvents` (pruned queries). Trickle ingest
  * necessarily writes a file per day PER MICRO-BATCH — that
  * small-file debt is by design (latency first), and compaction is the
  * scheduled repayment.
  *
  * Scale notes: the sink adds no shuffle — rows land where the source
  * partitioned them, the `partitionBy` only routes writers; state is
  * the file-commit log, not row data. At 100 TB the same shape runs
  * continuously with compaction on a daily cadence over closed
  * partitions (open day excluded — its files are still arriving).
  */
object IngestWriter {

  /** Start landing `events` (a streaming DataFrame with `ts`) into the
    * partitioned parquet layout at `path`. AvailableNow by default so
    * tests and backfills drain-and-stop; pass a different trigger for
    * continuous ingest.
    */
  def start(events: DataFrame, path: String, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    events
      .withColumn("event_date", to_date(col("ts")))
      .writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .partitionBy("event_date")
      .trigger(trigger)
      .start()
}
