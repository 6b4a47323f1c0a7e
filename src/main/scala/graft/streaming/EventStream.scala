package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Structured Streaming surface over the `events` table: the streaming
  * twin of the batch operators in `graft.operators.Events`.
  *
  * Design:
  *  - event-time = `ts` with a 10-minute watermark: late rows beyond the
  *    watermark are dropped, state for closed windows is reclaimed — the
  *    requirement for unbounded runs at scale;
  *  - tumbling 5-minute windows keyed (window, event_type) — identical
  *    semantics to the batch q27, so the batch oracle doubles as the
  *    streaming correctness reference under Trigger.AvailableNow;
  *  - `dropDuplicatesWithinWatermark` on event_id bounds dedup state the
  *    same way (exactly-once per event id within the lateness horizon);
  *  - sinks append mode: only finalized windows emit, so downstream
  *    consumers never see retractions.
  *
  * The parquet fixture stores `ts` as TIMESTAMP(NANOS); streaming reads
  * use an explicit schema with a long `ts_nanos` and convert via integer
  * div — same path as the batch `Tables` loader.
  */
object EventStream {

  /** Explicit read schema (streaming sources do not infer). */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // TIMESTAMP(NANOS) read as nanos-since-epoch
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Unbounded source over a directory of event parquet files. */
  def source(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream
      .schema(eventsSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Streaming q27: watermarked tumbling-window rates per event type. */
  def windowedRates(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")
      .groupBy(window(col("ts"), "5 minutes").as("win"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(12, 2))).cast("double").as("sum_value"))
      .select(col("win.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Run the windowed-rate stream over all data currently in `dir` and
    * block until drained (Trigger.AvailableNow) — batch-equivalent
    * semantics, used by tests and backfills. Results land in the
    * `tableName` in-memory sink table.
    */
  def runAvailableNow(spark: SparkSession, dir: String, tableName: String): StreamingQuery = {
    val q = windowedRates(source(spark, dir))
      .writeStream
      .format("memory")
      .queryName(tableName)
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** Streaming twin of the batch q40 range join: purchases matched to
    * the same user's clicks in the 10 minutes strictly before them, as a
    * watermarked stream-stream interval join.
    *
    * State bound: the watermark on both sides plus the two-sided time
    * bound in the join condition lets Spark evict click state older than
    * (purchase watermark − 10 min) and purchase state the click side can
    * no longer match — without both, stream-stream join state grows
    * forever. Inner join, so matches emit as they form (no watermark
    * close needed) and a drained AvailableNow run equals the batch inner
    * join exactly.
    */
  def purchaseClickJoin(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("value").as("c_value"))
      .withWatermark("c_ts", "10 minutes")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
      .withWatermark("ts", "10 minutes")
    purchases.join(clicks, expr(
      """c_user = user_id
        |AND c_ts >= ts - INTERVAL 10 MINUTES
        |AND c_ts < ts""".stripMargin))
      .select(col("event_id"), col("user_id"), col("ts"),
        col("c_ts"), col("c_value"))
  }

  /** Drain the interval join over `dir` into a memory sink table. */
  def runIntervalJoin(spark: SparkSession, dir: String, tableName: String): StreamingQuery = {
    val q = purchaseClickJoin(source(spark, dir))
      .writeStream
      .format("memory")
      .queryName(tableName)
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }
}
