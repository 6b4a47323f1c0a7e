package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.sources.Tables

/** Batch analytics over the `events` stream table: tumbling-window
  * aggregation, JSON-prop extraction stats, and per-user top-event
  * ranking. The streaming twin of [[eventWindows]] lives in
  * `graft.streaming.EventStream` (same window semantics under a
  * watermark).
  *
  * Scale design (100 TB): the window aggregate groups on
  * (window, event_type) — high cardinality, hash-partitioned, partial
  * aggregation combines map-side. Per-user ranking shuffles once on
  * user_id; no global windows anywhere. Sums of the 2-decimal `value`
  * column go through an exact DECIMAL accumulator so results are
  * order-independent (see graft.functions.Det).
  */
object Events {

  /** q27 — tumbling 5-minute windows per event type. Reads through the
    * date-partitioned layout ([[graft.sources.Partitioned.eventsFor]]):
    * same rows as the raw drop (the hash gate proves it), but the scan
    * is partition-discovered, so the q74 pruning path and this
    * full-range path share one storage layout end-to-end.
    */
  def eventWindows(spark: SparkSession, dir: String): DataFrame =
    eventWindowsFrom(graft.sources.Partitioned.eventsFor(spark, dir))

  def eventWindowsFrom(events: DataFrame): DataFrame = {
    val sumVal = sum(col("value").cast(DecimalType(12, 2))).cast("double")
    events
      .groupBy(window(col("ts"), "5 minutes").as("win"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sumVal.as("sum_value"),
        (sumVal / count(lit(1))).as("avg_value"))
      .select(col("win.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"), col("avg_value"))
      .orderBy("window_start", "event_type")
  }

  /** q28 — JSON props extraction (`{"k": <int>}`) + per-type stats.
    * Extraction via regexp (shared dialect with the oracle); cast
    * guarded for ANSI mode.
    */
  def propStats(spark: SparkSession, dir: String): DataFrame =
    propStatsFrom(Tables.events(spark, dir))

  def propStatsFrom(events: DataFrame): DataFrame = {
    val raw = regexp_extract(col("props"), "\"k\":\\s*(\\d+)", 1)
    val k = when(raw === "", lit(null)).otherwise(raw).cast("int")
    events
      .select(col("event_type"), col("user_id"), k.as("k"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("n_users"),
        min("k").as("min_k"), max("k").as("max_k"),
        (sum("k").cast("double") / count(col("k"))).as("avg_k"))
      .orderBy("event_type")
  }

  /** q29 — highest-value event per user (deterministic tie-break on
    * ts, event_id).
    */
  def topEventPerUser(spark: SparkSession, dir: String): DataFrame =
    topEventPerUserFrom(Tables.events(spark, dir))

  def topEventPerUserFrom(events: DataFrame): DataFrame = {
    val rn = row_number().over(Window.partitionBy("user_id")
      .orderBy(desc("value"), asc("ts"), asc("event_id")))
    events
      .withColumn("rn", rn).filter(col("rn") === 1)
      .select("user_id", "event_id", "event_type", "value", "ts")
      .orderBy("user_id")
  }

  /** q35 — top-3 events by value per user via the native
    * [[graft.plans.TopKPerKey]] whole-operator (custom logical node +
    * strategy + partial/final bounded-heap physical plan). Same rows as
    * the `row_number` window idiom the oracle runs, but the exchange
    * carries at most k rows per key per map partition instead of every
    * event — the plan shape that survives a 100 TB events table.
    */
  def topKPerUser(spark: SparkSession, dir: String): DataFrame =
    topKPerUserFrom(Tables.events(spark, dir))

  def topKPerUserFrom(events: DataFrame): DataFrame =
    graft.plans.TopKPerKey(
      events.select("user_id", "event_id", "event_type", "value"),
      Seq(col("user_id")),
      Seq(col("value").desc, col("event_id").asc), 3)
      .orderBy("user_id", "rank")

  /** q37 — gap-based user sessions via the custom-state
    * [[graft.streaming.Sessionize]] operator (flatMapGroupsWithState) in
    * batch mode: sessions closed by a ≥30-min in-stream gap, emitted
    * with exact micro-precision bounds. Each user's trailing session
    * stays open (no timeout processing in batch) and is not emitted —
    * the oracle mirrors that by dropping each user's last session. This
    * puts the stateful streaming operator itself under the DuckDB
    * hash-gate, not just its batch twin.
    */
  def sessions(spark: SparkSession, dir: String): DataFrame =
    sessionsFrom(Tables.events(spark, dir))

  def sessionsFrom(events: DataFrame): DataFrame =
    graft.streaming.Sessionize
      .sessions(events.select("user_id", "ts", "value", "event_id"))
      .toDF()
      .orderBy("user_id", "session_start")

  /** Range-join bucket width == the range length, so every probe row
    * lands in exactly 2 consecutive buckets.
    */
  private val RangeMicros = 10L * 60 * 1000 * 1000

  /** q40 — time-range join: for every purchase, the count and max value
    * of the same user's clicks in the 10 minutes strictly before it
    * (`click.ts ∈ [purchase.ts − 10 min, purchase.ts)`).
    *
    * Scale design: a naive `t1.ts BETWEEN t2.ts − x AND t2.ts` join has
    * no equi-key, so Spark plans a broadcast/cartesian nested loop —
    * quadratic at 100 TB. Instead both sides are binned to
    * 10-minute buckets (integer `div`, no float rounding); each purchase
    * probes its own and the previous bucket via `explode`, the join is a
    * plain shuffled HASH join on (user_id, bucket), and the exact range
    * predicate runs as the join's post-filter. Cost: 2× probe-side rows,
    * comparisons ∝ matches per bucket, never |clicks|×|purchases|.
    */
  def rangeJoinClicks(spark: SparkSession, dir: String): DataFrame =
    rangeJoinClicksFrom(graft.sources.Partitioned.eventsFor(spark, dir))

  /** Floor division on long micros: `div` truncates toward zero, which
    * would bucket pre-1970 (negative) timestamps one slot too high and
    * silently drop matches vs the exact BETWEEN predicate. Subtracting
    * the non-negative `pmod` first makes the dividend an exact multiple,
    * so `div` is exact floor for any sign — and identical to plain `div`
    * for the common ts ≥ epoch case (no hash change).
    */
  private def floorBucket: Column =
    expr(s"(unix_micros(ts) - pmod(unix_micros(ts), $RangeMicros)) div $RangeMicros")

  def rangeJoinClicksFrom(events: DataFrame): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), floorBucket.as("b"))
      .withColumn("bucket", explode(array(col("b") - 1, col("b"))))
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("value").as("c_value"), floorBucket.as("bucket"))
    purchases
      .join(clicks,
        col("user_id") === col("c_user") &&
          purchases("bucket") === clicks("bucket") &&
          col("c_ts") >= col("ts") - expr("INTERVAL 10 MINUTES") &&
          col("c_ts") < col("ts"),
        "left")
      .groupBy("event_id", "user_id", "ts")
      .agg(count(col("c_ts")).as("n_prior_clicks"),
        max(col("c_value")).as("max_click_value"))
      .orderBy("event_id")
  }

  /** q41 — sliding windows: 10-minute windows advancing every 5 minutes
    * (each event lands in exactly 2 windows). Same plan shape as the
    * tumbling q27 — the slide only multiplies grouping rows by
    * window/slide, it adds no extra shuffle.
    */
  def slidingWindows(spark: SparkSession, dir: String): DataFrame =
    slidingWindowsFrom(graft.sources.Partitioned.eventsFor(spark, dir))

  def slidingWindowsFrom(events: DataFrame): DataFrame = {
    val sumVal = sum(col("value").cast(DecimalType(12, 2))).cast("double")
    events
      .groupBy(window(col("ts"), "10 minutes", "5 minutes").as("win"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"), sumVal.as("sum_value"))
      .select(col("win.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))
      .orderBy("window_start", "event_type")
  }

  /** q64 — ordered conversion funnel view → click → purchase: per user
    * the earliest view, the earliest click strictly after it, and the
    * earliest purchase strictly after that; aggregated to stage reach
    * counts and step conversion rates.
    *
    * Scale shape: the three stage timestamps are stacked MIN windows
    * over the SAME user_id partitioning — one hash exchange, one sort,
    * three window passes that each reuse the previous exchange (each
    * stage's condition references the prior stage's per-user constant,
    * which is why this is windows and not one flat groupBy). The
    * per-user reduction then rides the same partitioning with no new
    * exchange, and the final single-row aggregate is a two-phase
    * partial. A join-per-stage formulation would shuffle the events
    * table once per funnel step.
    */
  def funnel(spark: SparkSession, dir: String): DataFrame =
    funnelFrom(Tables.events(spark, dir))

  def funnelFrom(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id")
    val staged = events
      .select(col("user_id"), col("event_type"), col("ts"))
      .withColumn("v_ts",
        min(when(col("event_type") === "view", col("ts"))).over(w))
      .withColumn("c_ts",
        min(when(col("event_type") === "click" && col("ts") > col("v_ts"),
          col("ts"))).over(w))
      .withColumn("p_ts",
        min(when(col("event_type") === "purchase" && col("ts") > col("c_ts"),
          col("ts"))).over(w))
    staged
      .groupBy("user_id")
      .agg(max("v_ts").as("v_ts"), max("c_ts").as("c_ts"),
        max("p_ts").as("p_ts"))
      .agg(count(lit(1)).as("n_users"),
        count("v_ts").as("n_view"),
        count("c_ts").as("n_click"),
        count("p_ts").as("n_purchase"))
      .select(col("n_users"), col("n_view"), col("n_click"), col("n_purchase"),
        round(col("n_click").cast("double") /
          graft.functions.Det.nullIfZero(col("n_view")), 9).as("view_to_click"),
        round(col("n_purchase").cast("double") /
          graft.functions.Det.nullIfZero(col("n_click")), 9).as("click_to_purchase"))
  }

  /** q72 — frame-bounded window analytics per user: running value
    * total (unbounded-preceding decimal sum), centered 7-row moving
    * average (3 preceding..3 following), quartile bucket (ntile) and
    * cumulative distribution — the per-entity trend/rank features an
    * events table feeds into monitoring and feature stores.
    *
    * Scale shape: every window shares the SAME (user_id) partitioning
    * and (ts, event_id) total order — one hash exchange + one sort
    * serve all four functions; frames are row-bounded so state is O(1)
    * per row. Determinism: the order key is total (ts ties broken by
    * event_id), fractional sums ride the exact DECIMAL accumulator,
    * ntile/cume_dist are pure rank arithmetic.
    */
  def valueWindows(spark: SparkSession, dir: String): DataFrame =
    valueWindowsFrom(Tables.events(spark, dir))

  def valueWindowsFrom(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(asc("ts"), asc("event_id"))
    val dec = col("value").cast(DecimalType(12, 2))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val mov = w.rowsBetween(-3, 3)
    events
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .withColumn("run_total", sum(dec).over(run).cast("double"))
      .withColumn("mov_avg",
        (sum(dec).over(mov).cast("double") / count(lit(1)).over(mov)))
      .withColumn("quartile", ntile(4).over(w))
      .withColumn("cum_dist", cume_dist().over(w))
      .orderBy("user_id", "ts", "event_id")
  }

  /** q74 date-slice bounds (inclusive): one week of the 30-day fixture
    * window, so the partitioned scan prunes 23 of 30 day directories at
    * planning time.
    */
  val SliceFrom = "2024-01-08"
  val SliceTo = "2024-01-14"

  /** q74 — date-sliced window rates: the q27 aggregate restricted to a
    * one-week `event_date` range, reading the date-partitioned layout.
    * This is THE query shape the layout exists for — a dashboard or
    * backfill touching days, not the whole history. The `event_date`
    * predicate is a PLANNING-time partition filter (the untouched 23 of
    * 30 day directories are never listed, opened, or read — at 100 TB
    * that is the difference between a week and the full table), while
    * the exact `ts` semantics inside the kept days are unchanged.
    * `PlanQualitySpec` asserts the pruned scan; the driver gate hashes
    * the rows against the raw-table oracle.
    */
  def eventDaySlice(spark: SparkSession, dir: String): DataFrame =
    eventWindowsFrom(
      graft.sources.Partitioned.eventsFor(spark, dir)
        .filter(col("event_date").between(lit(SliceFrom), lit(SliceTo))))

  /** q101 audit range (inclusive): the 3-day slice whose partitions a
    * range query would scan.
    */
  val ZoneLoDate = "2024-01-10"
  val ZoneHiDate = "2024-01-12"

  /** q101 — partition ZONE MAP audit: one row per date partition of the
    * partitioned event layout with its row count, event-time bounds and
    * value bounds, plus the scan/skip decision a [[ZoneLoDate]]..
    * [[ZoneHiDate]] range query would take — the file-skipping evidence
    * table behind q74's pruned plan (the thing an operator consults to
    * answer "how many bytes does this backfill touch" before running
    * it).
    *
    * Scale shape: grouping is BY THE PARTITION COLUMN, so the aggregate
    * is perfectly aligned with the layout — map-side partials complete
    * within each partition's files and the reduce side is
    * day-cardinality; at 100 TB the same statistics are served from
    * parquet footer metadata (aggregate pushdown / zone maps) without
    * touching row data — this query IS that metadata, derived the
    * portable way.
    */
  def partitionZoneMap(spark: SparkSession, dir: String): DataFrame =
    zoneMapOf(graft.sources.Partitioned.eventsFor(spark, dir))

  def zoneMapOf(events: DataFrame): DataFrame =
    events.groupBy(col("event_date"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("ts")).as("min_ts"), max(col("ts")).as("max_ts"),
        min("value").as("min_value"), max("value").as("max_value"))
      .withColumn("scanned", col("event_date")
        .between(to_date(lit(ZoneLoDate)), to_date(lit(ZoneHiDate))))
      .orderBy("event_date")

  /** q104 — calendar resample + gap-fill: per (user, day) activity over
    * a dense date spine covering the corpus horizon, zero-filled where
    * the user was inactive, with a trailing 7-day rolling event count.
    * This is the missing-timestep repair every rolling-window feature
    * (and every forecasting/training label join) needs — rolling frames
    * over a SPARSE per-entity series silently span variable real-time
    * widths; the dense spine makes `ROWS BETWEEN 6 PRECEDING` mean
    * "7 calendar days" exactly.
    *
    * Scale shape: the day spine is horizon-sized (one row per day —
    * thousands at a century) and broadcast, so the users×days spine is a
    * map-side stretch of the distinct-user relation, never a shuffle;
    * the observed (user, day) aggregate is the one hash exchange and the
    * spine LEFT JOIN plus the rolling window both ride a user_id
    * partitioning. Output is |users|×|days| — the caller's chosen
    * densification, linear in users. Day sums ride the exact DECIMAL
    * accumulator; the rolling count is integer arithmetic over a total
    * (user_id, day) order, so the gate hash is stable by construction.
    */
  def userDayGapfill(spark: SparkSession, dir: String): DataFrame =
    userDayGapfillFrom(Tables.events(spark, dir))

  def userDayGapfillFrom(events: DataFrame): DataFrame = {
    val byDay = events
      .select(col("user_id"), col("ts").cast("date").as("day"), col("value"))
      .groupBy("user_id", "day")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(12, 2))).cast("double").as("sv"))
    val days = events
      .agg(min(col("ts").cast("date")).as("d0"), max(col("ts").cast("date")).as("d1"))
      .select(explode(sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("day"))
    val spine = events.select("user_id").distinct().crossJoin(broadcast(days))
    val filled = spine.join(byDay, Seq("user_id", "day"), "left")
      .select(col("user_id"), col("day"),
        coalesce(col("n"), lit(0L)).as("n_events"),
        coalesce(col("sv"), lit(0.0)).as("sum_value"))
    val w7 = Window.partitionBy("user_id").orderBy("day").rowsBetween(-6, 0)
    filled
      .withColumn("n_7d", sum(col("n_events")).over(w7))
      .orderBy("user_id", "day")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q104_user_day_gapfill" -> (userDayGapfill _),
    "q101_zone_map" -> (partitionZoneMap _),
    "q74_event_day_slice" -> (eventDaySlice _),
    "q27_event_windows" -> (eventWindows _),
    "q28_prop_stats" -> (propStats _),
    "q29_top_event_per_user" -> (topEventPerUser _),
    "q35_topk_per_key" -> (topKPerUser _),
    "q37_sessions" -> (sessions _),
    "q40_range_join" -> (rangeJoinClicks _),
    "q41_sliding_windows" -> (slidingWindows _),
    "q64_event_funnel" -> (funnel _),
    "q72_value_windows" -> (valueWindows _))

  val oracle: Map[String, String] = Map(
    // DuckDB types the DATE+INTERVAL series TIMESTAMP (Spark keeps
    // DATE); the explicit CAST in `days` aligns both engines
    "q104_user_day_gapfill" ->
      """WITH bounds AS (
        |  SELECT CAST(min(ts) AS DATE) AS d0, CAST(max(ts) AS DATE) AS d1 FROM events),
        |raw AS (
        |  SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS dts FROM bounds),
        |days AS (SELECT CAST(dts AS DATE) AS day FROM raw),
        |ud AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS n,
        |    CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sv
        |  FROM events GROUP BY 1, 2),
        |spine AS (
        |  SELECT u.user_id, d.day
        |  FROM (SELECT DISTINCT user_id FROM events) u CROSS JOIN days d),
        |filled AS (
        |  SELECT s.user_id, s.day, coalesce(ud.n, 0) AS n_events,
        |    coalesce(ud.sv, CAST(0 AS DOUBLE)) AS sum_value
        |  FROM spine s LEFT JOIN ud ON s.user_id = ud.user_id AND s.day = ud.day)
        |SELECT user_id, day, n_events, sum_value,
        |  CAST(sum(n_events) OVER (PARTITION BY user_id ORDER BY day
        |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_7d
        |FROM filled ORDER BY user_id, day""".stripMargin,
    "q101_zone_map" ->
      s"""WITH z AS (
         |  SELECT CAST(ts AS DATE) AS event_date, count(*) AS n_rows,
         |    min(ts) AS min_ts, max(ts) AS max_ts,
         |    min(value) AS min_value, max(value) AS max_value
         |  FROM events GROUP BY 1)
         |SELECT event_date, n_rows, min_ts, max_ts, min_value, max_value,
         |  event_date BETWEEN DATE '$ZoneLoDate' AND DATE '$ZoneHiDate' AS scanned
         |FROM z ORDER BY event_date""".stripMargin,
    // the oracle reads the raw (unpartitioned) fixture, so the partition
    // predicate is expressed as the equivalent date cast on ts — proving
    // the layout changes WHERE bytes live, never WHAT the query answers
    "q74_event_day_slice" ->
      s"""SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start, event_type,
         |  count(*) AS n_events,
         |  CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value,
         |  CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_value
         |FROM events
         |WHERE CAST(ts AS DATE) BETWEEN '$SliceFrom' AND '$SliceTo'
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q27_event_windows" ->
      """SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start, event_type,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value,
        |  CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q28_prop_stats" ->
      """WITH ext AS (
        |  SELECT event_type, user_id,
        |    CAST(NULLIF(regexp_extract(props, '"k":\s*(\d+)', 1), '') AS INT) AS k
        |  FROM events)
        |SELECT event_type, count(*) AS n, count(DISTINCT user_id) AS n_users,
        |  min(k) AS min_k, max(k) AS max_k,
        |  CAST(sum(k) AS DOUBLE) / count(k) AS avg_k
        |FROM ext GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q29_top_event_per_user" ->
      """WITH rk AS (
        |  SELECT *, row_number() OVER
        |    (PARTITION BY user_id ORDER BY value DESC, ts ASC, event_id ASC) AS rn
        |  FROM events)
        |SELECT user_id, event_id, event_type, value, ts
        |FROM rk WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "q35_topk_per_key" ->
      """WITH rk AS (
        |  SELECT user_id, event_id, event_type, value, row_number() OVER
        |    (PARTITION BY user_id ORDER BY value DESC, event_id ASC) AS rn
        |  FROM events)
        |SELECT user_id, event_id, event_type, value, CAST(rn AS INT) AS rank
        |FROM rk WHERE rn <= 3 ORDER BY user_id, rank""".stripMargin,
    // lag/cumulative-sum sessionization; strict > gap matches the
    // operator, each user's max sess_no (the open trailing session) is
    // dropped; sum_value rounds to 2 dp like the operator's close()
    "q37_sessions" ->
      """WITH ordered AS (
        |  SELECT user_id, ts, value, event_id,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events),
        |marked AS (
        |  SELECT *, CASE WHEN prev_ts IS NULL
        |    OR ts > prev_ts + INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
        |  FROM ordered),
        |numbered AS (
        |  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING) AS sess_no
        |  FROM marked),
        |sess AS (
        |  SELECT user_id, sess_no, min(ts) AS session_start, max(ts) AS session_end,
        |    CAST(count(*) AS INT) AS n_events, round(sum(value), 2) AS sum_value
        |  FROM numbered GROUP BY user_id, sess_no),
        |flagged AS (
        |  SELECT *, max(sess_no) OVER (PARTITION BY user_id) AS max_no FROM sess)
        |SELECT user_id, session_start, session_end, n_events, sum_value
        |FROM flagged WHERE sess_no < max_no
        |ORDER BY user_id, session_start""".stripMargin,
    // plain inequality join — correct (and fine at oracle scale) but the
    // quadratic plan the binned Spark operator exists to avoid
    "q40_range_join" ->
      """SELECT p.event_id, p.user_id, p.ts,
        |  count(c.ts) AS n_prior_clicks,
        |  max(c.value) AS max_click_value
        |FROM events p LEFT JOIN events c
        |  ON c.event_type = 'click' AND c.user_id = p.user_id
        |  AND c.ts >= p.ts - INTERVAL 10 MINUTE AND c.ts < p.ts
        |WHERE p.event_type = 'purchase'
        |GROUP BY p.event_id, p.user_id, p.ts
        |ORDER BY p.event_id""".stripMargin,
    "q72_value_windows" ->
      """SELECT user_id, event_id, ts, value,
        |  CAST(sum(CAST(value AS DECIMAL(12,2))) OVER
        |    (PARTITION BY user_id ORDER BY ts, event_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_total,
        |  CAST(sum(CAST(value AS DECIMAL(12,2))) OVER
        |    (PARTITION BY user_id ORDER BY ts, event_id
        |     ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS DOUBLE)
        |    / count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |     ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS mov_avg,
        |  CAST(ntile(4) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS INT) AS quartile,
        |  cume_dist() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS cum_dist
        |FROM events
        |ORDER BY user_id, ts, event_id""".stripMargin,
    // stage-per-CTE formulation — equivalent to the stacked windows:
    // each stage keeps only users that reached the previous one, with a
    // strict ts ordering between stages (µs-exact on both engines)
    "q64_event_funnel" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events),
        |v AS (SELECT user_id, min(ts) AS v_ts FROM events
        |      WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, min(e.ts) AS c_ts FROM events e
        |      JOIN v ON v.user_id = e.user_id
        |      WHERE e.event_type = 'click' AND e.ts > v.v_ts GROUP BY e.user_id),
        |p AS (SELECT e.user_id, min(e.ts) AS p_ts FROM events e
        |      JOIN c ON c.user_id = e.user_id
        |      WHERE e.event_type = 'purchase' AND e.ts > c.c_ts GROUP BY e.user_id),
        |j AS (SELECT u.user_id, v.v_ts, c.c_ts, p.p_ts FROM u
        |      LEFT JOIN v USING (user_id) LEFT JOIN c USING (user_id)
        |      LEFT JOIN p USING (user_id))
        |SELECT count(*) AS n_users, count(v_ts) AS n_view,
        |  count(c_ts) AS n_click, count(p_ts) AS n_purchase,
        |  round(CAST(count(c_ts) AS DOUBLE) / NULLIF(count(v_ts), 0), 9) AS view_to_click,
        |  round(CAST(count(p_ts) AS DOUBLE) / NULLIF(count(c_ts), 0), 9) AS click_to_purchase
        |FROM j""".stripMargin,
    // an event at 5-min bucket b belongs to exactly the two 10-min
    // windows starting at b and b − 5 min (epoch-aligned on both
    // engines, like tumbling q27)
    "q41_sliding_windows" ->
      """WITH x AS (
        |  SELECT time_bucket(INTERVAL '5 minutes', ts) AS ws, event_type, value
        |  FROM events
        |  UNION ALL
        |  SELECT time_bucket(INTERVAL '5 minutes', ts) - INTERVAL 5 MINUTE AS ws,
        |    event_type, value
        |  FROM events)
        |SELECT ws AS window_start, event_type, count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        |FROM x GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
}
