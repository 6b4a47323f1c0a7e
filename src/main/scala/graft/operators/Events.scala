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

  /** q207 — NATIVE session windows: Spark's built-in `session_window`
    * aggregation over the event stream, gated against the SQL-standard
    * island algorithm (lag → flag → running sum → group) in DuckDB —
    * the proof that the native operator's merge semantics equal the
    * portable SQL form. The q37 TRIO completes: custom
    * `flatMapGroupsWithState` sessionizer (q37, streaming semantics —
    * drops the still-open last session per user), the island-algorithm
    * SQL oracle, and now the built-in operator (batch semantics — ALL
    * sessions, `session_end = last event + gap`; touching windows MERGE,
    * so a new session starts only at ts strictly past prev + gap —
    * probe-verified, the same `>` rule as q37).
    *
    * Scale shape: `session_window` plans as one exchange on user_id +
    * a sort-merge of each user's events into windows — the same
    * single-shuffle cost as the window-function form, with the merge
    * done by the native operator instead of three window passes.
    */
  def nativeSessions(spark: SparkSession, dir: String): DataFrame =
    nativeSessionsFrom(Tables.events(spark, dir))

  def nativeSessionsFrom(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).cast("int").as("n_events"),
        round(sum(col("value")), 2).as("sum_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"), col("sum_value"))
      .orderBy("user_id", "session_start")

  /** Folds for the q210 out-of-fold protocol. */
  val OofFolds = 5

  /** q210 — OUT-OF-FOLD target encoding: the leakage-safe categorical
    * feature every tabular-ML pipeline builds — each (event_type, fold)
    * cell's encoding is the mean `value` of its type computed EXCLUDING
    * the fold's own rows (`(S_type − S_fold) / (N_type − N_fold)`), so
    * a row never sees its own target in its feature. Folds are the
    * deterministic `md5("fold|"+event_id) mod 5` (the q45 split
    * discipline applied to cross-validation); q102 keeps GROUPS from
    * leaking across splits, this keeps TARGETS from leaking into
    * features.
    *
    * Determinism: fold sums ride the exact DECIMAL(12,2) accumulator
    * (graft.functions.Det discipline — order-independent), the
    * out-of-fold difference is exact decimal subtraction, and the one
    * closing division is double, rounded 9 dp; NULLIF guards a fold
    * that holds the type's entire mass.
    *
    * Scale shape: one map-side-combined aggregate to the
    * (type × fold) grain — a model relation (|types|·5 rows) — then a
    * broadcast-sized self-rollup and join. One corpus pass.
    */
  def oofEncoding(spark: SparkSession, dir: String): DataFrame =
    oofEncodingFrom(Tables.events(spark, dir))

  def oofEncodingFrom(events: DataFrame): DataFrame = {
    import graft.functions.TextFns
    val fold = TextFns.hash32(
      concat(lit("fold|"), col("event_id").cast("string"))) % OofFolds
    val perFold = events
      .select(col("event_type"), fold.cast("int").as("fold"),
        col("value").cast(DecimalType(12, 2)).as("v"))
      .groupBy("event_type", "fold")
      .agg(count(lit(1)).as("n_fold"), sum("v").as("s_fold"))
    val perType = perFold.groupBy("event_type")
      .agg(sum("n_fold").as("n_type"), sum("s_fold").as("s_type"))
    val nOof = col("n_type") - col("n_fold")
    perFold.join(perType, Seq("event_type"))
      .select(col("event_type"), col("fold"), col("n_fold"), nOof.as("n_oof"),
        round((col("s_type") - col("s_fold")).cast("double") /
          when(nOof === 0L, lit(null).cast("long")).otherwise(nOof), 9)
          .as("oof_mean"))
      .orderBy("event_type", "fold")
  }

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

  /** q163 flag threshold: drift flags when the one-sided CUSUM exceeds
    * [[CusumH]] × the type's corpus total — with residuals scaled by
    * n_days that reads as "H mean-days of accumulated drift".
    */
  val CusumH = 2L

  /** q163 — CUSUM drift detection on daily event rates: the SEQUENTIAL
    * changepoint detector (Page 1954) that catches a slow feed drift
    * q116's per-point z-score cannot — each day's residual accumulates,
    * so a persistent small shift trips the alarm even when no single
    * day is anomalous. Per (event_type, day): the gap-filled daily
    * count, the one-sided up/down CUSUM statistics, and the drift
    * flags.
    *
    * Determinism — ALL-INTEGER, no rounding anywhere: the residual is
    * cross-multiplied (`n_days·c_i − total` instead of `c_i − mean`),
    * and the max(0, S+r) recurrence — not window-expressible as
    * written — is rewritten through the prefix identity
    * `S_i = cum_i − min(0, min_{j≤i} cum_j)` (and mirrored for the
    * down side), turning the sequential fold into cumulative-sum +
    * cumulative-extremum windows.
    *
    * Scale shape: ONE (type, day) count aggregate (map-side combined,
    * types×days rows out); the day spine is a 1-row bounds aggregate
    * exploded and broadcast (the q104 gap-fill move, so silent-feed
    * days read count 0 — exactly the days a drift detector must see);
    * all four windows share the one type-keyed exchange over the
    * model-sized grid. The oracle CASTs every window sum back to
    * BIGINT (the q111 lesson).
    */
  def cusumDrift(spark: SparkSession, dir: String): DataFrame =
    cusumDriftFrom(Tables.events(spark, dir))

  def cusumDriftFrom(events: DataFrame): DataFrame = {
    val byDay = events
      .select(col("event_type"), col("ts").cast("date").as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("n"))
    val days = events
      .agg(min(col("ts").cast("date")).as("d0"),
        max(col("ts").cast("date")).as("d1"))
      .select(
        explode(sequence(col("d0"), col("d1"), expr("interval 1 day")))
          .as("day"),
        (datediff(col("d1"), col("d0")) + 1).cast("long").as("n_days"))
    val spine = events.select("event_type").distinct()
      .crossJoin(broadcast(days))
    val filled = spine.join(byDay, Seq("event_type", "day"), "left")
      .select(col("event_type"), col("day"), col("n_days"),
        coalesce(col("n"), lit(0L)).as("n_events"))
    val tot = Window.partitionBy("event_type")
    val wc = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    filled
      .withColumn("type_total", sum("n_events").over(tot))
      .withColumn("r", col("n_days") * col("n_events") - col("type_total"))
      .withColumn("cum", sum("r").over(wc))
      .withColumn("cusum_up",
        col("cum") - least(min(col("cum")).over(wc), lit(0L)))
      .withColumn("cusum_dn",
        greatest(max(col("cum")).over(wc), lit(0L)) - col("cum"))
      .select(col("event_type"), col("day"), col("n_events"),
        col("type_total"), col("r"), col("cusum_up"), col("cusum_dn"),
        (col("cusum_up") > lit(CusumH) * col("type_total")).as("drift_up"),
        (col("cusum_dn") > lit(CusumH) * col("type_total")).as("drift_dn"))
      .orderBy("event_type", "day")
  }

  /** q107 cell geometry: [[ZUserCell]] users × one day per grid cell,
    * day index anchored at the FIXED [[ZEpoch]] (an operator dial like
    * [[ZoneLoDate]] — a data-derived anchor would make cell identity
    * depend on corpus bounds). Both cell coordinates are capped to
    * 8 bits, so the interleaved key fits 16 bits; a corpus outgrowing
    * 256 cells per dimension re-tunes the dials (coarser cells), it
    * does not overflow the key.
    */
  val ZUserCell = 8L
  val ZEpoch = "2024-01-01"
  val ZEpochUs = 1704067200000000L // unix_micros(2024-01-01 UTC)
  private val ZDayUs = 86400L * 1000000L

  /** q107 audit rectangle: the (user range × date range) query whose
    * scan/skip decision the cell map reports.
    */
  val ZQUserLo = 16L
  val ZQUserHi = 31L
  val ZQDateLo = "2024-01-10"
  val ZQDateHi = "2024-01-12"

  /** The oracle's spread twin: bit i extracted by integer div/mod and
    * re-placed at bit 2i by multiplication — pure arithmetic both
    * engines evaluate identically (no engine-specific bit operators in
    * the shared dialect).
    */
  private def spreadSql(x: String): String =
    (0 until 8).map(i => s"((($x) // ${1L << i}) % 2) * ${1L << (2 * i)}")
      .mkString("(", " + ", ")")

  /** q107 — Z-ORDER cell map: every event mapped to its Morton cell
    * over (user_id ÷ [[ZUserCell]], days since [[ZEpoch]]), one row per
    * cell with row count, per-dimension value bounds, and the scan/skip
    * decision for the [[ZQUserLo]]..[[ZQUserHi]] × [[ZQDateLo]]..
    * [[ZQDateHi]] rectangle query. This is q101's zone-map audit for a
    * MULTI-dimensional clustering: a date-partitioned layout prunes on
    * time only — a query also filtering users still scans every file of
    * the kept days — while z-clustered cells bound user_id AND ts
    * simultaneously, so the rectangle skips in both dimensions (the
    * `scanned` column is exactly the min/max-overlap test a reader
    * would run against file footer statistics).
    *
    * Scale shape: the cell key is pure map-side integer arithmetic; the
    * aggregate groups BY the cell key — the same alignment argument as
    * q101 (grouping matches the physical clustering, map-side partials
    * complete within a cell's files, reduce side is cell-cardinality).
    * [[graft.sources.ZOrdered]] materializes the layout this audit
    * describes (range-partitioned + sorted by the same key), spec-gated
    * for both-dimension file pruning.
    */
  def zOrderCellMap(spark: SparkSession, dir: String): DataFrame =
    zOrderCellMapFrom(Tables.events(spark, dir))

  def zOrderCellMapFrom(events: DataFrame): DataFrame = {
    events
      .select(col("user_id"), col("ts"),
        graft.sources.ZOrdered
          .zKeyFor(col("user_id"), col("ts"), ZUserCell, ZEpochUs).as("zkey"))
      .groupBy("zkey")
      .agg(count(lit(1)).as("n_rows"),
        min("user_id").as("min_user"), max("user_id").as("max_user"),
        min("ts").as("min_ts"), max("ts").as("max_ts"))
      .withColumn("scanned",
        col("min_user") <= ZQUserHi && col("max_user") >= ZQUserLo &&
          col("min_ts").cast("date") <= to_date(lit(ZQDateHi)) &&
          col("max_ts").cast("date") >= to_date(lit(ZQDateLo)))
      .orderBy("zkey")
  }

  /** q109 bin width for the interval self-join (minutes). Sessions
    * rarely exceed a few bins at the 30-min gap, so the explode factor
    * stays small; the dial trades bin-collision fan-in (wider bins)
    * against per-session row fan-out (narrower bins).
    */
  val OverlapBinMinutes = 60L
  val OverlapTopK = 100

  /** q109 — session co-activity: for every pair of users whose q37
    * sessions overlap in time, the number of overlapping session pairs
    * and the total overlap seconds — the interval SELF-join (who was
    * active together) behind co-browsing, fraud rings, and shared-load
    * attribution.
    *
    * Scale design: a naive `a.start < b.end AND b.start < a.end` self
    * join has no equi-key — a broadcast nested loop, quadratic in
    * sessions. Instead each session explodes to the [[OverlapBinMinutes]]
    * bins it spans, the join is a plain shuffled HASH join on the bin
    * with the exact overlap predicate as post-filter, and multi-bin
    * double-matches collapse in a DISTINCT on the pair identity
    * (user, start) — the q40 binning discipline extended to interval ×
    * interval. Comparisons scale with per-bin occupancy (co-active
    * sessions), never sessions²; every stage is a hash exchange on
    * bin or pair keys.
    */
  def sessionOverlap(spark: SparkSession, dir: String): DataFrame =
    sessionOverlapFrom(Tables.events(spark, dir))

  def sessionOverlapFrom(events: DataFrame): DataFrame = {
    val binUs = OverlapBinMinutes * 60L * 1000000L
    val sess = sessionsFrom(events)
      .select(col("user_id"),
        unix_micros(col("session_start")).as("st_us"),
        unix_micros(col("session_end")).as("en_us"))
    val binned = sess.withColumn("bin",
      explode(sequence(expr(s"st_us div ${binUs}L"), expr(s"en_us div ${binUs}L"))))
    val p = binned.alias("a")
      .join(binned.alias("b"),
        col("a.bin") === col("b.bin") &&
          col("a.user_id") < col("b.user_id") &&
          col("a.st_us") < col("b.en_us") && col("b.st_us") < col("a.en_us") &&
          // canonical-bin rule (r13, §2 shuffle-fewer-bytes): a pair of
          // sessions sharing k bins used to match k times and collapse
          // in a 6-column DISTINCT exchange; counting the match ONLY in
          // the bin holding the overlap start — greatest(a_st, b_st),
          // which both sessions provably span (st ≤ overlap-start ≤ en
          // on both sides for any overlapping pair) — yields each pair
          // exactly once and the DISTINCT (one full pair-relation
          // shuffle + two aggregates) disappears. Same pair set,
          // bit-identical aggregates.
          col("a.bin") === expr(s"greatest(a.st_us, b.st_us) div ${binUs}L"))
      .select(col("a.user_id").as("user_a"), col("b.user_id").as("user_b"),
        col("a.st_us").as("a_st"), col("a.en_us").as("a_en"),
        col("b.st_us").as("b_st"), col("b.en_us").as("b_en"))
    p.groupBy("user_a", "user_b")
      .agg(count(lit(1)).as("n_overlaps"),
        round((sum(least(col("a_en"), col("b_en")) -
          greatest(col("a_st"), col("b_st"))) / 1000000.0), 6)
          .as("overlap_sec"))
      .orderBy(desc("overlap_sec"), asc("user_a"), asc("user_b"))
      .limit(OverlapTopK)
  }

  /** q111 target rows per compaction output group. */
  val CompactTargetRows = 2000L

  /** q111 — compaction plan over the date-partitioned event layout:
    * bin the per-day partitions, in date order, into output groups of
    * ~[[CompactTargetRows]] rows via a running-total assignment
    * (`group = cum_rows_before div target`) — the planning step of the
    * small-file compaction every partitioned lake needs (a day of
    * trickle ingest leaves files far below the optimal scan size; the
    * plan says which partitions coalesce into which rewrite task).
    *
    * Scale shape: the only data-scale work is the per-day count, which
    * is q101's layout-aligned aggregate (map-side partials complete
    * within each day's files); the plan itself — running totals and
    * group assignment — runs over the day-cardinality inventory
    * relation, metadata-scale by construction (thousands of rows at a
    * century), so its single-partition windows are as harmless as the
    * driver-side prefix totals in q63. Groups are contiguous in date
    * order on purpose: compacted files keep their date zone-map
    * bounds tight (q101), and a group rewrite touches one date range.
    */
  def compactionPlan(spark: SparkSession, dir: String): DataFrame =
    compactionPlanFrom(graft.sources.Partitioned.eventsFor(spark, dir))

  def compactionPlanFrom(events: DataFrame): DataFrame = {
    val perDay = events.groupBy("event_date")
      .agg(count(lit(1)).as("n_rows"))
    val before = Window.orderBy("event_date")
      .rowsBetween(Window.unboundedPreceding, -1)
    val planned = perDay
      // integer `div` end-to-end (floor division, the oracle's `//`):
      // double-divide + cast("long") truncates toward zero, which agrees
      // only while the running total is non-negative — the integer-space
      // discipline used everywhere else applies here too
      .withColumn("cum_before", coalesce(sum("n_rows").over(before), lit(0L)))
      .withColumn("out_group", expr(s"cum_before div $CompactTargetRows"))
      .drop("cum_before")
    val byGroup = Window.partitionBy("out_group")
    planned
      .withColumn("group_rows", sum("n_rows").over(byGroup))
      .withColumn("group_days", count(lit(1)).over(byGroup))
      .orderBy("event_date")
  }

  /** q116 — SEASONAL-baseline volume anomalies: per (event_type, day)
    * event counts against that type's day-of-week mean, flagging days
    * off by ≥50% in either direction. Raw daily z-scores false-alarm on
    * weekly rhythm (every Sunday "drops" vs the weekday mean); the
    * day-of-week baseline is the minimal seasonal adjustment a feed
    * monitor needs (q73 screens VALUES robustly; this screens VOLUME
    * seasonally).
    *
    * Determinism: the flag comparison runs in scaled-INTEGER space
    * (`2·n·c ≷ {1,3}·s` with s, c the dow sum/count) — no float
    * accumulation anywhere; the reported mean is a single exact-int
    * division. Scale shape: one (type, day) hash aggregate at calendar
    * cardinality, then dow windows over that tiny relation.
    */
  def seasonalAnomaly(spark: SparkSession, dir: String): DataFrame =
    seasonalAnomalyFrom(Tables.events(spark, dir))

  def seasonalAnomalyFrom(events: DataFrame): DataFrame = {
    val daily = events
      .select(col("event_type"), col("ts").cast("date").as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("n_events"))
      .withColumn("dow", (dayofweek(col("day")) - 1).cast("int"))
    val byDow = Window.partitionBy("event_type", "dow")
    daily
      .withColumn("s", sum("n_events").over(byDow))
      .withColumn("c", count(lit(1)).over(byDow))
      .select(col("event_type"), col("day"), col("n_events"), col("dow"),
        round(col("s") / col("c"), 9).as("dow_mean"),
        (col("n_events") * col("c") * 2 > col("s") * 3 ||
          col("n_events") * col("c") * 2 < col("s")).as("is_anomaly"))
      .orderBy("event_type", "day")
  }

  /** q117 path geometry: up to [[PathLen]] preceding events per
    * conversion, top [[PathTopK]] paths reported.
    */
  val PathLen = 3
  val PathTopK = 20

  /** q117 — CONVERSION-path mining: for every purchase, the sequence of
    * up to [[PathLen]] events the same user took immediately before it,
    * counted per distinct path — the "what led here" primitive behind
    * attribution audits and funnel design (q64 measures a FIXED funnel;
    * this discovers the paths that actually occur).
    *
    * Scale shape: one user-keyed window (shared exchange + sort serves
    * all three lags — the q72 argument), then a path-cardinality hash
    * aggregate with map-side combine and a TakeOrderedAndProject top-k.
    * The lag total order (ts, event_id) makes every path deterministic.
    */
  def conversionPaths(spark: SparkSession, dir: String): DataFrame =
    conversionPathsFrom(Tables.events(spark, dir))

  def conversionPathsFrom(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(asc("ts"), asc("event_id"))
    val lags = (1 to PathLen).map(i => lag(col("event_type"), i).over(w))
    events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("path", concat_ws(">", lags.reverse: _*))
      .filter(col("event_type") === "purchase")
      .groupBy("path").agg(count(lit(1)).as("n_purchases"))
      .orderBy(desc("n_purchases"), asc("path"))
      .limit(PathTopK)
  }

  /** q125 — SLIDING-window distinct users (7-day, per type): the
    * distinct-count class q41's sliding counts cannot answer by frame
    * arithmetic — distincts don't sum across days, so each day's
    * DAY-DISTINCT (type, user) relation is fanned out to the 7 windows
    * it belongs to and re-distinct-counted per window. Day-distinct
    * FIRST is the load-bearing order: the 7× fan-out multiplies the
    * per-day distinct relation (bounded by users × types × days), not
    * the raw event stream. At 100 TB the same structure carries
    * mergeable sketches instead (per-day HLL/KMV partials unioned
    * across the window — q39/q44's machinery); the exact form here IS
    * the oracle gate for that rewrite.
    */
  def slidingDistinct(spark: SparkSession, dir: String): DataFrame =
    slidingDistinctFrom(Tables.events(spark, dir))

  def slidingDistinctFrom(events: DataFrame): DataFrame = {
    val dd = events
      .select(col("event_type"), col("user_id"), col("ts").cast("date").as("day"))
      .distinct()
    dd.withColumn("win_end",
        explode(sequence(col("day"), date_add(col("day"), 6),
          expr("interval 1 day"))))
      .groupBy("event_type", "win_end")
      .agg(countDistinct("user_id").as("n_users_7d"))
      .orderBy("event_type", "win_end")
  }

  /** q151 sketch size for the sliding-window rollup (the q138 choice:
    * the per-day partial relation is stored per (type, day), so k stays
    * small).
    */
  val SwK = 128

  /** q151 — SLIDING-window distinct via MERGEABLE KMV partials: the
    * approximate rewrite [[slidingDistinct]]'s docstring promises for
    * 100 TB, made a first-class gated operator. Per-day KMV k-minima
    * (the q138 partial) fan out to the 7 windows each day serves — the
    * q125 fan-out applied to PARTIAL rows, not the day-distinct user
    * relation — and each window merges its days' partials by taking the
    * k smallest of the union. The merge is EXACT (an element among a
    * window's k smallest hashes is among its own day's k smallest —
    * the q138 identity), so the windowed estimate is bit-identical to
    * sketching the window's raw hashes directly; the exact windowed
    * distinct rides alongside as the error gauge (the q121/q138
    * discipline).
    *
    * Scale shape: the only corpus-scale work is the ONE distinct over
    * (type, day, h) that q125 also pays; the daily rank, 7× fan-out,
    * and merge rank all touch partial rows only — days × types × k,
    * model-scale. At 100 TB the daily partials are the stored ingest
    * artifact and any window answers from partials without rescanning
    * raws; the exact gauge column is the one piece a production rollup
    * would drop.
    */
  def slidingSketch(spark: SparkSession, dir: String): DataFrame =
    slidingSketchFrom(Tables.events(spark, dir))

  def slidingSketchFrom(events: DataFrame): DataFrame = {
    val h = graft.functions.TextFns.hash60(
      concat(lit("sw|"), col("user_id").cast("string")))
    val dd = events
      .select(col("event_type"), col("ts").cast("date").as("day"), h.as("h"))
      .distinct()
    val win7 = explode(sequence(col("day"), date_add(col("day"), 6),
      expr("interval 1 day"))).as("win_end")
    val daily = dd.withColumn("rn", row_number().over(
        Window.partitionBy("event_type", "day").orderBy("h")))
      .filter(col("rn") <= SwK)
      .select(col("event_type"), col("day"), col("h"))
    val merged = daily.select(col("event_type"), win7, col("h"))
      .distinct() // one user can be a k-min on several days of a window
      .withColumn("rn", row_number().over(
        Window.partitionBy("event_type", "win_end").orderBy("h")))
      .filter(col("rn") <= SwK)
    val sk = merged.groupBy("event_type", "win_end")
      .agg(count(lit(1)).as("n_k"), max("h").as("kth_min"))
    val exact = dd.select(col("event_type"), win7, col("h"))
      .groupBy("event_type", "win_end")
      .agg(countDistinct("h").as("n_exact_7d"))
    sk.join(exact, Seq("event_type", "win_end"))
      .select(col("event_type"), col("win_end"), col("n_exact_7d"),
        col("n_k"), col("kth_min"),
        graft.functions.TextFns.kmvEstimate(col("n_k"), col("kth_min"), SwK)
          .as("est_7d"))
      .orderBy("event_type", "win_end")
  }

  /** q127 masking rate: 1 in [[ImputeMod]] events (hash-picked by
    * event_id — the q45 stability discipline) plays the lost-in-transit
    * value.
    */
  val ImputeMod = 10

  /** q127 — IMPUTATION quality audit: mask a deterministic holdout of
    * `value`s, impute each from its type's median over the SURVIVING
    * rows, and measure the mean absolute error against the held-out
    * truth — the repair-with-error-gauge shape (q121/q126 discipline)
    * for the null-filling step every feature pipeline runs before
    * models that can't take NULLs. The audit answers "is median-fill
    * good enough for THIS column" with a gated number instead of a
    * guess.
    *
    * Determinism: deviations are summed in half-cent INTEGER space
    * (`|round(200·v) − round(200·med)|` — 200·median of 2-decimal
    * values is integral by construction), so no float accumulation;
    * the MAE is one final division. Scale shape: one per-type
    * percentile aggregate over survivors (sketchable), one conditional
    * aggregate over the masked rows; no shuffle beyond the two
    * type-keyed aggregates.
    */
  def imputeAudit(spark: SparkSession, dir: String): DataFrame =
    imputeAuditFrom(Tables.events(spark, dir))

  def imputeAuditFrom(events: DataFrame): DataFrame = {
    val masked = graft.functions.TextFns.hash32(
      concat(lit("imp|"), col("event_id").cast("string"))) % ImputeMod === 0
    val e = events.select(col("event_type"), col("value"), masked.as("m"))
    val med = e.filter(!col("m")).groupBy("event_type")
      .agg(percentile(col("value"), lit(0.5)).as("fill_value"))
    e.join(broadcast(med), Seq("event_type"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(when(col("m"), 1L).otherwise(0L)).as("n_masked"),
        min(col("fill_value")).as("fill_value"),
        (sum(when(col("m"),
          abs(round(col("value") * 200).cast("long") -
            round(col("fill_value") * 200).cast("long")))) / 200.0 /
          sum(when(col("m"), 1L).otherwise(0L)).cast("double")).as("mae"))
      .orderBy("event_type")
  }

  /** q181 thresholds: a user is automation-suspect on the cadence leg
    * when they have ≥ [[BotMinEvents]] events and a median inter-event
    * gap ≤ [[BotMedGapUs]] µs, and on the burst leg when any single
    * hour holds ≥ [[BotBurstPerHour]] of their events.
    */
  val BotMinEvents = 10L
  val BotMedGapUs = 20000000000L // 2e10 µs ≈ 5.6 h
  val BotBurstPerHour = 4L

  /** q181 — BOT/AUTOMATION audit: segments users by behavioral cadence
    * — a median inter-event gap too fast to be human and/or a burst
    * hour too dense — and reports each segment's user count, event
    * count, and event share. This is the traffic-hygiene cut a
    * training pipeline applies to interaction logs before using them
    * as supervision (automated traffic poisons popularity, co-occurrence
    * and recommender evals like q177). The median is exact mid-rank
    * integer math: med2 = the SUM of the two middle gaps (2× the
    * middle for odd counts), compared against 2× the threshold, so no
    * float ever enters the verdict; the event share is one exact-int
    * double division.
    *
    * Scale shape: one shuffle on user_id for the gap/rank windows
    * (per-user partitions), the burst leg a (user, hour) count with
    * map-side combine, verdict rollup is segments-sized. No global
    * windows, no driver state.
    */
  def botAudit(spark: SparkSession, dir: String): DataFrame =
    botAuditFrom(Tables.events(spark, dir))

  def botAuditFrom(events: DataFrame): DataFrame = {
    val e = events.select(col("user_id"), col("ts"), col("event_id"),
      unix_micros(col("ts")).as("tus"))
    val wOrd = Window.partitionBy("user_id").orderBy("tus", "event_id")
    // event_id tie-break keeps rn deterministic; equal gap VALUES make
    // the mid-rank picks order-insensitive anyway
    val wGap = Window.partitionBy("user_id").orderBy("gap", "event_id")
    val half = (c: Column) => call_function("div", c, lit(2L))
    val med = e
      .withColumn("gap", col("tus") - lag("tus", 1).over(wOrd))
      .filter(col("gap").isNotNull)
      .withColumn("rn", row_number().over(wGap))
      .withColumn("k", count(lit(1)).over(Window.partitionBy("user_id")))
      .groupBy("user_id")
      .agg((sum(when(col("rn") === half(col("k") + 1), col("gap"))
          .otherwise(0L)) +
        sum(when(col("rn") === half(col("k") + 2), col("gap"))
          .otherwise(0L))).as("med2"))
    val burst = e
      .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("c"))
      .groupBy("user_id").agg(max("c").as("max_hour"))
    val users = e.groupBy("user_id").agg(count(lit(1)).as("n"))
      .join(med, Seq("user_id"), "left")
      .join(burst, Seq("user_id"))
    val fast = col("n") >= BotMinEvents &&
      coalesce(col("med2") <= 2L * BotMedGapUs, lit(false))
    val bursty = col("max_hour") >= BotBurstPerHour
    val verdict = when(fast && bursty, "fast_median+burst")
      .when(fast, "fast_median").when(bursty, "burst").otherwise("human")
    val tot = e.agg(count(lit(1)).as("total"))
    users.select(verdict.as("verdict"), col("n"))
      .groupBy("verdict")
      .agg(count(lit(1)).as("n_users"), sum("n").as("n_events"))
      .crossJoin(broadcast(tot))
      .select(col("verdict"), col("n_users"), col("n_events"),
        (col("n_events").cast("double") / col("total")).as("event_share"))
      .orderBy("verdict")
  }

  /** q174 lateness exceedance thresholds (seconds, ascending). */
  val DisorderBucketsSec = Seq(1L, 60L, 600L)

  /** q174 — EVENT-TIME DISORDER audit (watermark sizing): per event
    * type, how far events arrive out of event-time order within their
    * user's arrival sequence (`event_id` is the ingest sequence; the
    * per-key running max of event time is exactly the state a
    * per-partition watermark tracks). Reports the disorder rate, the
    * exceedance count at each candidate watermark delay (1 s / 60 s /
    * 600 s — the rows a `withWatermark` of that delay would DROP), and
    * the max observed delay. This is the measurement that turns the
    * streaming drains' watermark constants (q49/q50/q86/q93) from
    * guesses into a sized dial — the standard pre-deploy audit for any
    * event-time pipeline.
    *
    * Scale shape: ONE shuffle on user_id for the running-max window
    * (per-user partitions, no global ordering anywhere), then one
    * event-type aggregate with map-side combine; all features integer
    * microseconds until the closing rate division.
    */
  def eventDisorder(spark: SparkSession, dir: String): DataFrame =
    eventDisorderFrom(Tables.events(spark, dir))

  def eventDisorderFrom(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val delay = greatest(lit(0L),
      coalesce(max(col("tus")).over(w), col("tus")) - col("tus"))
    val d = events
      .select(col("event_type"), col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("tus"))
      .withColumn("delay_us", delay)
    val aggs = Seq(
      count(lit(1)).as("n_events"),
      sum(when(col("delay_us") > 0L, 1L).otherwise(0L)).as("n_disordered")) ++
      DisorderBucketsSec.map(s =>
        sum(when(col("delay_us") > s * 1000000L, 1L).otherwise(0L))
          .as(s"n_late_${s}s")) :+
      max("delay_us").as("max_delay_us")
    d.groupBy("event_type")
      .agg(aggs.head, aggs.tail: _*)
      .select(col("event_type"), col("n_events"), col("n_disordered"),
        col("n_late_1s"), col("n_late_60s"), col("n_late_600s"),
        col("max_delay_us"),
        round(col("n_disordered").cast("double") / col("n_events"), 9)
          .as("disorder_rate"))
      .orderBy("event_type")
  }

  /** HLL register count for q201 (m = 2^6; registers hold leading-zero
    * ranks of the 54 bits left after bucketing the 60-bit hash, so a
    * register value is 1..55 and an EMPTY register is rank 0).
    */
  val HllM = 64

  /** Numerator of the raw HLL estimate `α·m² / Σ 2^-reg`, pre-scaled by
    * 2^55 so the register sum stays an exact BIGINT (see [[hllDistinct]]):
    * `α₆₄ · m² · 2^55` with α₆₄ = 0.7213/(1 + 1.079/m) — the standard
    * bias constant. Computed ONCE here and interpolated verbatim into
    * the oracle text, so both engines divide the identical double.
    */
  val HllNum: Double = 0.7213 / (1.0 + 1.079 / HllM) * (HllM.toDouble * HllM) *
    36028797018963968.0 // 2^55

  /** q201 — HyperLogLog distinct-user sketch per event type, plus the
    * register-MERGED `ALL` row: the mergeable-sketch contract that makes
    * HLL the 100 TB distinct-count operator (per-partition registers
    * combine by element-wise max — the `ALL` row is computed by MERGING
    * the per-type registers, never by re-scanning events). KMV (q39)
    * estimates from the k smallest hashes; HLL from leading-zero ranks
    * in 2^6 = [[HllM]] registers — the two classic sketch families, both
    * deterministic here via the md5-60bit hash so the DuckDB oracle
    * reproduces every register exactly.
    *
    * Determinism discipline: the register sum is Σ 2^(55−reg), an EXACT
    * integer (≤ 64·2^55 < 2^62) — never a float sum whose partial order
    * could wobble the low bits. The raw estimate is ONE division of the
    * shared [[HllNum]] literal by that integer; the small-range
    * correction (E ≤ 2.5m with empty registers) is linear counting
    * `m·ln(m/V)` — `ln` is libm territory, absorbed by round 6 (the
    * q55/q57 discipline). `rel_err` divides the ALREADY-ROUNDED estimate
    * so both engines subtract identical canonical values.
    *
    * Scale shape: one pass over events (map-side rho), ONE aggregate to
    * (type, bucket) registers — reduce side bounded by |types|·m, a
    * model constant — then a register-grain merge for `ALL` and a
    * |types|-bounded rollup. Nothing keyed by user ever crosses the
    * wire; at 100 TB the shuffle carries ≤ |types|·m·partitions rows.
    */
  def hllDistinct(spark: SparkSession, dir: String): DataFrame =
    hllDistinctFrom(Tables.events(spark, dir))

  def hllDistinctFrom(events: DataFrame): DataFrame = {
    import graft.functions.TextFns
    val h = TextFns.hash60(concat(lit("hll|"), col("user_id").cast("string")))
    val w = shiftright(col("h"), 6)
    val rho = when(w === 0L, lit(55)).otherwise(lit(55) - length(bin(w)))
    val reg = events
      .select(col("event_type"), h.as("h"))
      .select(col("event_type"), col("h").bitwiseAND(lit(63L)).as("bucket"),
        rho.as("rho"))
      .groupBy("event_type", "bucket").agg(max("rho").as("reg"))
      .localCheckpoint() // registers feed both the per-type and ALL rows
    hllReport(reg, hllExactOf(events))
  }

  /** Exact per-type distinct users + the `ALL` audit row (the q201/q211
    * error gauge).
    */
  private[graft] def hllExactOf(events: DataFrame): DataFrame =
    events.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n_exact"))
      .unionByName(events.agg(countDistinct(col("user_id")).as("n_exact"))
        .select(lit("ALL").as("event_type"), col("n_exact")))

  /** The HLL estimator over a PRESENT-register relation
    * `(event_type, bucket, reg)` (reg ≥ 1; empty registers are absent
    * rows): merges the register-wise `ALL` row, forms the exact-integer
    * register sum, applies the raw/linear-counting estimate, and joins
    * the exact audit counts. Shared by the batch (q201) and drained
    * streaming (q211) forms — the merge identity is the point.
    */
  private[graft] def hllReport(reg: DataFrame, exact: DataFrame): DataFrame = {
    val merged = reg.groupBy("bucket").agg(max("reg").as("reg"))
      .select(lit("ALL").as("event_type"), col("bucket"), col("reg"))
    val s = reg.unionByName(merged)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_regs"),
        (sum(expr("shiftleft(1L, CAST(55 - reg AS INT))")) +
          (lit(HllM.toLong) - count(lit(1))) * lit(36028797018963968L))
          .as("s_int"))
    val eRaw = lit(HllNum) / col("s_int")
    val nZero = lit(HllM.toLong) - col("n_regs")
    val estU = when(eRaw <= 2.5 * HllM && nZero > 0L,
      lit(HllM.toDouble) * log(lit(HllM.toDouble) / nZero)).otherwise(eRaw)
    s.join(exact, Seq("event_type"))
      .select(col("event_type"), col("n_exact"), col("n_regs"),
        nZero.as("n_zero_regs"), round(estU, 6).as("est_hll"))
      .withColumn("rel_err",
        round((col("est_hll") - col("n_exact")) / col("n_exact"), 6))
      .orderBy("event_type")
  }

  /** q247 routing/policy dim: (dotted net, prefix len, label) — nested
    * prefixes (quad → /8 → /11 → /18) so longest-prefix-match genuinely
    * resolves overlaps; (len, key) pairs unique by construction, so
    * no LPM ties exist. A catch-all /0 guarantees every address
    * classifies. Shared constant: the Spark literal dim and the oracle
    * VALUES rows are both generated from this Seq.
    */
  val CidrDim: Seq[(String, Int, String)] = Seq(
    ("0.0.0.0", 0, "default"),
    ("0.0.0.0", 2, "quad-0"),
    ("64.0.0.0", 2, "quad-1"),
    ("128.0.0.0", 2, "quad-2"),
    ("192.0.0.0", 2, "quad-3"),
    ("224.0.0.0", 4, "multicast"),
    ("10.0.0.0", 8, "private-a"),
    ("10.32.0.0", 11, "dc-east"),
    ("10.32.64.0", 18, "dc-east-pods"),
    ("100.64.0.0", 10, "cgnat"),
    ("172.16.0.0", 12, "private-b"),
    ("192.168.0.0", 16, "private-c"),
    ("192.168.128.0", 17, "office"),
    ("203.0.113.0", 24, "blocklist"))

  private def ipv4Long(dotted: String): Long =
    dotted.split('.').foldLeft(0L)((acc, o) => (acc << 8) | o.toLong)

  /** q247 — CIDR longest-prefix-match enrichment: classify each event's
    * (synthetic, hash-derived) client IPv4 against a routing/policy
    * table with NESTED prefixes and roll up traffic per winning policy
    * — the geo/ASN/policy-enrichment join every web/event pipeline runs
    * at ingest, and a join class Spark has no native operator for
    * (equality can't express "longest matching prefix").
    *
    * The join: a prefix table keys candidates by (len, net >> (32−len)).
    * The probe side expands each address once per DISTINCT prefix
    * length in the table (≤33, collected from the dim's metadata — a
    * routing table has few distinct lengths even at 1M routes), meets
    * the dim in a broadcast hash EQUI-join on (len, shifted key) —
    * never a range or nested-loop join — and LPM resolves as
    * max(struct(len, label)): all integer, tie-free because (len, key)
    * is unique in the dim.
    *
    * Scale shape: candidates ≈ matched-lengths × events arise map-side
    * (the explode and the broadcast join never shuffle); the per-event
    * argmax partially aggregates MAP-SIDE (each event's candidates are
    * co-located by construction — one map task emits one row per
    * event), so the only full-width exchange carries the winner grain,
    * and the final rollup is label-cardinality. At 1000 executors the
    * dim broadcasts once per executor, the corpus streams.
    */
  def lpmEnrich(spark: SparkSession, dir: String): DataFrame =
    lpmEnrichFrom(Tables.events(spark, dir))

  def lpmEnrichFrom(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val dim = CidrDim.map { case (net, len, label) =>
      (len, ipv4Long(net) >>> (32 - len), label)
    }.toDF("len", "net_key", "label")
    val lens = CidrDim.map(_._2).distinct.sorted
    val probe = events
      .select(col("event_id"), col("event_type"), col("user_id"),
        round(col("value") * 100).cast("long").as("cents"),
        graft.functions.TextFns.hash32(
          concat(lit("ip|"), col("event_id").cast("string"))).as("ip"))
      .withColumn("len", explode(array(lens.map(lit(_)): _*)))
      .withColumn("key", expr("shiftright(ip, 32 - len)"))
    val best = probe
      .join(broadcast(dim),
        probe("len") === dim("len") && col("key") === col("net_key"))
      .groupBy(probe("event_id"), col("event_type"), col("user_id"),
        col("cents"))
      .agg(max(struct(dim("len"), col("label"))).as("m"))
    best
      .select(col("event_type"), col("user_id"), col("cents"),
        col("m.len").as("prefix_len"), col("m.label").as("policy"))
      .groupBy("policy", "prefix_len")
      .agg(count(lit(1)).as("n_events"),
        countDistinct("user_id").as("n_users"),
        sum("cents").as("cents"))
      .orderBy(desc("prefix_len"), asc("policy"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q247_lpm_enrich" -> (lpmEnrich _),
    "q201_hll_distinct" -> (hllDistinct _),
    "q207_native_sessions" -> (nativeSessions _),
    "q210_oof_encoding" -> (oofEncoding _),
    "q174_event_disorder" -> (eventDisorder _),
    "q181_bot_audit" -> (botAudit _),
    "q127_impute_audit" -> (imputeAudit _),
    "q125_sliding_distinct" -> (slidingDistinct _),
    "q151_sliding_sketch" -> (slidingSketch _),
    "q116_seasonal_anomaly" -> (seasonalAnomaly _),
    "q117_conversion_paths" -> (conversionPaths _),
    "q107_zorder_cells" -> (zOrderCellMap _),
    "q109_session_overlap" -> (sessionOverlap _),
    "q111_compaction_plan" -> (compactionPlan _),
    "q104_user_day_gapfill" -> (userDayGapfill _),
    "q163_cusum_drift" -> (cusumDrift _),
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
    // the dim VALUES rows carry the same precomputed (len, shifted
    // net key) integers the Spark literal dim does; LPM = rank by len
    // DESC (tie-free: (len, key) unique in the dim)
    "q247_lpm_enrich" -> {
      val dimRows = CidrDim.map { case (net, len, label) =>
        s"(${ipv4Long(net) >>> (32 - len)}, $len, '$label')"
      }.mkString(",\n|    ")
      s"""WITH dim(net_key, len, label) AS (VALUES
         |    $dimRows),
         |ev AS (SELECT event_id, event_type, user_id,
         |    CAST(round(value * 100) AS BIGINT) AS cents,
         |    CAST(${graft.functions.TextFns.sql.hash32(
               "'ip|' || CAST(event_id AS VARCHAR)")} AS BIGINT) AS ip
         |  FROM events),
         |cand AS (SELECT ev.*, d.len, d.label
         |  FROM ev JOIN dim d ON (ev.ip >> (32 - d.len)) = d.net_key),
         |best AS (SELECT *, row_number() OVER
         |    (PARTITION BY event_id ORDER BY len DESC) AS rn FROM cand)
         |SELECT label AS policy, len AS prefix_len,
         |  count(*) AS n_events,
         |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
         |  CAST(sum(cents) AS BIGINT) AS cents
         |FROM best WHERE rn = 1
         |GROUP BY 1, 2 ORDER BY prefix_len DESC, policy""".stripMargin
    },
    // DuckDB rebuilds every HLL register exactly (same md5-60bit hash,
    // same bucket/rank split), merges the ALL row register-wise, and
    // divides the identical HllNum literal by the same exact integer
    // register sum; linear counting's ln is absorbed by round 6 and
    // rel_err divides the already-rounded estimate (see hllDistinct).
    "q201_hll_distinct" ->
      s"""WITH h AS (SELECT event_type,
         |    ${graft.functions.TextFns.sql.hash60("'hll|' || CAST(user_id AS VARCHAR)")} AS h
         |  FROM events),
         |r AS (SELECT event_type, h % 64 AS bucket,
         |    CASE WHEN h // 64 = 0 THEN 55
         |         ELSE 55 - length(bin(h // 64)) END AS rho
         |  FROM h),
         |reg AS (SELECT event_type, bucket, max(rho) AS reg FROM r GROUP BY 1, 2),
         |mrg AS (SELECT 'ALL' AS event_type, bucket, max(reg) AS reg
         |  FROM reg GROUP BY 2),
         |allreg AS (SELECT * FROM reg UNION ALL SELECT * FROM mrg),
         |s AS (SELECT event_type, count(*) AS n_regs,
         |    CAST(sum(CAST(1 AS BIGINT) << (55 - reg)) AS BIGINT)
         |      + ($HllM - count(*)) * 36028797018963968 AS s_int
         |  FROM allreg GROUP BY 1),
         |ex AS (SELECT event_type, count(DISTINCT user_id) AS n_exact
         |    FROM events GROUP BY 1
         |  UNION ALL
         |  SELECT 'ALL', count(DISTINCT user_id) FROM events),
         |est AS (SELECT s.event_type, ex.n_exact, s.n_regs,
         |    $HllM - s.n_regs AS n_zero_regs,
         |    round(CASE WHEN $HllNum / s_int <= ${2.5 * HllM}
         |            AND $HllM - s.n_regs > 0
         |          THEN $HllM * ln(${HllM.toDouble} / ($HllM - s.n_regs))
         |          ELSE $HllNum / s_int END, 6) AS est_hll
         |  FROM s JOIN ex ON ex.event_type = s.event_type)
         |SELECT event_type, n_exact, CAST(n_regs AS BIGINT) AS n_regs,
         |  CAST(n_zero_regs AS BIGINT) AS n_zero_regs, est_hll,
         |  round((est_hll - n_exact) / n_exact, 6) AS rel_err
         |FROM est ORDER BY event_type""".stripMargin,
    // same per-user running-max window keyed on the event_id ingest
    // sequence; all-integer microsecond features, one closing division
    // exact mid-rank med2 (sum of the two middle gaps), integer verdict
    // legs, one exact-int division for the share
    "q181_bot_audit" ->
      s"""WITH e AS (SELECT user_id, ts, event_id, epoch_us(ts) AS tus
         |  FROM events),
         |g AS (SELECT user_id, event_id,
         |    tus - lag(tus) OVER (PARTITION BY user_id
         |      ORDER BY tus, event_id) AS gap
         |  FROM e),
         |r AS (SELECT user_id, gap,
         |    row_number() OVER (PARTITION BY user_id
         |      ORDER BY gap, event_id) AS rn,
         |    count(*) OVER (PARTITION BY user_id) AS k
         |  FROM g WHERE gap IS NOT NULL),
         |med AS (SELECT user_id,
         |    CAST(sum(CASE WHEN rn = (k + 1) // 2 THEN gap ELSE 0 END)
         |      + sum(CASE WHEN rn = (k + 2) // 2 THEN gap ELSE 0 END)
         |      AS BIGINT) AS med2
         |  FROM r GROUP BY 1),
         |b AS (SELECT user_id, date_trunc('hour', ts) AS h, count(*) AS c
         |  FROM e GROUP BY 1, 2),
         |mx AS (SELECT user_id, max(c) AS max_hour FROM b GROUP BY 1),
         |u AS (SELECT n.user_id, n.n, med.med2, mx.max_hour
         |  FROM (SELECT user_id, count(*) AS n FROM e GROUP BY 1) n
         |  LEFT JOIN med ON med.user_id = n.user_id
         |  JOIN mx ON mx.user_id = n.user_id),
         |v AS (SELECT
         |    CASE
         |      WHEN n >= $BotMinEvents
         |        AND coalesce(med2 <= ${2L * BotMedGapUs}, false)
         |        AND max_hour >= $BotBurstPerHour THEN 'fast_median+burst'
         |      WHEN n >= $BotMinEvents
         |        AND coalesce(med2 <= ${2L * BotMedGapUs}, false)
         |        THEN 'fast_median'
         |      WHEN max_hour >= $BotBurstPerHour THEN 'burst'
         |      ELSE 'human' END AS verdict, n
         |  FROM u),
         |tot AS (SELECT count(*) AS total FROM e)
         |SELECT verdict, count(*) AS n_users,
         |  CAST(sum(n) AS BIGINT) AS n_events,
         |  CAST(sum(n) AS DOUBLE) / max(total) AS event_share
         |FROM v CROSS JOIN tot GROUP BY 1 ORDER BY 1""".stripMargin,
    "q174_event_disorder" ->
      s"""WITH e AS (SELECT event_type, user_id, event_id,
         |    epoch_us(ts) AS tus FROM events),
         |d AS (SELECT event_type,
         |    greatest(0, coalesce(max(tus) OVER (PARTITION BY user_id
         |      ORDER BY event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), tus)
         |      - tus) AS delay_us
         |  FROM e)
         |SELECT event_type, count(*) AS n_events,
         |  CAST(sum(CASE WHEN delay_us > 0 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_disordered,
         |${DisorderBucketsSec.map(s =>
             s"""  CAST(sum(CASE WHEN delay_us > ${s * 1000000L} THEN 1
                |    ELSE 0 END) AS BIGINT) AS n_late_${s}s,""".stripMargin)
             .mkString("\n")}
         |  CAST(max(delay_us) AS BIGINT) AS max_delay_us,
         |  round(CAST(sum(CASE WHEN delay_us > 0 THEN 1 ELSE 0 END)
         |    AS DOUBLE) / count(*), 9) AS disorder_rate
         |FROM d GROUP BY 1 ORDER BY 1""".stripMargin,
    // deviations summed in half-cent integers; MAE = one final division
    "q127_impute_audit" ->
      s"""WITH e AS (
         |  SELECT event_type, value,
         |    ${graft.functions.TextFns.sql.hash32("'imp|' || CAST(event_id AS VARCHAR)")}
         |      % $ImputeMod = 0 AS m
         |  FROM events),
         |med AS (
         |  SELECT event_type, quantile_cont(value, 0.5) AS fill_value
         |  FROM e WHERE NOT m GROUP BY 1)
         |SELECT e.event_type, count(*) AS n,
         |  CAST(sum(CASE WHEN m THEN 1 ELSE 0 END) AS BIGINT) AS n_masked,
         |  min(fill_value) AS fill_value,
         |  CAST(sum(CASE WHEN m THEN abs(CAST(round(value * 200) AS BIGINT)
         |      - CAST(round(fill_value * 200) AS BIGINT)) END) AS DOUBLE)
         |    / 200.0 / CAST(sum(CASE WHEN m THEN 1 ELSE 0 END) AS DOUBLE) AS mae
         |FROM e JOIN med USING (event_type)
         |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin,
    "q125_sliding_distinct" ->
      """WITH dd AS (
        |  SELECT DISTINCT event_type, user_id, CAST(ts AS DATE) AS day FROM events),
        |ex0 AS (
        |  SELECT event_type, user_id,
        |    unnest(generate_series(day, day + INTERVAL 6 DAY, INTERVAL 1 DAY)) AS wts
        |  FROM dd),
        |ex AS (SELECT event_type, user_id, CAST(wts AS DATE) AS win_end FROM ex0)
        |SELECT event_type, win_end, count(DISTINCT user_id) AS n_users_7d
        |FROM ex GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // per-day k-minima fan to their 7 windows; the window merge takes
    // the k smallest of the union (exact — the q138 merge identity);
    // counts stay BIGINT (no sum, so no HUGEINT widening)
    "q151_sliding_sketch" ->
      s"""WITH dd AS (
         |  SELECT DISTINCT event_type, CAST(ts AS DATE) AS day,
         |    ${graft.functions.TextFns.sql.hash60("'sw|' || CAST(user_id AS VARCHAR)")} AS h
         |  FROM events),
         |daily AS (
         |  SELECT event_type, day, h FROM (
         |    SELECT *, row_number() OVER
         |      (PARTITION BY event_type, day ORDER BY h) AS rn FROM dd) x
         |  WHERE rn <= $SwK),
         |f0 AS (
         |  SELECT event_type, h,
         |    unnest(generate_series(day, day + INTERVAL 6 DAY, INTERVAL 1 DAY)) AS wts
         |  FROM daily),
         |f AS (SELECT DISTINCT event_type, CAST(wts AS DATE) AS win_end, h FROM f0),
         |mk AS (
         |  SELECT event_type, win_end, h FROM (
         |    SELECT *, row_number() OVER
         |      (PARTITION BY event_type, win_end ORDER BY h) AS rn FROM f) y
         |  WHERE rn <= $SwK),
         |sk AS (SELECT event_type, win_end, count(*) AS n_k, max(h) AS kth_min
         |  FROM mk GROUP BY 1, 2),
         |e0 AS (
         |  SELECT event_type, h,
         |    unnest(generate_series(day, day + INTERVAL 6 DAY, INTERVAL 1 DAY)) AS wts
         |  FROM dd),
         |ex AS (
         |  SELECT event_type, CAST(wts AS DATE) AS win_end,
         |    count(DISTINCT h) AS n_exact_7d
         |  FROM e0 GROUP BY 1, 2)
         |SELECT sk.event_type, sk.win_end, ex.n_exact_7d, sk.n_k, sk.kth_min,
         |  CASE WHEN sk.n_k < $SwK THEN CAST(sk.n_k AS DOUBLE)
         |       ELSE ${(SwK - 1).toDouble * 1152921504606846976.0} / CAST(sk.kth_min AS DOUBLE)
         |  END AS est_7d
         |FROM sk JOIN ex ON ex.event_type = sk.event_type AND ex.win_end = sk.win_end
         |ORDER BY sk.event_type, sk.win_end""".stripMargin,
    // dow derived from epoch-day arithmetic ((days+4) % 7, Sunday=0):
    // the engines' native dow functions disagree on the base (DuckDB
    // Sunday=0, Spark Sunday=1), arithmetic cannot
    "q116_seasonal_anomaly" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n_events
        |  FROM events GROUP BY 1, 2),
        |dows AS (
        |  SELECT *, CAST((date_diff('day', DATE '1970-01-01', day) + 4) % 7 AS INT)
        |    AS dow FROM daily),
        |agg AS (
        |  SELECT *, sum(n_events) OVER (PARTITION BY event_type, dow) AS s,
        |    count(*) OVER (PARTITION BY event_type, dow) AS c
        |  FROM dows)
        |SELECT event_type, day, n_events, dow,
        |  round(s / c, 9) AS dow_mean,
        |  (n_events * c * 2 > s * 3 OR n_events * c * 2 < s) AS is_anomaly
        |FROM agg ORDER BY event_type, day""".stripMargin,
    "q117_conversion_paths" ->
      s"""WITH lagged AS (
         |  SELECT event_type,
         |    lag(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS p1,
         |    lag(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS p2,
         |    lag(event_type, 3) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS p3
         |  FROM events)
         |SELECT concat_ws('>', p3, p2, p1) AS path, count(*) AS n_purchases
         |FROM lagged WHERE event_type = 'purchase'
         |GROUP BY 1 ORDER BY n_purchases DESC, path LIMIT $PathTopK""".stripMargin,
    // the Morton spread is the pure-arithmetic twin of the engine's
    // shift-mask version: bit i out by div/mod, re-placed at bit 2i by
    // multiplication — identical values on any SQL engine
    "q107_zorder_cells" ->
      s"""WITH cells AS (
         |  SELECT user_id, ts,
         |    (((user_id // $ZUserCell) % 256) + 256) % 256 AS uc,
         |    ((((epoch_us(ts) - $ZEpochUs) // $ZDayUs) % 256) + 256) % 256 AS dc
         |  FROM events),
         |z AS (
         |  SELECT user_id, ts,
         |    2 * ${spreadSql("uc")} + ${spreadSql("dc")} AS zkey
         |  FROM cells)
         |SELECT zkey, count(*) AS n_rows,
         |  min(user_id) AS min_user, max(user_id) AS max_user,
         |  min(ts) AS min_ts, max(ts) AS max_ts,
         |  (min(user_id) <= $ZQUserHi AND max(user_id) >= $ZQUserLo
         |   AND CAST(min(ts) AS DATE) <= DATE '$ZQDateHi'
         |   AND CAST(max(ts) AS DATE) >= DATE '$ZQDateLo') AS scanned
         |FROM z GROUP BY zkey ORDER BY zkey""".stripMargin,
    // q37's session derivation verbatim, then the textbook inequality
    // self-join — correct (and fine at oracle scale) but the quadratic
    // plan the binned Spark operator exists to avoid (the q40 note)
    "q109_session_overlap" ->
      s"""WITH ordered AS (
         |  SELECT user_id, ts, event_id,
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
         |  SELECT user_id, sess_no,
         |    epoch_us(min(ts)) AS st_us, epoch_us(max(ts)) AS en_us
         |  FROM numbered GROUP BY user_id, sess_no),
         |flagged AS (
         |  SELECT *, max(sess_no) OVER (PARTITION BY user_id) AS max_no FROM sess),
         |s AS (SELECT user_id, st_us, en_us FROM flagged WHERE sess_no < max_no),
         |p AS (
         |  SELECT a.user_id AS user_a, b.user_id AS user_b,
         |    a.st_us AS a_st, a.en_us AS a_en, b.st_us AS b_st, b.en_us AS b_en
         |  FROM s a JOIN s b
         |    ON a.user_id < b.user_id
         |   AND a.st_us < b.en_us AND b.st_us < a.en_us)
         |SELECT user_a, user_b, count(*) AS n_overlaps,
         |  round(CAST(sum(least(a_en, b_en) - greatest(a_st, b_st)) AS DOUBLE)
         |    / 1000000.0, 6) AS overlap_sec
         |FROM p GROUP BY user_a, user_b
         |ORDER BY overlap_sec DESC, user_a, user_b
         |LIMIT $OverlapTopK""".stripMargin,
    "q111_compaction_plan" ->
      s"""WITH perday AS (
         |  SELECT CAST(ts AS DATE) AS event_date, count(*) AS n_rows
         |  FROM events GROUP BY 1),
         |planned AS (
         |  SELECT event_date, n_rows,
         |    CAST(coalesce(sum(n_rows) OVER (ORDER BY event_date
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      // $CompactTargetRows AS BIGINT) AS out_group
         |  FROM perday)
         |SELECT event_date, n_rows, out_group,
         |  CAST(sum(n_rows) OVER (PARTITION BY out_group) AS BIGINT) AS group_rows,
         |  count(*) OVER (PARTITION BY out_group) AS group_days
         |FROM planned ORDER BY event_date""".stripMargin,
    // DuckDB types the DATE+INTERVAL series TIMESTAMP (Spark keeps
    // DATE); the explicit CAST in `days` aligns both engines
    // every window sum CAST back to BIGINT (the q111 lesson); the
    // max(0, S+r) fold rides the prefix identity, all-integer output
    "q163_cusum_drift" ->
      s"""WITH bounds AS (
         |  SELECT CAST(min(ts) AS DATE) AS d0, CAST(max(ts) AS DATE) AS d1,
         |    CAST(date_diff('day', CAST(min(ts) AS DATE),
         |      CAST(max(ts) AS DATE)) + 1 AS BIGINT) AS n_days
         |  FROM events),
         |raw AS (SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))
         |    AS dts, n_days FROM bounds),
         |days AS (SELECT CAST(dts AS DATE) AS day, n_days FROM raw),
         |td AS (SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
         |  FROM events GROUP BY 1, 2),
         |spine AS (SELECT t.event_type, d.day, d.n_days
         |  FROM (SELECT DISTINCT event_type FROM events) t CROSS JOIN days d),
         |filled AS (SELECT s.event_type, s.day, s.n_days,
         |    coalesce(td.n, 0) AS n_events
         |  FROM spine s
         |  LEFT JOIN td ON s.event_type = td.event_type AND s.day = td.day),
         |wt AS (SELECT *, CAST(sum(n_events) OVER (PARTITION BY event_type)
         |    AS BIGINT) AS type_total FROM filled),
         |rr AS (SELECT *, n_days * n_events - type_total AS r FROM wt),
         |cc AS (SELECT *, CAST(sum(r) OVER (PARTITION BY event_type
         |    ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |    AS BIGINT) AS cum FROM rr),
         |ss AS (SELECT *,
         |    cum - least(min(cum) OVER (PARTITION BY event_type ORDER BY day
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0)
         |      AS cusum_up,
         |    greatest(max(cum) OVER (PARTITION BY event_type ORDER BY day
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) - cum
         |      AS cusum_dn
         |  FROM cc)
         |SELECT event_type, day, n_events, type_total, r, cusum_up, cusum_dn,
         |  cusum_up > $CusumH * type_total AS drift_up,
         |  cusum_dn > $CusumH * type_total AS drift_dn
         |FROM ss ORDER BY event_type, day""".stripMargin,
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
    // exact DECIMAL fold sums, exact decimal difference, one double
    // division rounded 9 (NULLIF-guarded); identical fold rule
    "q210_oof_encoding" ->
      s"""WITH e AS (SELECT event_type,
         |    CAST(${graft.functions.TextFns.sql.hash32("'fold|' || CAST(event_id AS VARCHAR)")} % $OofFolds AS INT) AS fold,
         |    CAST(value AS DECIMAL(12,2)) AS v
         |  FROM events),
         |pf AS (SELECT event_type, fold, count(*) AS n_fold,
         |    sum(v) AS s_fold
         |  FROM e GROUP BY 1, 2),
         |pt AS (SELECT event_type, CAST(sum(n_fold) AS BIGINT) AS n_type,
         |    sum(s_fold) AS s_type
         |  FROM pf GROUP BY 1)
         |SELECT pf.event_type, pf.fold, pf.n_fold,
         |  n_type - pf.n_fold AS n_oof,
         |  round(CAST(s_type - s_fold AS DOUBLE)
         |    / NULLIF(n_type - pf.n_fold, 0), 9) AS oof_mean
         |FROM pf JOIN pt ON pt.event_type = pf.event_type
         |ORDER BY 1, 2""".stripMargin,
    // the island algorithm with session_window's batch semantics: ALL
    // sessions kept, end = last + gap; touching windows merge (same
    // strict-> boundary as q37, probe-verified)
    "q207_native_sessions" ->
      """WITH ordered AS (
        |  SELECT user_id, ts, value,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
        |  FROM events),
        |marked AS (
        |  SELECT *, CASE WHEN prev_ts IS NULL
        |    OR ts > prev_ts + INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
        |  FROM ordered),
        |numbered AS (
        |  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |    ROWS UNBOUNDED PRECEDING) AS sess_no
        |  FROM marked)
        |SELECT user_id, min(ts) AS session_start,
        |  max(ts) + INTERVAL 30 MINUTE AS session_end,
        |  CAST(count(*) AS INT) AS n_events, round(sum(value), 2) AS sum_value
        |FROM numbered GROUP BY user_id, sess_no
        |ORDER BY user_id, session_start""".stripMargin,
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
