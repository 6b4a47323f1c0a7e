package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.sources.Tables

/** Analytic operator coverage beyond the reference surface: set
  * operations, grouping sets (ROLLUP), and as-of (most-recent-prior)
  * semantics via frame-bounded windows.
  *
  * Scale notes: INTERSECT/EXCEPT lower to distinct + hash joins on the
  * compared columns; ROLLUP is one pass with grouping-set expansion and
  * map-side partial aggregation; the as-of window shuffles once on
  * user_id with an unbounded-preceding frame (running state, no
  * re-scan per row).
  */
object Analytics {

  /** q31 — cohort set operations: users with both clicks and purchases
    * (INTERSECT) vs clicks only (EXCEPT).
    */
  def cohorts(spark: SparkSession, dir: String): DataFrame =
    cohortsFrom(Tables.events(spark, dir))

  def cohortsFrom(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click").select("user_id").distinct()
    val purch = events.filter(col("event_type") === "purchase").select("user_id").distinct()
    clicks.intersect(purch).select(lit("both").as("cohort"), col("user_id"))
      .unionAll(clicks.except(purch).select(lit("click_only").as("cohort"), col("user_id")))
      .orderBy("cohort", "user_id")
  }

  /** q32 — ROLLUP revenue by (returnflag, linestatus) with grouping id. */
  def revenueRollup(spark: SparkSession, dir: String): DataFrame =
    revenueRollupFrom(Tables.lineitem(spark, dir))

  def revenueRollupFrom(lineitem: DataFrame): DataFrame =
    lineitem
      .rollup("l_returnflag", "l_linestatus")
      .agg(
        grouping_id().as("gid"),
        sum(col("l_extendedprice").cast(DecimalType(18, 2))).cast("double").as("revenue"),
        count(lit(1)).as("n"))
      .select(col("l_returnflag"), col("l_linestatus"), col("gid").cast("int").as("gid"),
        col("revenue"), col("n"))
      .orderBy(asc("gid"), asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))

  /** q33 — as-of lookup: for every purchase, the most recent prior
    * click timestamp of the same user (null when none), via an
    * IGNORE-NULLS last over an unbounded-preceding frame.
    */
  def asofPriorClick(spark: SparkSession, dir: String): DataFrame =
    asofPriorClickFrom(Tables.events(spark, dir))

  def asofPriorClickFrom(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(asc("ts"), asc("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    events
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
      .withColumn("prior_click_ts",
        last(when(col("event_type") === "click", col("ts")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts", "prior_click_ts")
      .orderBy("event_id")
  }

  /** q34 — exact quantiles per event type: Spark `median`/`percentile`
    * interpolate identically (bit-exact) to DuckDB
    * `median`/`quantile_cont`, both sorting exact doubles.
    */
  def valueQuantiles(spark: SparkSession, dir: String): DataFrame =
    valueQuantilesFrom(Tables.events(spark, dir))

  def valueQuantilesFrom(events: DataFrame): DataFrame =
    events.groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        min("value").as("min_v"),
        median(col("value")).as("med"),
        percentile(col("value"), lit(0.9)).as("p90"),
        max("value").as("max_v"))
      .orderBy("event_type")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q31_cohort_set_ops" -> (cohorts _),
    "q32_revenue_rollup" -> (revenueRollup _),
    "q33_asof_prior_click" -> (asofPriorClick _),
    "q34_value_quantiles" -> (valueQuantiles _))

  val oracle: Map[String, String] = Map(
    "q31_cohort_set_ops" ->
      """WITH clicks AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
        |purch AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
        |SELECT 'both' AS cohort, user_id FROM
        |  (SELECT user_id FROM clicks INTERSECT SELECT user_id FROM purch)
        |UNION ALL
        |SELECT 'click_only' AS cohort, user_id FROM
        |  (SELECT user_id FROM clicks EXCEPT SELECT user_id FROM purch)
        |ORDER BY cohort, user_id""".stripMargin,
    "q32_revenue_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS INT) AS gid,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q33_asof_prior_click" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, ts, event_type FROM events
        |  WHERE event_type IN ('click', 'purchase')),
        |w AS (
        |  SELECT *, last_value(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS) OVER
        |    (PARTITION BY user_id ORDER BY ts, event_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_click_ts
        |  FROM ev)
        |SELECT event_id, user_id, ts, prior_click_ts FROM w
        |WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin,
    "q34_value_quantiles" ->
      """SELECT event_type, count(*) AS n, min(value) AS min_v,
        |  median(value) AS med, quantile_cont(value, 0.9) AS p90,
        |  max(value) AS max_v
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)
}
