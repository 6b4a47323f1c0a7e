package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.sources.Tables

/** Dashboard query surface (reference dashboard/app.py): base projection,
  * presentation rounding, filter domains, filtered slice, KPI tiles,
  * top-N, drill-down, table viewer. Each is a small-by-construction
  * aggregate/limit — safe to collect at the service edge, planned as
  * `TakeOrderedAndProject` / partial+final hash aggregates underneath.
  */
object Dashboard {

  /** Default filter used by the parameterized dashboard queries
    * (app.py:98-103: optional category/country equality + inclusive
    * n_pos range). Here: nation-key equality + lineitem-count range.
    */
  val FilterNation = 7
  val NLinesLo = 400
  val NLinesHi = 800

  private def filtered(spark: SparkSession, dir: String): DataFrame =
    SupplierPerf.risk(spark, dir)
      .filter(col("s_nationkey") === FilterNation &&
        col("n_lines").between(NLinesLo, NLinesHi))

  private val filteredSql: String =
    s"""${SupplierPerf.riskSql},
       | filtered AS (
       |  SELECT * FROM risk
       |  WHERE s_nationkey = $FilterNation AND n_lines BETWEEN $NLinesLo AND $NLinesHi
       |)""".stripMargin

  /** Order-independent mean over a DOUBLE column (exact decimal
    * accumulator; see graft.functions.Det).
    */
  private def tileAvg(c: String): Column =
    sum(col(c).cast(DecimalType(38, 12))).cast("double") / count(lit(1))

  /** Q9–Q15 over a materialized risk relation — the shape the reference
    * actually runs (its dashboard reads the CTAS'd `supplier_risk_summary`
    * table, not a recomputation; dashboard/app.py:41-58). Used by the
    * staged Bench pipeline.
    */
  def queriesFromRisk(risk: DataFrame): Map[String, DataFrame] = {
    val filt = risk.filter(col("s_nationkey") === FilterNation &&
      col("n_lines").between(NLinesLo, NLinesHi))
    Map(
      "q09_dashboard_base" -> risk
        .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal",
          "on_time_rate", "avg_ship_delay_days", "return_rate", "revenue",
          "n_lines", "norm_acctbal", "performance_score", "risk_score")
        .orderBy(desc("risk_score"), asc("s_suppkey")),
      // HALF_UP `round`, deliberately: the verification contract is the
      // DuckDB oracle (HALF_UP). The reference's pandas layer rounds
      // half-even (dashboard/app.py:64-69) — a UI needing numpy parity
      // applies `bround` to the unrounded q09 columns (SURVEY §2.1 Q10).
      "q10_presentation" -> risk
        .select(col("s_suppkey"), col("s_name"),
          round(col("on_time_rate") * 100, 1).as("on_time_rate_pct"),
          round(col("return_rate") * 100, 1).as("return_rate_pct"),
          round(col("avg_ship_delay_days"), 2).as("avg_ship_delay_days"),
          round(col("performance_score"), 3).as("performance_score"),
          round(col("risk_score"), 3).as("risk_score"))
        .orderBy(desc("risk_score"), asc("s_suppkey")),
      "q12_filtered_risk" -> filt
        .select("s_suppkey", "s_name", "s_nationkey", "n_lines", "risk_score")
        .orderBy("s_suppkey"),
      "q13_kpi_tiles" -> filt.agg(
        count(lit(1)).as("n_suppliers"),
        tileAvg("risk_score").as("avg_risk"),
        (tileAvg("on_time_rate") * 100).as("avg_on_time_pct"),
        (tileAvg("return_rate") * 100).as("avg_return_pct")),
      "q14_topn_risk" -> filt
        .select("s_suppkey", "s_name", "risk_score", "performance_score")
        .orderBy(desc("risk_score"), asc("s_suppkey"))
        .limit(10),
      "q15_drilldown" -> risk
        .filter(col("s_name") === "Supplier#000000003")
        .orderBy("s_suppkey")
        .limit(1))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Q9 — dashboard base projection, risk-ranked (app.py:41-58).
    "q09_dashboard_base" -> ((spark, dir) =>
      SupplierPerf.risk(spark, dir)
        .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal",
          "on_time_rate", "avg_ship_delay_days", "return_rate", "revenue",
          "n_lines", "norm_acctbal", "performance_score", "risk_score")
        .orderBy(desc("risk_score"), asc("s_suppkey"))),

    // Q10 — presentation columns: pct + rounding (app.py:64-69).
    // Spark `round` is HALF_UP = away-from-zero on positives, matching
    // DuckDB's round — verified on this container (round(2.5)=3 both).
    "q10_presentation" -> ((spark, dir) =>
      SupplierPerf.risk(spark, dir)
        .select(col("s_suppkey"), col("s_name"),
          round(col("on_time_rate") * 100, 1).as("on_time_rate_pct"),
          round(col("return_rate") * 100, 1).as("return_rate_pct"),
          round(col("avg_ship_delay_days"), 2).as("avg_ship_delay_days"),
          round(col("performance_score"), 3).as("performance_score"),
          round(col("risk_score"), 3).as("risk_score"))
        .orderBy(desc("risk_score"), asc("s_suppkey"))),

    // Q11 — filter domain: sorted distinct non-null values (app.py:86-87).
    "q11_filter_domains" -> ((spark, dir) =>
      Tables.orders(spark, dir)
        .select("o_orderpriority").na.drop().distinct()
        .orderBy("o_orderpriority")),

    // Q12 — filtered risk slice (app.py:98-103).
    "q12_filtered_risk" -> ((spark, dir) =>
      filtered(spark, dir)
        .select("s_suppkey", "s_name", "s_nationkey", "n_lines", "risk_score")
        .orderBy("s_suppkey")),

    // Q13 — KPI tiles over the filtered slice (app.py:107-111).
    "q13_kpi_tiles" -> ((spark, dir) =>
      filtered(spark, dir).agg(
        count(lit(1)).as("n_suppliers"),
        tileAvg("risk_score").as("avg_risk"),
        (tileAvg("on_time_rate") * 100).as("avg_on_time_pct"),
        (tileAvg("return_rate") * 100).as("avg_return_pct"))),

    // Q14 — top-N by risk over the filtered slice (app.py:149).
    "q14_topn_risk" -> ((spark, dir) =>
      filtered(spark, dir)
        .select("s_suppkey", "s_name", "risk_score", "performance_score")
        .orderBy(desc("risk_score"), asc("s_suppkey"))
        .limit(10)),

    // Q15 — drill-down: the row for one selected supplier (app.py:172-173).
    "q15_drilldown" -> ((spark, dir) =>
      SupplierPerf.risk(spark, dir)
        .filter(col("s_name") === "Supplier#000000003")
        .orderBy("s_suppkey")
        .limit(1)),

    // Q16 — table viewer: SELECT * FROM t LIMIT n (app.py:204-212).
    "q16_table_viewer" -> ((spark, dir) =>
      Tables.nation(spark, dir).orderBy("n_nationkey").limit(20)))

  val oracle: Map[String, String] = Map(
    "q09_dashboard_base" ->
      s"""${SupplierPerf.riskSql}
         |SELECT s_suppkey, s_name, s_nationkey, s_acctbal, on_time_rate,
         |  avg_ship_delay_days, return_rate, revenue, n_lines, norm_acctbal,
         |  performance_score, risk_score
         |FROM risk ORDER BY risk_score DESC, s_suppkey ASC""".stripMargin,
    "q10_presentation" ->
      s"""${SupplierPerf.riskSql}
         |SELECT s_suppkey, s_name,
         |  round(on_time_rate * 100, 1) AS on_time_rate_pct,
         |  round(return_rate * 100, 1) AS return_rate_pct,
         |  round(avg_ship_delay_days, 2) AS avg_ship_delay_days,
         |  round(performance_score, 3) AS performance_score,
         |  round(risk_score, 3) AS risk_score
         |FROM risk ORDER BY round(risk_score, 3) DESC, s_suppkey ASC""".stripMargin,
    "q11_filter_domains" ->
      """SELECT DISTINCT o_orderpriority FROM orders
        |WHERE o_orderpriority IS NOT NULL ORDER BY o_orderpriority""".stripMargin,
    "q12_filtered_risk" ->
      s"""$filteredSql
         |SELECT s_suppkey, s_name, s_nationkey, n_lines, risk_score
         |FROM filtered ORDER BY s_suppkey""".stripMargin,
    "q13_kpi_tiles" ->
      s"""$filteredSql
         |SELECT COUNT(*) AS n_suppliers,
         |  CAST(SUM(CAST(risk_score AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*) AS avg_risk,
         |  CAST(SUM(CAST(on_time_rate AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*) * 100 AS avg_on_time_pct,
         |  CAST(SUM(CAST(return_rate AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*) * 100 AS avg_return_pct
         |FROM filtered""".stripMargin,
    "q14_topn_risk" ->
      s"""$filteredSql
         |SELECT s_suppkey, s_name, risk_score, performance_score
         |FROM filtered ORDER BY risk_score DESC, s_suppkey ASC LIMIT 10""".stripMargin,
    "q15_drilldown" ->
      s"""${SupplierPerf.riskSql}
         |SELECT * FROM risk WHERE s_name = 'Supplier#000000003'
         |ORDER BY s_suppkey LIMIT 1""".stripMargin,
    "q16_table_viewer" ->
      "SELECT * FROM nation ORDER BY n_nationkey LIMIT 20")
}
