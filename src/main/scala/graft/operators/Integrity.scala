package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Load-time integrity checks (reference load_duckdb.py:98-128):
  * per-table row counts and referential orphan counts in both directions,
  * expressed as anti-joins (never a driver-side loop — the anti-join
  * shuffles on the key and scales out).
  */
object Integrity {

  /** Q1 — row counts of every corpus table, one row per table. */
  def rowCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.names
      .map { n =>
        Tables(spark, dir, n)
          .agg(count(lit(1)).as("n_rows"))
          .select(lit(n).as("tbl"), col("n_rows"))
      }
      .reduce(_ union _)
      .orderBy("tbl")

  /** Q2 — orders with no lineitem (anti-join, load_duckdb.py:108-115). */
  def ordersWithoutLines(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .join(
        Tables.lineitem(spark, dir).select(col("l_orderkey").as("o_orderkey")),
        Seq("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("n_orphans"))

  /** Q3 — lineitems with no order (mirror, load_duckdb.py:117-124). */
  def linesWithoutOrder(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .join(
        Tables.orders(spark, dir).select(col("o_orderkey").as("l_orderkey")),
        Seq("l_orderkey"), "left_anti")
      .agg(count(lit(1)).as("n_orphans"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_row_counts" -> (rowCounts _),
    "q02_orders_without_lines" -> (ordersWithoutLines _),
    "q03_lines_without_order" -> (linesWithoutOrder _))

  val oracle: Map[String, String] = Map(
    "q01_row_counts" ->
      Tables.names
        .map(n => s"SELECT '$n' AS tbl, COUNT(*) AS n_rows FROM $n")
        .mkString("", " UNION ALL ", " ORDER BY tbl"),
    "q02_orders_without_lines" ->
      """SELECT COUNT(*) AS n_orphans FROM orders o
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)""".stripMargin,
    "q03_lines_without_order" ->
      """SELECT COUNT(*) AS n_orphans FROM lineitem l
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)""".stripMargin)
}
