package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.Tables

/** The `spark.sql` text surface of the reference's query set q01–q16 —
  * the entry point a user porting the reference reaches for first: its
  * entire surface is SQL strings executed against DuckDB
  * (compute_kpis.py:24-74, compute_risk.py:36-113, dashboard/app.py),
  * so the engine ships every core query in BOTH forms (SURVEY §3.2):
  * the DataFrame form in [[Integrity]]/[[SupplierPerf]]/[[Dashboard]]
  * and this SQL-text form.
  *
  * The SQL strings are the DuckDB oracle texts passed through
  * [[toSparkDialect]] — a single asserted rewrite (DuckDB
  * `date_diff('day', a, b)` → Spark `datediff(b, a)`; everything else
  * the two dialects share). Deriving rather than duplicating keeps the
  * three forms (DataFrame, Spark SQL, DuckDB oracle) in lockstep by
  * construction; `SqlSurfaceSpec` gates the SQL form bit-exact against
  * the DataFrame form, which the driver already gates against DuckDB.
  */
object SqlSurface {

  /** Register every corpus table as a session temp view. Reading through
    * [[Tables]] applies the nanos→micros timestamp conversion, so SQL
    * text sees exactly the relations the DataFrame API does. Temp views
    * are lazy relation aliases — filters and column pruning still reach
    * the parquet scan.
    */
  def registerViews(spark: SparkSession, dir: String): Unit =
    Tables.names.foreach(n => Tables(spark, dir, n).createOrReplaceTempView(n))

  /** Register the 5 pipeline warehouse tables (3 loaded + 2 CTAS, the
    * reference's DuckDB catalog: load_duckdb.py:32-36) as temp views
    * over `<workDir>/wh`, so the reference's own dashboard SQL (e.g.
    * `SELECT * FROM supplier_risk_summary ORDER BY risk_score DESC`)
    * runs verbatim via `spark.sql`.
    */
  val WarehouseTables: Seq[String] = Seq(
    "suppliers", "purchase_orders", "deliveries",
    "supplier_kpis", "supplier_risk_summary")

  def registerWarehouse(spark: SparkSession, workDir: String): Unit =
    WarehouseTables.foreach(t =>
      graft.sources.AtomicWarehouse.read(spark, s"$workDir/wh", t)
        .createOrReplaceTempView(t))

  /** Rewrite the (near-ANSI) DuckDB oracle text into Spark dialect. The
    * require makes an unrewritten DuckDB-ism fail loudly at map-build
    * time instead of at query time.
    */
  private def toSparkDialect(s: String): String = {
    val out = s.replace(
      "date_diff('day', o.o_orderdate, l.l_shipdate)",
      "datediff(l.l_shipdate, o.o_orderdate)")
    require(!out.contains("date_diff("), s"unrewritten DuckDB dialect in:\n$out")
    out
  }

  /** Spark-SQL text of q01–q16, keyed like `SparkEntry.queries`. */
  val sql: Map[String, String] =
    (Integrity.oracle ++ SupplierPerf.oracle ++ Dashboard.oracle)
      .view.mapValues(toSparkDialect).toMap

  /** Run one SQL-form query by name against the corpus at `dir`. */
  def run(spark: SparkSession, dir: String, name: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql(sql(name))
  }
}
