package graft.app

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.gen.DataGen
import graft.operators.SupplierDomain
import graft.sources.{AtomicWarehouse, SupplierCsv}

/** The reference's 4-stage batch pipeline, Spark-native: generate →
  * load → kpis → risk, with the same restartable file-handoff contract
  * (dags/supplier_pipeline_dag.py:37-57; any stage can rerun from its
  * predecessor's output on disk) and drop-and-recreate idempotency
  * (`SaveMode.Overwrite` ↔ the reference's DROP TABLE IF EXISTS,
  * load_duckdb.py:32-36). Table overwrites go through
  * [[AtomicWarehouse]] (version dir + atomic pointer flip) so
  * concurrent readers — the reference keeps read-only dashboard
  * connections open across reloads (dashboard/app.py:39) — never see a
  * half-written table.
  *
  * Run all stages: `runMain graft.app.Pipeline <workDir>` — or a single
  * stage: `runMain graft.app.Pipeline <workDir> <stage>`.
  */
object Pipeline {

  /** Scheduler-analog stage runner (the reference schedules each stage
    * with retries=2, dags/supplier_pipeline_dag.py:14-15): rerun a
    * failed stage up to `retries` extra attempts before giving up.
    * Retrying blind is SAFE here because every stage is idempotent
    * from its predecessor's on-disk output: generate/load/kpis/risk
    * each republish their outputs whole (CSV overwrite, or an
    * [[AtomicWarehouse]] version-dir + pointer flip), so an attempt
    * that died mid-write left the previous published version visible
    * and the retry starts from the same inputs — the restart contract
    * `PipelineSpec` pins.
    */
  def runStage[T](name: String, retries: Int = 2)(f: => T): T = {
    var attempt = 0
    while (true) {
      try return f
      catch {
        case e: Exception if attempt < retries =>
          attempt += 1
          System.err.println(
            s"[pipeline] stage $name attempt $attempt/${retries + 1} failed, retrying: ${e.getMessage}")
      }
    }
    throw new IllegalStateException("unreachable")
  }

  def generate(spark: SparkSession, dir: String,
      nSuppliers: Int = 15, nPos: Int = 600, seed: Long = 42L): Unit = {
    val s = DataGen.suppliers(spark, nSuppliers, seed)
    val po = DataGen.purchaseOrders(spark, nPos, nSuppliers, seed)
    SupplierCsv.write(s, s"$dir/csv/suppliers")
    SupplierCsv.write(po, s"$dir/csv/purchase_orders")
    SupplierCsv.write(DataGen.deliveries(po, s, seed), s"$dir/csv/deliveries")
  }

  /** CSV → parquet warehouse + the reference's integrity checks
    * (row counts, orphans in both directions — load_duckdb.py:98-128).
    * Returns (rowCounts, orphanPos, orphanDeliveries).
    */
  def load(spark: SparkSession, dir: String): (Map[String, Long], Long, Long) = {
    val wh = s"$dir/wh"
    val tables = SupplierCsv.schemas.keys.map { t =>
      val df = SupplierCsv.read(spark, s"$dir/csv/$t", t)
      AtomicWarehouse.overwrite(df, wh, t)
      t -> AtomicWarehouse.read(spark, wh, t).count()
    }.toMap
    val po = AtomicWarehouse.read(spark, wh, "purchase_orders")
    val d = AtomicWarehouse.read(spark, wh, "deliveries")
    (tables,
      SupplierDomain.posWithoutDelivery(po, d),
      SupplierDomain.deliveriesWithoutPo(d, po))
  }

  /** `supplier_kpis` CTAS (compute_kpis.py). */
  def kpis(spark: SparkSession, dir: String): DataFrame = {
    val wh = s"$dir/wh"
    val k = SupplierDomain.kpis(
      AtomicWarehouse.read(spark, wh, "suppliers"),
      AtomicWarehouse.read(spark, wh, "purchase_orders"),
      AtomicWarehouse.read(spark, wh, "deliveries"))
    AtomicWarehouse.overwrite(k, wh, "supplier_kpis")
    AtomicWarehouse.read(spark, wh, "supplier_kpis")
  }

  /** `supplier_risk_summary` CTAS (compute_risk.py). */
  def risk(spark: SparkSession, dir: String): DataFrame = {
    val wh = s"$dir/wh"
    val r = SupplierDomain.risk(AtomicWarehouse.read(spark, wh, "supplier_kpis"))
    AtomicWarehouse.overwrite(r, wh, "supplier_risk_summary")
    AtomicWarehouse.read(spark, wh, "supplier_risk_summary")
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/pipeline")
    val stage = if (args.length > 1) args(1) else "all"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/spark-scratch")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def stageGenerate(): Unit = runStage("generate") {
      generate(spark, dir); println(s"[pipeline] generated → $dir/csv")
    }
    def stageLoad(): Unit = runStage("load") {
      val (counts, orphanPo, orphanD) = load(spark, dir)
      println(s"[pipeline] loaded: $counts; orphan POs=$orphanPo orphan deliveries=$orphanD")
      require(orphanPo == 0 && orphanD == 0, "referential integrity violated")
    }
    def stageKpis(): Unit = runStage("kpis") {
      println(s"[pipeline] supplier_kpis rows=${kpis(spark, dir).count()}")
    }
    def stageRisk(): Unit = runStage("risk") {
      println(s"[pipeline] supplier_risk_summary rows=${risk(spark, dir).count()}")
    }

    stage match {
      case "generate" => stageGenerate()
      case "load" => stageLoad()
      case "kpis" => stageKpis()
      case "risk" => stageRisk()
      case "all" => stageGenerate(); stageLoad(); stageKpis(); stageRisk()
      case other => sys.error(s"unknown stage '$other' (generate|load|kpis|risk|all)")
    }
    spark.stop()
  }
}
