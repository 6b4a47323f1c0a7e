package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** CSV source/sink for the supplier domain with fixed, explicit schemas —
  * the reference deliberately declares DDL instead of trusting inference
  * ("explicitly defining the schema helps avoid issues with automatic
  * type inference", load_duckdb.py:38). Never `inferSchema`: a two-pass
  * scan, and nondeterministic at scale.
  *
  * Loads select columns in declared-schema order, replicating the
  * reference's positional `INSERT INTO … SELECT *` contract
  * (load_duckdb.py:76-95).
  */
object SupplierCsv {

  /** suppliers DDL (load_duckdb.py:41-48). */
  val suppliersSchema: StructType = StructType(Seq(
    StructField("supplier_id", StringType),
    StructField("supplier_name", StringType),
    StructField("category", StringType),
    StructField("country", StringType),
    StructField("financial_risk_score", IntegerType)))

  /** purchase_orders DDL (load_duckdb.py:53-60). */
  val purchaseOrdersSchema: StructType = StructType(Seq(
    StructField("po_id", StringType),
    StructField("supplier_id", StringType),
    StructField("order_date", DateType),
    StructField("promised_date", DateType),
    StructField("quantity_ordered", IntegerType)))

  /** deliveries DDL (load_duckdb.py:65-71). */
  val deliveriesSchema: StructType = StructType(Seq(
    StructField("po_id", StringType),
    StructField("delivery_date", DateType),
    StructField("quantity_delivered", IntegerType),
    StructField("quality_issues", IntegerType)))

  val schemas: Map[String, StructType] = Map(
    "suppliers" -> suppliersSchema,
    "purchase_orders" -> purchaseOrdersSchema,
    "deliveries" -> deliveriesSchema)

  /** Read one table's CSV with its declared schema (header row, ISO
    * dates — Spark's DateType default).
    */
  def read(spark: SparkSession, path: String, table: String): DataFrame = {
    val schema = schemas(table)
    spark.read
      .schema(schema)
      .option("header", true)
      .csv(path)
      .select(schema.fieldNames.map(org.apache.spark.sql.functions.col): _*)
  }

  /** Write a DataFrame as a single headered CSV file tree (generator
    * output parity, generate_data.py:190-211).
    */
  def write(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("overwrite").option("header", true).csv(path)
}
