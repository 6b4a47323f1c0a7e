package graft.gen

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Seeded synthetic supplier-domain generator (capability twin of the
  * reference's generate_data.py, §2.12 of SURVEY.md — same shape and
  * distributions, NOT a bit-for-bit port of Python's Mersenne Twister;
  * golden tests use the reference's committed CSVs, not regenerated
  * data).
  *
  * Spark-native determinism: every "random" draw is a pure column
  * expression `xxhash64(seed, salt, id)` mapped to [0,1) — so the
  * generator scales to any row count with no driver-side loop, no RNG
  * state, and identical output at any partitioning or cluster size.
  * That is the property the reference gets from a single-threaded
  * seeded RNG and loses at scale; hashing keeps it.
  */
object DataGen {

  val Categories = Seq("Electronics", "Raw Materials", "Packaging", "Logistics", "Services")
  val Countries = Seq("DE", "US", "CN", "IN", "PL", "VN", "MX", "TR", "BR")

  /** Uniform [0,1) draw, deterministic per (seed, salt, id). */
  private def u(seed: Long, salt: String, id: Column): Column =
    pmod(xxhash64(lit(seed), lit(salt), id), lit(1000000L)).cast("double") / 1e6

  /** Uniform integer in [lo, hi] inclusive. */
  private def uniformInt(seed: Long, salt: String, id: Column, lo: Int, hi: Int): Column =
    (lit(lo) + (u(seed, salt, id) * (hi - lo + 1)).cast("int"))

  private def clamp(c: Column, lo: Double, hi: Double): Column =
    least(greatest(c, lit(lo)), lit(hi))

  private def pick(seed: Long, salt: String, id: Column, values: Seq[String]): Column = {
    val arr = array(values.map(lit): _*)
    element_at(arr, (u(seed, salt, id) * values.size).cast("int") + 1)
  }

  /** Supplier master rows (generate_data.py:93-103 shape). */
  def suppliers(spark: SparkSession, n: Int, seed: Long = 42L): DataFrame =
    spark.range(1, n + 1).select(
      format_string("S%03d", col("id")).as("supplier_id"),
      format_string("Supplier %02d", col("id")).as("supplier_name"),
      pick(seed, "cat", col("id"), Categories).as("category"),
      pick(seed, "cty", col("id"), Countries).as("country"),
      uniformInt(seed, "fin", col("id"), 0, 100).as("financial_risk_score"))

  /** Purchase orders: uniform 2024 order dates, 3–21 day lead times,
    * 10–500 quantities (generate_data.py:120-142 shape).
    */
  def purchaseOrders(spark: SparkSession, nPos: Int, nSuppliers: Int, seed: Long = 42L): DataFrame = {
    val orderDate = date_add(lit(java.sql.Date.valueOf("2024-01-01")),
      uniformInt(seed, "odate", col("id"), 0, 364))
    spark.range(1, nPos + 1).select(
      format_string("PO%05d", col("id")).as("po_id"),
      format_string("S%03d", uniformInt(seed, "sup", col("id"), 1, nSuppliers)).as("supplier_id"),
      orderDate.as("order_date"),
      date_add(orderDate, uniformInt(seed, "lead", col("id"), 3, 21)).as("promised_date"),
      uniformInt(seed, "qty", col("id"), 10, 500).as("quantity_ordered"))
  }

  /** Deliveries: 1:1 with POs; behavior profile scales late/quality/
    * partial probabilities with the supplier's financial risk, clamped
    * (generate_data.py:105-118, 146-179 shape). Late deliveries slip
    * 1–15 days past promised; 8% arrive 1–3 days early; partial
    * deliveries fill 60–95%.
    */
  def deliveries(po: DataFrame, suppliers: DataFrame, seed: Long = 42L): DataFrame = {
    val fin = col("financial_risk_score").cast("double") / 100.0
    val lateP = clamp(lit(0.10) + lit(0.25) * fin, 0.05, 0.65)
    val qualP = clamp(lit(0.02) + lit(0.06) * fin, 0.01, 0.20)
    val partP = clamp(lit(0.08) + lit(0.15) * fin, 0.05, 0.55)
    val id = col("po_id")

    val uLate = u(seed, "late", id)
    val offset = when(uLate < lateP, uniformInt(seed, "slip", id, 1, 15))
      .when(uLate < lateP + 0.08, -uniformInt(seed, "early", id, 1, 3))
      .otherwise(0)
    val ratio = lit(0.6) + u(seed, "fillr", id) * 0.35
    val qty = when(u(seed, "part", id) < partP,
        round(col("quantity_ordered") * ratio, 0).cast("int"))
      .otherwise(col("quantity_ordered"))

    po.join(suppliers.select("supplier_id", "financial_risk_score"), Seq("supplier_id"))
      .select(
        col("po_id"),
        date_add(col("promised_date"), offset).as("delivery_date"),
        qty.as("quantity_delivered"),
        when(u(seed, "qual", id) < qualP, 1).otherwise(0).as("quality_issues"))
  }
}
