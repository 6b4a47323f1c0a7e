package graft.model

import java.sql.Date

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}

/** Typed API boundary (SURVEY §1.5): case classes for the supplier
  * domain. Internal operators stay `DataFrame`/`Column` so Catalyst sees
  * through every expression (no opaque lambdas in query plans); these
  * types are for callers who want compile-time safety at the edges.
  */
final case class Supplier(
    supplier_id: String, supplier_name: String, category: String,
    country: String, financial_risk_score: Int)

final case class PurchaseOrder(
    po_id: String, supplier_id: String, order_date: Date,
    promised_date: Date, quantity_ordered: Int)

final case class Delivery(
    po_id: String, delivery_date: Date, quantity_delivered: Int,
    quality_issues: Int)

final case class SupplierKpis(
    supplier_id: String, supplier_name: String, category: String,
    country: String, financial_risk_score: Int,
    on_time_delivery_rate: Double, avg_delivery_delay_days: Double,
    fill_rate: Option[Double], quality_issue_rate: Double, n_pos: Long)

final case class SupplierRiskSummary(
    supplier_id: String, supplier_name: String, category: String,
    country: String, financial_risk_score: Int,
    on_time_delivery_rate: Double, avg_delivery_delay_days: Double,
    fill_rate: Option[Double], quality_issue_rate: Double, n_pos: Long,
    norm_on_time: Double, norm_delay: Double, norm_fill: Double,
    norm_quality: Double, performance_score: Double, risk_score: Double)

object Schemas {
  implicit val supplierEnc: Encoder[Supplier] = Encoders.product[Supplier]
  implicit val poEnc: Encoder[PurchaseOrder] = Encoders.product[PurchaseOrder]
  implicit val deliveryEnc: Encoder[Delivery] = Encoders.product[Delivery]
  implicit val kpisEnc: Encoder[SupplierKpis] = Encoders.product[SupplierKpis]
  implicit val riskEnc: Encoder[SupplierRiskSummary] = Encoders.product[SupplierRiskSummary]

  /** Typed views over the operator outputs. */
  def kpis(df: DataFrame): Dataset[SupplierKpis] = df.as[SupplierKpis]
  def risk(df: DataFrame): Dataset[SupplierRiskSummary] = df.as[SupplierRiskSummary]
}
