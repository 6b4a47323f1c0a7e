package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** The dashboard's service facade (reference dashboard/app.py behavior,
  * SURVEY §3.3): one pushed-down base query, then small client-side
  * slices over a memoized snapshot.
  *
  * The reference memoizes via Streamlit's cache keyed on arguments —
  * i.e. the UI works on a *snapshot* taken at first load, isolated from
  * concurrent pipeline overwrites. This facade replicates that contract:
  * the base relation is collected once per service instance; every
  * filter / tile / top-N call is a pure function of the snapshot, so a
  * running pipeline rewrite never tears the UI's view. At dashboard
  * cardinalities (one row per supplier) the snapshot is small by
  * construction; the heavy lifting stayed in the engine.
  */
final class DashboardService(risk: DataFrame) {

  /** The single pushed-down query (app.py:41-58): collected snapshot. */
  val snapshot: Array[Row] = risk
    .orderBy(desc("risk_score"), asc("s_suppkey"))
    .collect()

  private val schema = risk.schema
  private def d(r: Row, c: String): Double = r.getAs[Double](c)

  /** Filter domains (app.py:86-87): sorted distinct non-null values
    * (natural order per the column's Catalyst type, lexicographic for
    * strings). The comparator is total — `Double.compare`/`Float.compare`
    * order NaN after +Inf instead of violating TimSort's contract.
    */
  def domain(column: String): Seq[Any] = {
    import org.apache.spark.sql.types._
    val cmp: (Any, Any) => Int = schema(column).dataType match {
      case ByteType => (a, b) =>
        java.lang.Byte.compare(a.asInstanceOf[Byte], b.asInstanceOf[Byte])
      case ShortType => (a, b) =>
        java.lang.Short.compare(a.asInstanceOf[Short], b.asInstanceOf[Short])
      case IntegerType => (a, b) =>
        Integer.compare(a.asInstanceOf[Int], b.asInstanceOf[Int])
      case LongType => (a, b) =>
        java.lang.Long.compare(a.asInstanceOf[Long], b.asInstanceOf[Long])
      case FloatType => (a, b) =>
        java.lang.Float.compare(a.asInstanceOf[Float], b.asInstanceOf[Float])
      case DoubleType => (a, b) =>
        java.lang.Double.compare(a.asInstanceOf[Double], b.asInstanceOf[Double])
      case _: DecimalType => (a, b) =>
        a.asInstanceOf[java.math.BigDecimal]
          .compareTo(b.asInstanceOf[java.math.BigDecimal])
      case DateType => (a, b) =>
        a.asInstanceOf[java.sql.Date].compareTo(b.asInstanceOf[java.sql.Date])
      case TimestampType => (a, b) =>
        a.asInstanceOf[java.sql.Timestamp]
          .compareTo(b.asInstanceOf[java.sql.Timestamp])
      case BooleanType => (a, b) =>
        java.lang.Boolean.compare(a.asInstanceOf[Boolean], b.asInstanceOf[Boolean])
      case _ => (a, b) => a.toString.compareTo(b.toString)
    }
    snapshot.map(_.getAs[Any](column)).filter(_ != null).distinct
      .sortWith((a, b) => cmp(a, b) < 0).toSeq
  }

  /** Optional equality + inclusive range filter (app.py:98-103). */
  def filtered(nation: Option[Int], nLinesLo: Long, nLinesHi: Long): Seq[Row] =
    snapshot.filter { r =>
      nation.forall(_ == r.getAs[Int]("s_nationkey")) && {
        val n = r.getAs[Long]("n_lines")
        n >= nLinesLo && n <= nLinesHi
      }
    }.toSeq

  /** KPI tiles (app.py:107-111); None when the slice is empty (the
    * reference renders an em-dash).
    */
  def tiles(rows: Seq[Row]): Option[(Long, Double, Double, Double)] =
    if (rows.isEmpty) None
    else Some((
      rows.size.toLong,
      rows.map(d(_, "risk_score")).sum / rows.size,
      rows.map(d(_, "on_time_rate")).sum / rows.size * 100,
      rows.map(d(_, "return_rate")).sum / rows.size * 100))

  /** Top-N by risk over a filtered slice (app.py:149). */
  def topN(rows: Seq[Row], n: Int): Seq[Row] =
    rows.sortBy(r => (-d(r, "risk_score"), r.getAs[Long]("s_suppkey"))).take(n)

  /** Drill-down: first row for a supplier name (app.py:172-173). */
  def drilldown(name: String): Option[Row] =
    snapshot.find(_.getAs[String]("s_name") == name)
}

object DashboardService {
  /** Build from the engine's risk relation for a corpus dir. */
  def apply(spark: SparkSession, dir: String): DashboardService =
    new DashboardService(SupplierPerf.risk(spark, dir))
}
