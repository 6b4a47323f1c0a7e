package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

import graft.TestSpark
import graft.sources.Tables

class IntegritySpec extends AnyFunSpec {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf

  describe("row counts (q01)") {
    it("covers every corpus table with a positive count") {
      val rows = Integrity.rowCounts(spark, sf).collect()
      assert(rows.length == Tables.names.length)
      assert(rows.forall(_.getLong(1) > 0))
    }
  }

  describe("orphan checks (q02/q03)") {
    it("anti-join equals left-join + IS NULL formulation") {
      val anti = Integrity.ordersWithoutLines(spark, sf).collect()(0).getLong(0)
      val o = Tables.orders(spark, sf)
      val l = Tables.lineitem(spark, sf)
        .select(col("l_orderkey").as("o_orderkey"), lit(1).as("marker"))
        .distinct()
      val viaLeft = o.join(l, Seq("o_orderkey"), "left")
        .filter(col("marker").isNull).count()
      assert(anti == viaLeft)
    }

    it("is symmetric-safe: both directions run and are non-negative") {
      assert(Integrity.ordersWithoutLines(spark, sf).collect()(0).getLong(0) >= 0)
      assert(Integrity.linesWithoutOrder(spark, sf).collect()(0).getLong(0) >= 0)
    }
  }
}
