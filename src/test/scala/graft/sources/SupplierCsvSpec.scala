package graft.sources

import org.scalatest.funspec.AnyFunSpec

import graft.TestSpark

class SupplierCsvSpec extends AnyFunSpec {
  private lazy val spark = TestSpark.spark

  describe("explicit-schema CSV source/sink") {
    it("round-trips the suppliers table with declared types intact") {
      val in = SupplierCsv.read(spark, "/root/reference/data/suppliers.csv", "suppliers")
      val dir = "/dev/shm/graft-test-csv/suppliers"
      SupplierCsv.write(in, dir)
      val back = SupplierCsv.read(spark, dir, "suppliers")
      assert(back.schema == SupplierCsv.suppliersSchema)
      assert(back.count() == in.count())
      assert(back.collect().map(_.toString).sorted.toSeq ==
        in.collect().map(_.toString).sorted.toSeq)
    }

    it("parses ISO dates into DateType") {
      val po = SupplierCsv.read(spark, "/root/reference/data/purchase_orders.csv", "purchase_orders")
      val r = po.orderBy("po_id").collect()(0)
      assert(r.getAs[java.sql.Date]("order_date") != null)
      assert(r.schema("order_date").dataType.typeName == "date")
    }

    it("selects columns in declared-schema order regardless of file order") {
      val s = SupplierCsv.read(spark, "/root/reference/data/suppliers.csv", "suppliers")
      assert(s.columns.toSeq == SupplierCsv.suppliersSchema.fieldNames.toSeq)
    }
  }
}
