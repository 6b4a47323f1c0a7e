package graft.sources

import java.io.File

import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

import graft.TestSpark

class AtomicWarehouseSpec extends AnyFunSpec {
  private lazy val spark = TestSpark.spark
  private val root = "/dev/shm/graft-test-atomic"

  private def snapshot(v: Long) =
    spark.range(0, 200).select(lit(v).as("v"), col("id"))

  describe("atomic overwrite") {
    it("readers never observe a partial or mixed table during overwrites") {
      AtomicWarehouse.overwrite(snapshot(0), root, "t")
      @volatile var stop = false
      val bad = new java.util.concurrent.atomic.AtomicReference[String](null)
      val reads = new java.util.concurrent.atomic.AtomicInteger(0)
      val reader = new Thread(() => {
        while (!stop && bad.get == null) {
          try {
            val rows = AtomicWarehouse.read(spark, root, "t").collect()
            val vs = rows.map(_.getLong(0)).distinct
            // a half-written table shows up as a short row count; a
            // non-atomic swap as rows from two versions at once
            if (rows.length != 200 || vs.length != 1)
              bad.set(s"partial read: rows=${rows.length} versions=${vs.mkString(",")}")
            reads.incrementAndGet()
          } catch {
            case e: Exception => bad.set(s"reader threw: $e")
          }
        }
      })
      reader.start()
      (1 to 5).foreach(v => AtomicWarehouse.overwrite(snapshot(v), root, "t"))
      stop = true
      reader.join(30000)
      assert(bad.get == null, s"${bad.get}")
      assert(reads.get > 0, "reader never completed a read")
      assert(AtomicWarehouse.read(spark, root, "t")
        .agg(max("v")).collect()(0).getLong(0) == 5L)
    }

    it("garbage-collects generations beyond two once the grace period lapses") {
      (0 to 3).foreach(v => AtomicWarehouse.overwrite(snapshot(v), root, "g", gcGraceMs = 0L))
      val versions = new File(root, "g").listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("v-"))
      assert(versions.length == 2, s"expected current+previous, got ${versions.map(_.getName).toSeq}")
      assert(AtomicWarehouse.read(spark, root, "g")
        .agg(max("v")).collect()(0).getLong(0) == 3L)
    }

    it("falls back to the plain directory for non-versioned tables") {
      snapshot(9).write.mode("overwrite").parquet(s"$root/plain")
      assert(AtomicWarehouse.read(spark, root, "plain").count() == 200)
    }
  }
}
