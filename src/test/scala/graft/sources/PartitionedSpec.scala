package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

import graft.TestSpark

class PartitionedSpec extends AnyFunSpec {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf
  private val path = "/dev/shm/graft-test-events-by-day"

  describe("date-partitioned event layout") {
    it("prunes untouched days at planning time and keeps row parity") {
      val events = Tables.events(spark, sf)
      Partitioned.writeEventsByDay(events, path)
      val back = Partitioned.readEvents(spark, path)

      // layout round-trips the full table
      assert(back.count() == events.count())

      // pick a real day and query it through the partition column
      val day = back.select(min("event_date")).collect()(0).getDate(0)
      val q = back.filter(col("event_date") === lit(day))
      val scan = q.queryExecution.executedPlan.toString.linesIterator
        .filter(_.contains("FileScan")).mkString
      assert(scan.contains("PartitionFilters"), s"no partition filters in:\n$scan")
      assert(scan.contains("event_date"), s"pruning key missing from:\n$scan")

      // parity with the unpartitioned formulation of the same predicate
      val expect = events.filter(to_date(col("ts")) === lit(day)).count()
      assert(q.count() == expect)

      // a non-partition predicate still pushes into parquet row groups
      // within the surviving partition
      val tsScan = back
        .filter(col("event_date") === lit(day) && col("value") > 50.0)
        .queryExecution.executedPlan.toString.linesIterator
        .filter(_.contains("FileScan")).mkString
      assert(tsScan.contains("PushedFilters") && tsScan.contains("value"),
        s"row-group predicate must still push down:\n$tsScan")
    }

    it("dynamic overwrite replaces only the written day (backfill contract)") {
      val events = Tables.events(spark, sf)
      Partitioned.writeEventsByDay(events, path)
      val before = Partitioned.readEvents(spark, path)
      val total = before.count()
      val day = before.select(min("event_date")).collect()(0).getDate(0)
      val dayRows = before.filter(col("event_date") === lit(day)).count()

      // backfill that single day with itself
      Partitioned.writeEventsByDay(
        events.filter(to_date(col("ts")) === lit(day)), path)
      val after = Partitioned.readEvents(spark, path)
      assert(after.count() == total, "other days must survive the backfill")
      assert(after.filter(col("event_date") === lit(day)).count() == dayRows)
    }
  }
}
