package graft.sources

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

import graft.TestSpark
import graft.operators.Events

class ZOrderedSpec extends AnyFunSpec {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  describe("z-ordered event layout (the q107 physical half)") {
    it("files bound BOTH dimensions tightly, so a rectangle query prunes on either") {
      // balanced geometry: 256 users × 256 days so the Morton key uses
      // all 8 bits of each dimension (the fixture's 15 users would give
      // the user dim one bit and the curve degenerates to a day sort —
      // geometry, not code, so the spec builds the balanced corpus)
      val n = 8192
      val rows = (0 until n).map { i =>
        val u = (i * 37) % 256
        val day = (i * 101) % 256
        (i.toLong, new Timestamp(Events.ZEpochUs / 1000 + day * 86400000L),
          u.toLong, "view", 1.0, "{}")
      }
      val ev = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      val path = "/dev/shm/graft-test-zorder"
      ZOrdered.writeEventsZOrdered(ev, path, userCell = 1,
        epochUs = Events.ZEpochUs, numFiles = 16)

      val files = ZOrdered.readEvents(spark, path)
        .groupBy(input_file_name().as("f"))
        .agg(min("user_id").as("mu"), max("user_id").as("xu"),
          min(unix_micros(col("ts"))).as("mt"), max(unix_micros(col("ts"))).as("xt"))
        .collect()
      assert(files.length == 16)

      // per-file bounding boxes are narrow SLICES of both domains, not
      // the full span (a day-sorted layout would bound days only)
      val uSpans = files.map(r => r.getAs[Long]("xu") - r.getAs[Long]("mu"))
      val dSpans = files.map(r =>
        (r.getAs[Long]("xt") - r.getAs[Long]("mt")) / (86400L * 1000000L))
      assert(uSpans.sum.toDouble / files.length < 256 * 0.6,
        s"user spans too wide: ${uSpans.toSeq}")
      assert(dSpans.sum.toDouble / files.length < 256 * 0.6,
        s"day spans too wide: ${dSpans.toSeq}")

      // rectangle query (low user quadrant × low day quadrant): the
      // both-dimension footer test must skip files the date-only test
      // keeps — the pruning a single-dimension layout cannot do
      val dHi = Events.ZEpochUs + 64L * 86400L * 1000000L
      def dateOverlap(r: org.apache.spark.sql.Row) = r.getAs[Long]("mt") <= dHi
      def userOverlap(r: org.apache.spark.sql.Row) = r.getAs[Long]("mu") <= 63L
      val dateOnly = files.count(dateOverlap)
      val bothDims = files.count(r => dateOverlap(r) && userOverlap(r))
      assert(bothDims < dateOnly,
        s"user-dim pruning did not engage: both=$bothDims date=$dateOnly")
      assert(bothDims > 0)
    }

    it("the writer's key and the q107 audit key agree") {
      val ev = Tables.events(spark, TestSpark.Sf)
      val viaLayout = ev.select(
        ZOrdered.zKeyFor(col("user_id"), col("ts"),
          Events.ZUserCell, Events.ZEpochUs).as("zkey"))
        .groupBy("zkey").count()
      val viaAudit = Events.zOrderCellMapFrom(ev)
        .select(col("zkey"), col("n_rows").as("count"))
      assert(viaLayout.exceptAll(viaAudit).count() == 0)
      assert(viaAudit.exceptAll(viaLayout).count() == 0)
    }
  }
}
