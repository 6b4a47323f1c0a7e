package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

import graft.TestSpark
import graft.operators.Events

class EventStreamSpec extends AnyFunSpec {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf

  describe("windowedRates under Trigger.AvailableNow") {
    it("matches batch q27 for all watermark-closed windows") {
      EventStream.runAvailableNow(spark, sf, "stream_q27")
      val streamed = spark.table("stream_q27")
        .select("window_start", "event_type", "n_events", "sum_value")
      val batch = Events.eventWindows(spark, sf)
        .select("window_start", "event_type", "n_events", "sum_value")

      // Append mode only emits windows the watermark has closed: every
      // streamed row must match batch exactly...
      assert(streamed.exceptAll(batch).count() == 0)
      // ...and anything batch-only must sit inside the final watermark
      // horizon (window end + 10 min lateness > max event time).
      val maxTs = graft.sources.Tables.events(spark, sf)
        .agg(max("ts")).collect()(0).getTimestamp(0)
      val horizon = new java.sql.Timestamp(
        maxTs.getTime - (10 * 60 + 5 * 60) * 1000L)
      val missing = batch.exceptAll(streamed)
      assert(missing.filter(col("window_start") <= horizon).count() == 0)
      assert(missing.count() <= 8) // at most the trailing unflushed windows
    }
  }

  describe("streamedBurstAlerts (q187)") {
    it("a drained run equals the batch hour-bucket alert set inside the horizon") {
      val streamed = EventStream.streamedBurstAlerts(spark, sf).collect().toSeq
      val ev = graft.sources.Tables.events(spark, sf)
      val maxUs = ev.agg(max(unix_micros(col("ts")))).collect()(0).getLong(0)
      val wmUs = (maxUs / 1000 - 10L * 60 * 1000) * 1000
      val batch = ev
        .groupBy(window(col("ts"), "1 hour").as("win"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .filter(col("n_events") >= EventStream.StreamBurstPerHour)
        .select(col("win.start").as("hour_start"), col("user_id"),
          col("n_events"))
        .filter(unix_micros(col("hour_start")) + 3600L * 1000000 < wmUs)
        .orderBy("hour_start", "user_id").collect().toSeq
      assert(streamed == batch)
    }

    it("a planted burst alerts; sub-threshold users stay silent") {
      import spark.implicits._
      val dir = java.nio.file.Files
        .createTempDirectory("graft-q187-").toString
      def e(id: Long, t: String, u: Long) =
        (id, java.sql.Timestamp.valueOf(t), u, "click", 1.0, "{}")
      val rows =
        (1 to 5).map(i => e(i, s"2024-01-05 10:1$i:00", 1L)) ++
        Seq(e(6, "2024-01-05 10:20:00", 2L), e(7, "2024-01-05 10:40:00", 2L),
          // watermark anchor far past the burst hour
          e(8, "2024-01-10 00:00:00", 3L))
      // the source expects a FILE named events.parquet (the fixture
      // layout), not a Spark output directory
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/_stage")
      val part = new java.io.File(s"$dir/_stage").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$dir/events.parquet"))
      val r = EventStream.streamedBurstAlerts(spark, dir).collect()
      assert(r.map(x => (x.getAs[java.sql.Timestamp]("hour_start").toString,
        x.getAs[Long]("user_id"), x.getAs[Long]("n_events"))).toSeq ==
        Seq(("2024-01-05 10:00:00.0", 1L, 5L)))
    }
  }

  describe("streamedDedupRates (q79)") {
    it("planted replays vanish: the duplicated stream equals the clean one") {
      val clean = EventStream.streamedRates(spark, sf).collect().toSeq
      val deduped = EventStream.streamedDedupRates(spark, sf).collect().toSeq
      assert(clean.nonEmpty)
      assert(deduped == clean,
        "replayed event_ids must be dropped by dropDuplicatesWithinWatermark")
    }
  }

  describe("streamedSessions (q86)") {
    it("a drained run equals the lag/cumsum sessionization inside the horizon") {
      val streamed = EventStream.streamedSessions(spark, sf)

      // Batch twin mirroring the DuckDB oracle: lag marks gap starts, a
      // running sum numbers sessions, then the shared horizon filter
      // keeps only sessions whose close instant (end + gap) sits
      // strictly inside the final watermark.
      import org.apache.spark.sql.expressions.Window
      val gapUs = Sessionize.GapMinutes * 60 * 1000000L
      val ev = graft.sources.Tables.events(spark, sf)
        .select(col("user_id"), col("ts"), col("value"), col("event_id"))
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val numbered = ev
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .withColumn("new_s", when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > gapUs, 1)
          .otherwise(0))
        .withColumn("sess_no", sum("new_s")
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val sessions = numbered.groupBy("user_id", "sess_no")
        .agg(min("ts").as("session_start"), max("ts").as("session_end"),
          count(lit(1)).cast("int").as("n_events"),
          round(sum("value"), 2).as("sum_value"))
      val maxUs = ev.agg(max(unix_micros(col("ts")))).collect()(0).getLong(0)
      val wmMs = maxUs / 1000 - 10 * 60 * 1000L
      val batch = sessions
        .filter(unix_millis(col("session_end")) +
          Sessionize.GapMinutes * 60000L < wmMs)
        .select("user_id", "session_start", "session_end",
          "n_events", "sum_value")

      assert(streamed.count() > 0)
      assert(streamed.exceptAll(batch).count() == 0,
        "streamed session not in batch reference")
      assert(batch.exceptAll(streamed).count() == 0,
        "horizon-closed batch session missing from the drained stream")
    }
  }

  describe("purchaseClickJoin (streaming twin of batch q40)") {
    it("a drained run emits exactly the batch inner-join pairs") {
      EventStream.runIntervalJoin(spark, sf, "stream_q40")
      val streamed = spark.table("stream_q40")

      val ev = graft.sources.Tables.events(spark, sf)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
          col("value").as("c_value"))
      val batch = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
        .join(clicks,
          col("c_user") === col("user_id") &&
            col("c_ts") >= col("ts") - expr("INTERVAL 10 MINUTES") &&
            col("c_ts") < col("ts"))
        .select("event_id", "user_id", "ts", "c_ts", "c_value")

      assert(streamed.count() > 0)
      assert(streamed.exceptAll(batch).count() == 0)
      assert(batch.exceptAll(streamed).count() == 0)
    }
  }

  describe("streamedLeftJoin (q93)") {
    it("emits matched AND null-augmented purchases inside the horizon") {
      val streamed = EventStream.streamedLeftJoin(spark, sf)

      val ev = graft.sources.Tables.events(spark, sf)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
          col("value").as("c_value"))
      val maxUs = ev.agg(max(unix_micros(col("ts")))).collect()(0).getLong(0)
      val wmMs = maxUs / 1000 - 10 * 60 * 1000
      val batch = ev.filter(col("event_type") === "purchase")
        .filter(unix_millis(col("ts")) + 2 * 10 * 60 * 1000 < wmMs)
        .select(col("event_id"), col("user_id"), col("ts"))
        .join(clicks,
          col("c_user") === col("user_id") &&
            col("c_ts") >= col("ts") - expr("INTERVAL 10 MINUTES") &&
            col("c_ts") < col("ts"),
          "leftOuter")
        .select("event_id", "user_id", "ts", "c_ts", "c_value")

      // the outer rows are the point of the operator: some purchases
      // must have no prior click in-window
      assert(streamed.filter(col("c_ts").isNull).count() > 0)
      assert(streamed.exceptAll(batch).count() == 0,
        "streamed row not in the batch left join")
      assert(batch.exceptAll(streamed).count() == 0,
        "horizon-inside batch row missing from the drained stream")
    }
  }

  describe("streamedTopK (q65)") {
    it("a drained complete-mode run equals the batch window top-k") {
      val streamed = EventStream.streamedTopK(spark, sf)
        .select("user_id", "event_id", "value", "rank")
      import org.apache.spark.sql.expressions.Window
      val rn = row_number().over(Window.partitionBy("user_id")
        .orderBy(desc("value"), asc("event_id")))
      val batch = graft.sources.Tables.events(spark, sf)
        .select(col("user_id"), col("event_id"), col("value"))
        .withColumn("rank", rn).filter(col("rank") <= EventStream.StreamTopK)
      assert(streamed.count() > 0)
      assert(streamed.exceptAll(batch).count() == 0)
      assert(batch.exceptAll(streamed).count() == 0)
      // the bench drains every streaming query twice in one JVM: a
      // re-drain must re-register the sink and produce identical rows
      val again = EventStream.streamedTopK(spark, sf)
        .select("user_id", "event_id", "value", "rank")
      assert(again.collect().toSeq == streamed.collect().toSeq)
    }
  }

  describe("streamedEnrichedRates (q114)") {
    it("tiers cut at the exact spend quartiles") {
      import spark.implicits._
      // totals 1, 2, 3, 4 → median 2.5, p75 3.25
      val ev = Seq(
        (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1L, "view", 1.0, "{}"),
        (2L, java.sql.Timestamp.valueOf("2024-01-01 00:01:00"), 2L, "view", 2.0, "{}"),
        (3L, java.sql.Timestamp.valueOf("2024-01-01 00:02:00"), 3L, "view", 3.0, "{}"),
        (4L, java.sql.Timestamp.valueOf("2024-01-01 00:03:00"), 4L, "view", 4.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      val tiers = EventStream.userTiersFrom(ev).collect()
        .map(r => r.getAs[Long]("user_id") -> r.getAs[String]("tier")).toMap
      assert(tiers == Map(1L -> "low", 2L -> "low", 3L -> "mid", 4L -> "high"))
    }

    it("the drained stream-static join matches the batch tier aggregation") {
      val streamed = EventStream.streamedEnrichedRates(spark, sf)
      val tiers = EventStream.userTiers(spark, sf)
      val batch = Events.eventWindowsFrom(
        graft.sources.Tables.events(spark, sf)
          .join(broadcast(tiers), "user_id")
          .withColumn("event_type", col("tier")))
        .select(col("window_start"), col("event_type").as("tier"),
          col("n_events"), col("sum_value"))
      // streamed is horizon-filtered; every streamed row must appear in
      // the batch aggregation identically
      assert(streamed.exceptAll(batch).count() == 0)
      assert(streamed.count() > 0)
    }

    it("a materialized tier dim (the bench read pattern) drains identically") {
      val tmp = java.nio.file.Files.createTempDirectory("graft-tiers-")
        .resolve("tiers").toString
      EventStream.userTiers(spark, sf).write.parquet(tmp)
      val staged = EventStream.streamedEnrichedRatesOf(
        spark, sf, spark.read.parquet(tmp))
      val self = EventStream.streamedEnrichedRates(spark, sf)
      assert(staged.collect().toSeq == self.collect().toSeq)
    }
  }
}
