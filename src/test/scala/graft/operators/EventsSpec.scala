package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.scalatest.funspec.AnyFunSpec

import graft.TestSpark

class EventsSpec extends AnyFunSpec {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def events(rows: (Long, Timestamp, Long, String, Double, String)*): DataFrame =
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  describe("partitionZoneMap (q101)") {
    it("one row per day partition, scan decision covers exactly the audit range") {
      val zm = Events.partitionZoneMap(spark, TestSpark.Sf).collect()
      // the fixture spans January 2024: one zone row per day
      assert(zm.length == 30)
      assert(zm.map(_.getAs[java.sql.Date]("event_date").toString).distinct.length == 30)
      val scanned = zm.filter(_.getAs[Boolean]("scanned"))
        .map(_.getAs[java.sql.Date]("event_date").toString).sorted
      assert(scanned.sameElements(Seq("2024-01-10", "2024-01-11", "2024-01-12")))
      // zone bounds are consistent: min <= max, counts positive
      zm.foreach { r =>
        assert(r.getAs[Long]("n_rows") > 0)
        assert(!r.getAs[Timestamp]("min_ts").after(r.getAs[Timestamp]("max_ts")))
        assert(r.getAs[Double]("min_value") <= r.getAs[Double]("max_value"))
      }
    }
  }

  describe("eventWindows (q27)") {
    it("assigns rows to tumbling 5-minute windows, boundary exclusive-right") {
      val r = Events.eventWindowsFrom(events(
        (1L, ts("2024-01-01 00:01:00"), 1L, "click", 1.0, "{}"),
        (2L, ts("2024-01-01 00:04:59"), 1L, "click", 2.0, "{}"),
        (3L, ts("2024-01-01 00:05:00"), 1L, "click", 4.0, "{}"))) // next window
        .collect()
      assert(r.length == 2)
      assert(r(0).getAs[Timestamp]("window_start") == ts("2024-01-01 00:00:00"))
      assert(r(0).getAs[Long]("n_events") == 2L)
      assert(r(0).getAs[Double]("sum_value") == 3.0)
      assert(r(0).getAs[Double]("avg_value") == 1.5)
      assert(r(1).getAs[Timestamp]("window_start") == ts("2024-01-01 00:05:00"))
      assert(r(1).getAs[Long]("n_events") == 1L)
    }

    it("separates event types within one window") {
      val r = Events.eventWindowsFrom(events(
        (1L, ts("2024-01-01 00:01:00"), 1L, "click", 1.0, "{}"),
        (2L, ts("2024-01-01 00:02:00"), 1L, "view", 1.0, "{}")))
        .collect()
      assert(r.map(_.getAs[String]("event_type")).toSeq == Seq("click", "view"))
    }
  }

  describe("propStats (q28)") {
    it("extracts k, skips malformed props in avg but counts the row") {
      val r = Events.propStatsFrom(events(
        (1L, ts("2024-01-01 00:01:00"), 1L, "click", 1.0, """{"k": 10}"""),
        (2L, ts("2024-01-01 00:02:00"), 2L, "click", 1.0, """{"k": 30}"""),
        (3L, ts("2024-01-01 00:03:00"), 2L, "click", 1.0, "not-json")))
        .collect()(0)
      assert(r.getAs[Long]("n") == 3L)
      assert(r.getAs[Long]("n_users") == 2L)
      assert(r.getAs[Int]("min_k") == 10)
      assert(r.getAs[Int]("max_k") == 30)
      assert(r.getAs[Double]("avg_k") == 20.0)
    }
  }

  describe("rangeJoinClicks (q40)") {
    import org.apache.spark.sql.functions.{col, count, expr, max}

    it("counts clicks in [ts-10min, ts): boundaries, other users, empty") {
      val r = Events.rangeJoinClicksFrom(events(
        (1L, ts("2024-01-01 00:20:00"), 1L, "purchase", 9.0, "{}"),
        (2L, ts("2024-01-01 00:10:00"), 1L, "click", 1.0, "{}"), // exactly ts-10min: in
        (3L, ts("2024-01-01 00:19:59"), 1L, "click", 2.0, "{}"), // in
        (4L, ts("2024-01-01 00:20:00"), 1L, "click", 3.0, "{}"), // exactly ts: out
        (5L, ts("2024-01-01 00:09:59"), 1L, "click", 4.0, "{}"), // too early: out
        (6L, ts("2024-01-01 00:15:00"), 2L, "click", 5.0, "{}"), // other user: out
        (7L, ts("2024-01-01 00:30:00"), 3L, "purchase", 9.0, "{}"))) // no clicks
        .collect()
      assert(r.length == 2)
      assert(r(0).getAs[Long]("n_prior_clicks") == 2L)
      assert(r(0).getAs[Double]("max_click_value") == 2.0)
      assert(r(1).getAs[Long]("n_prior_clicks") == 0L)
      assert(r(1).isNullAt(r(1).fieldIndex("max_click_value")))
    }

    it("is row-identical to the naive non-equi join on the sf0.001 fixture") {
      val ev = graft.sources.Tables.events(spark, graft.TestSpark.Sf)
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id").as("u"), col("ts").as("pts"))
      val c = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("cu"), col("ts").as("cts"), col("value").as("cv"))
      val naive = p.join(c,
          col("u") === col("cu") &&
            col("cts") >= col("pts") - expr("INTERVAL 10 MINUTES") &&
            col("cts") < col("pts"), "left")
        .groupBy("event_id", "u", "pts")
        .agg(count(col("cts")).as("n_prior_clicks"),
          max(col("cv")).as("max_click_value"))
        .select(col("event_id"), col("u").as("user_id"), col("pts").as("ts"),
          col("n_prior_clicks"), col("max_click_value"))
      val got = Events.rangeJoinClicks(spark, graft.TestSpark.Sf)
      assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty)
    }
  }

  describe("slidingWindows (q41)") {
    it("puts each event in exactly the two 10-min windows that contain it") {
      val r = Events.slidingWindowsFrom(events(
        (1L, ts("2024-01-01 00:07:00"), 1L, "click", 1.0, "{}")))
        .collect()
      assert(r.map(_.getAs[Timestamp]("window_start")).toSeq ==
        Seq(ts("2024-01-01 00:00:00"), ts("2024-01-01 00:05:00")))
      assert(r.forall(_.getAs[Long]("n_events") == 1L))
    }

    it("a slide-boundary event belongs to the window starting at it") {
      val r = Events.slidingWindowsFrom(events(
        (1L, ts("2024-01-01 00:05:00"), 1L, "click", 2.5, "{}")))
        .collect()
      assert(r.map(_.getAs[Timestamp]("window_start")).toSeq ==
        Seq(ts("2024-01-01 00:00:00"), ts("2024-01-01 00:05:00")))
      assert(r.forall(_.getAs[Double]("sum_value") == 2.5))
    }
  }

  describe("topEventPerUser (q29)") {
    it("takes the highest value, tie-broken by earliest ts then id") {
      val r = Events.topEventPerUserFrom(events(
        (1L, ts("2024-01-01 00:01:00"), 1L, "click", 5.0, "{}"),
        (2L, ts("2024-01-01 00:02:00"), 1L, "view", 9.0, "{}"),
        (3L, ts("2024-01-01 00:03:00"), 2L, "view", 7.0, "{}"),
        (4L, ts("2024-01-01 00:04:00"), 2L, "click", 7.0, "{}"))) // tie on value
        .collect()
      assert(r.length == 2)
      assert(r(0).getAs[Long]("event_id") == 2L)
      assert(r(1).getAs[Long]("event_id") == 3L) // earlier ts wins the tie
    }
  }

  describe("valueWindows (q72)") {
    it("computes running totals, centered moving averages, and rank stats") {
      val evs = (1 to 5).map(i =>
        (i.toLong, ts(s"2024-01-01 00:0$i:00"), 1L, "view", i.toDouble, "{}"))
      val r = Events.valueWindowsFrom(events(evs: _*)).collect()
      assert(r.map(_.getAs[Double]("run_total")).toSeq == Seq(1.0, 3.0, 6.0, 10.0, 15.0))
      assert(r(0).getAs[Double]("mov_avg") == 2.5) // rows 1..4
      assert(r(2).getAs[Double]("mov_avg") == 3.0) // full 5-row frame
      assert(r.map(_.getAs[Int]("quartile")).toSeq == Seq(1, 1, 2, 3, 4))
      assert(r.map(_.getAs[Double]("cum_dist")).toSeq == Seq(0.2, 0.4, 0.6, 0.8, 1.0))
    }
  }

  describe("funnel (q64)") {
    it("requires strict stage ordering per user") {
      val r = Events.funnelFrom(events(
        // user 1: full ordered funnel
        (1L, ts("2024-01-01 00:01:00"), 1L, "view", 0.0, "{}"),
        (2L, ts("2024-01-01 00:02:00"), 1L, "click", 0.0, "{}"),
        (3L, ts("2024-01-01 00:03:00"), 1L, "purchase", 0.0, "{}"),
        // user 2: click BEFORE the first view — click stage not reached
        (4L, ts("2024-01-01 00:01:00"), 2L, "click", 0.0, "{}"),
        (5L, ts("2024-01-01 00:02:00"), 2L, "view", 0.0, "{}"),
        // user 3: view only
        (6L, ts("2024-01-01 00:01:00"), 3L, "view", 0.0, "{}"),
        // user 4: purchase with no view — nothing reached
        (7L, ts("2024-01-01 00:01:00"), 4L, "purchase", 0.0, "{}")))
        .collect()(0)
      assert(r.getAs[Long]("n_users") == 4L)
      assert(r.getAs[Long]("n_view") == 3L)
      assert(r.getAs[Long]("n_click") == 1L)
      assert(r.getAs[Long]("n_purchase") == 1L)
      assert(r.getAs[Double]("view_to_click") == 0.333333333)
      assert(r.getAs[Double]("click_to_purchase") == 1.0)
    }

    it("a purchase at the same instant as the click does not count (strict >)") {
      val r = Events.funnelFrom(events(
        (1L, ts("2024-01-01 00:01:00"), 1L, "view", 0.0, "{}"),
        (2L, ts("2024-01-01 00:02:00"), 1L, "click", 0.0, "{}"),
        (3L, ts("2024-01-01 00:02:00"), 1L, "purchase", 0.0, "{}")))
        .collect()(0)
      assert(r.getAs[Long]("n_click") == 1L)
      assert(r.getAs[Long]("n_purchase") == 0L)
    }
  }

  describe("cusumDrift (q163)") {
    it("accumulates gap-filled residuals and flags both drift directions") {
      // type b over 4 days: counts 1, (absent→0), 1, 13; total 15,
      // residual r = 4c−15 → −11, −15, −11, 37; cum −11, −26, −37, 0.
      // up-CUSUM 0,0,0,37 (37 > 2·15 → drift_up on day 4);
      // down-CUSUM 11,26,37,0 (37 > 30 → drift_dn on day 3).
      // type a: 3 events every day → zero residuals, no flags.
      def e(id: Long, day: String, tpe: String) =
        (id, ts(s"2024-01-0$day 10:00:00"), 1L, tpe, 1.0, "{}")
      var id = 0L
      def n(day: String, tpe: String, k: Int) =
        Seq.fill(k) { id += 1; e(id, day, tpe) }
      val r = Events.cusumDriftFrom(events(
        (n("1", "b", 1) ++ n("3", "b", 1) ++ n("4", "b", 13) ++
          Seq("1", "2", "3", "4").flatMap(d => n(d, "a", 3))): _*))
        .collect()
      val b = r.filter(_.getAs[String]("event_type") == "b")
      assert(b.map(_.getAs[Long]("n_events")).toSeq == Seq(1L, 0L, 1L, 13L))
      assert(b.map(_.getAs[Long]("r")).toSeq == Seq(-11L, -15L, -11L, 37L))
      assert(b.map(_.getAs[Long]("cusum_up")).toSeq == Seq(0L, 0L, 0L, 37L))
      assert(b.map(_.getAs[Long]("cusum_dn")).toSeq == Seq(11L, 26L, 37L, 0L))
      assert(b.map(_.getAs[Boolean]("drift_up")).toSeq ==
        Seq(false, false, false, true))
      assert(b.map(_.getAs[Boolean]("drift_dn")).toSeq ==
        Seq(false, false, true, false))
      val a = r.filter(_.getAs[String]("event_type") == "a")
      assert(a.forall(_.getAs[Long]("r") == 0L))
      assert(a.forall(x => !x.getAs[Boolean]("drift_up") &&
        !x.getAs[Boolean]("drift_dn")))
    }
  }

  describe("userDayGapfill (q104)") {
    it("densifies every user to the full corpus horizon with zero-fill") {
      val r = Events.userDayGapfillFrom(events(
        (1L, ts("2024-01-01 10:00:00"), 1L, "view", 2.0, "{}"),
        (2L, ts("2024-01-04 10:00:00"), 1L, "view", 3.0, "{}"),
        (3L, ts("2024-01-04 11:00:00"), 1L, "view", 4.0, "{}"),
        (4L, ts("2024-01-02 10:00:00"), 2L, "view", 5.0, "{}")))
        .collect()
      // horizon = Jan 1..4 → 4 days × 2 users
      assert(r.length == 8)
      val u1 = r.filter(_.getAs[Long]("user_id") == 1L)
        .sortBy(_.getAs[java.sql.Date]("day").toString)
      assert(u1.map(_.getAs[Long]("n_events")).toSeq == Seq(1L, 0L, 0L, 2L))
      assert(u1.map(_.getAs[Double]("sum_value")).toSeq == Seq(2.0, 0.0, 0.0, 7.0))
      // trailing 7-day count accumulates across the zero-filled gap
      assert(u1.map(_.getAs[Long]("n_7d")).toSeq == Seq(1L, 1L, 1L, 3L))
      val u2 = r.filter(_.getAs[Long]("user_id") == 2L)
        .sortBy(_.getAs[java.sql.Date]("day").toString)
      assert(u2.map(_.getAs[Long]("n_events")).toSeq == Seq(0L, 1L, 0L, 0L))
    }

    it("the rolling frame is exactly 7 calendar days once dense") {
      val rows = (0 until 10).map(d =>
        (d.toLong, ts(f"2024-01-${d + 1}%02d 00:00:00"), 1L, "view", 1.0, "{}"))
      val r = Events.userDayGapfillFrom(events(rows: _*))
        .collect().sortBy(_.getAs[java.sql.Date]("day").toString)
      // one event/day → n_7d saturates at 7 from day 7 on
      assert(r.map(_.getAs[Long]("n_7d")).toSeq ==
        Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 7L, 7L, 7L))
    }
  }

  describe("zOrderCellMap (q107)") {
    it("interleaves (user cell, day cell) into the Morton key") {
      val r = Events.zOrderCellMapFrom(events(
        // (user 0, day 0) → cell (0,0), zkey 0
        (1L, ts("2024-01-01 05:00:00"), 0L, "view", 1.0, "{}"),
        // (user 8, day 0) → cell (1,0): spread(1)*2 = 2
        (2L, ts("2024-01-01 06:00:00"), 8L, "view", 1.0, "{}"),
        // (user 0, day 1) → cell (0,1): spread(1) = 1
        (3L, ts("2024-01-02 06:00:00"), 0L, "view", 1.0, "{}"),
        // (user 9, day 3) → cell (1,3): 2*spread(1) + spread(3) = 2 + 5
        (4L, ts("2024-01-04 06:00:00"), 9L, "view", 1.0, "{}")))
        .collect()
      assert(r.map(_.getAs[Long]("zkey")).toSeq == Seq(0L, 1L, 2L, 7L))
    }

    it("the scan decision prunes on BOTH dimensions") {
      val r = Events.zOrderCellMapFrom(events(
        // user in range, date in range → scanned
        (1L, ts("2024-01-11 00:00:00"), 20L, "view", 1.0, "{}"),
        // user in range, date out of range → skipped
        (2L, ts("2024-01-20 00:00:00"), 20L, "view", 1.0, "{}"),
        // date in range, user out of range → skipped (a date-partitioned
        // layout would scan this one — the point of the z-layout)
        (3L, ts("2024-01-11 00:00:00"), 120L, "view", 1.0, "{}")))
        .collect()
      assert(r.length == 3) // three distinct cells
      val scanned = r.filter(_.getAs[Boolean]("scanned"))
      assert(scanned.length == 1)
      assert(scanned(0).getAs[Long]("min_user") == 20L)
      assert(scanned(0).getAs[Timestamp]("min_ts") == ts("2024-01-11 00:00:00"))
    }
  }

  describe("sessionOverlap (q109)") {
    it("scores overlapping sessions of different users once, with exact seconds") {
      val r = Events.sessionOverlapFrom(events(
        // u1 session [00:00, 00:10], trailing session at 02:00 (dropped)
        (1L, ts("2024-01-01 00:00:00"), 1L, "view", 1.0, "{}"),
        (2L, ts("2024-01-01 00:10:00"), 1L, "view", 1.0, "{}"),
        (3L, ts("2024-01-01 02:00:00"), 1L, "view", 1.0, "{}"),
        // u2 session [00:05, 00:20] → overlap [00:05, 00:10] = 300 s
        (4L, ts("2024-01-01 00:05:00"), 2L, "view", 1.0, "{}"),
        (5L, ts("2024-01-01 00:20:00"), 2L, "view", 1.0, "{}"),
        (6L, ts("2024-01-01 03:00:00"), 2L, "view", 1.0, "{}"),
        // u3's only closed session is far away → no pair
        (7L, ts("2024-01-01 10:00:00"), 3L, "view", 1.0, "{}"),
        (8L, ts("2024-01-01 12:00:00"), 3L, "view", 1.0, "{}")))
        .collect()
      assert(r.length == 1)
      assert(r(0).getAs[Long]("user_a") == 1L && r(0).getAs[Long]("user_b") == 2L)
      assert(r(0).getAs[Long]("n_overlaps") == 1L)
      assert(r(0).getAs[Double]("overlap_sec") == 300.0)
    }

    it("a session spanning several bins still counts each pair once") {
      val r = Events.sessionOverlapFrom(events(
        // u1 session [00:00, 02:30] spans bins 0,1,2 (60-min bins)
        (1L, ts("2024-01-01 00:00:00"), 1L, "view", 1.0, "{}"),
        (2L, ts("2024-01-01 00:20:00"), 1L, "view", 1.0, "{}"),
        (3L, ts("2024-01-01 00:45:00"), 1L, "view", 1.0, "{}"),
        (4L, ts("2024-01-01 01:10:00"), 1L, "view", 1.0, "{}"),
        (5L, ts("2024-01-01 01:40:00"), 1L, "view", 1.0, "{}"),
        (6L, ts("2024-01-01 02:05:00"), 1L, "view", 1.0, "{}"),
        (7L, ts("2024-01-01 02:30:00"), 1L, "view", 1.0, "{}"),
        (8L, ts("2024-01-01 09:00:00"), 1L, "view", 1.0, "{}"),
        // u2 session [00:30, 01:30] shares bins 0 AND 1 with u1's
        (9L, ts("2024-01-01 00:30:00"), 2L, "view", 1.0, "{}"),
        (10L, ts("2024-01-01 01:00:00"), 2L, "view", 1.0, "{}"),
        (11L, ts("2024-01-01 01:30:00"), 2L, "view", 1.0, "{}"),
        (12L, ts("2024-01-01 09:00:00"), 2L, "view", 1.0, "{}")))
        .collect()
      assert(r.length == 1)
      // overlap [00:30, 01:30] = 3600 s, counted exactly once despite
      // the double bin match
      assert(r(0).getAs[Long]("n_overlaps") == 1L)
      assert(r(0).getAs[Double]("overlap_sec") == 3600.0)
    }
  }

  describe("seasonalAnomaly (q116)") {
    it("flags >=50% deviations from the day-of-week mean, not raw volume") {
      // three Mondays for one type: 2, 2, 8 events → dow mean 4
      val rows = Seq(("2024-01-01", 2), ("2024-01-08", 2), ("2024-01-15", 8))
        .flatMap { case (day, n) => (0 until n).map(i =>
          (day.hashCode.toLong * 100 + i, ts(s"$day 0$i:00:00"), 1L, "click", 1.0, "{}")) }
      val r = Events.seasonalAnomalyFrom(events(rows: _*)).collect()
      assert(r.length == 3)
      assert(r.forall(_.getAs[Double]("dow_mean") == 4.0))
      assert(r.forall(_.getAs[Int]("dow") == 1)) // Monday, Sunday=0
      val flags = r.map(x =>
        x.getAs[java.sql.Date]("day").toString -> x.getAs[Boolean]("is_anomaly")).toMap
      // 8 > 1.5×4 → anomaly; 2 = exactly 0.5×4 → strict compare keeps it
      assert(flags == Map("2024-01-01" -> false, "2024-01-08" -> false,
        "2024-01-15" -> true))
    }
  }

  describe("conversionPaths (q117)") {
    it("mines the ordered preceding-event path per purchase, nulls dropped") {
      val r = Events.conversionPathsFrom(events(
        (1L, ts("2024-01-01 00:00:00"), 1L, "view", 1.0, "{}"),
        (2L, ts("2024-01-01 00:01:00"), 1L, "click", 1.0, "{}"),
        (3L, ts("2024-01-01 00:02:00"), 1L, "purchase", 1.0, "{}"),
        // purchase with NO prior events → empty path
        (4L, ts("2024-01-01 00:00:00"), 2L, "purchase", 1.0, "{}"),
        // 4 prior events → only the last 3 appear
        (5L, ts("2024-01-01 00:00:00"), 3L, "view", 1.0, "{}"),
        (6L, ts("2024-01-01 00:01:00"), 3L, "view", 1.0, "{}"),
        (7L, ts("2024-01-01 00:02:00"), 3L, "click", 1.0, "{}"),
        (8L, ts("2024-01-01 00:03:00"), 3L, "view", 1.0, "{}"),
        (9L, ts("2024-01-01 00:04:00"), 3L, "purchase", 1.0, "{}")))
        .collect()
      val m = r.map(x =>
        x.getAs[String]("path") -> x.getAs[Long]("n_purchases")).toMap
      assert(m == Map("view>click" -> 1L, "" -> 1L, "view>click>view" -> 1L))
    }
  }

  describe("imputeAudit (q127)") {
    it("reports the per-type median fill and an exact holdout MAE") {
      val r = Events.imputeAudit(spark, TestSpark.Sf).collect()
      assert(r.length == 5)
      r.foreach { x =>
        val n = x.getAs[Long]("n")
        val masked = x.getAs[Long]("n_masked")
        assert(masked > 0 && masked < n)
        // ~1 in 10 of each type is held out
        assert(math.abs(masked.toDouble / n - 1.0 / Events.ImputeMod) < 0.05)
        assert(x.getAs[Double]("mae") >= 0.0)
        assert(!x.getAs[Double]("fill_value").isNaN)
      }
    }
  }

  describe("slidingDistinct (q125)") {
    it("a user active on two days inside one window counts once") {
      val r = Events.slidingDistinctFrom(events(
        (1L, ts("2024-01-01 00:00:00"), 1L, "view", 1.0, "{}"),
        (2L, ts("2024-01-03 00:00:00"), 1L, "view", 1.0, "{}"),
        (3L, ts("2024-01-03 00:00:00"), 2L, "view", 1.0, "{}")))
        .collect()
      val m = r.map(x => x.getAs[java.sql.Date]("win_end").toString ->
        x.getAs[Long]("n_users_7d")).toMap
      // windows ending Jan 3..7 contain both days: user 1 once + user 2
      (3 to 7).foreach(d => assert(m(f"2024-01-0$d") == 2L))
      // windows ending Jan 1..2 contain only day 1 (user 1 alone)
      assert(m("2024-01-01") == 1L && m("2024-01-02") == 1L)
      // trailing windows past day 3 still carry day-3 activity to Jan 9
      assert(m("2024-01-09") == 2L)
    }
  }

  describe("compactionPlan (q111)") {
    it("bins partitions into contiguous output groups by running total") {
      val d = Seq(
        ("2024-01-01", 1500), ("2024-01-02", 1500), ("2024-01-03", 500),
        ("2024-01-04", 2500))
        .flatMap { case (day, n) => (0 until n).map(i =>
          (i.toLong, ts(s"$day 00:00:00"), 1L, "view", 1.0, "{}")) }
      val r = Events.compactionPlanFrom(
        events(d: _*).withColumn(
          "event_date", org.apache.spark.sql.functions.to_date(
            org.apache.spark.sql.functions.col("ts"))))
        .collect()
      // cum-before: 0, 1500, 3000, 3500 → groups 0, 0, 1, 1
      assert(r.map(_.getAs[Long]("out_group")).toSeq == Seq(0L, 0L, 1L, 1L))
      assert(r.map(_.getAs[Long]("group_rows")).toSeq ==
        Seq(3000L, 3000L, 3000L, 3000L))
      assert(r.map(_.getAs[Long]("group_days")).toSeq == Seq(2L, 2L, 2L, 2L))
    }
  }

  describe("slidingSketch (q151)") {
    it("the partial merge is bit-identical to sketching each window's raws directly") {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      val ev = graft.sources.Tables.events(spark, TestSpark.Sf)
      val viaPartials = Events.slidingSketchFrom(ev)
        .select("event_type", "win_end", "n_k", "kth_min")
        .collect()
        .map(r => (r.getString(0), r.getDate(1).toString) ->
          (r.getLong(2), r.getLong(3))).toMap
      // direct sketch: rank the window's raw day-distinct hashes with
      // no per-day partial stage at all
      val h = graft.functions.TextFns.hash60(
        concat(lit("sw|"), col("user_id").cast("string")))
      val direct = ev
        .select(col("event_type"), col("ts").cast("date").as("day"), h.as("h"))
        .distinct()
        .select(col("event_type"),
          explode(sequence(col("day"), date_add(col("day"), 6),
            expr("interval 1 day"))).as("win_end"), col("h"))
        .distinct()
        .withColumn("rn", row_number().over(
          Window.partitionBy("event_type", "win_end").orderBy("h")))
        .filter(col("rn") <= Events.SwK)
        .groupBy("event_type", "win_end")
        .agg(count(lit(1)).as("n_k"), max("h").as("kth_min"))
        .collect()
        .map(r => (r.getString(0), r.getDate(1).toString) ->
          (r.getLong(2), r.getLong(3))).toMap
      assert(viaPartials == direct)
    }

    it("estimate equals the exact count below sketch saturation and windows line up with q125") {
      val sk = Events.slidingSketch(spark, TestSpark.Sf).collect()
      val ex = Events.slidingDistinct(spark, TestSpark.Sf).collect()
        .map(r => (r.getString(0), r.getDate(1).toString) -> r.getLong(2)).toMap
      assert(sk.nonEmpty)
      sk.foreach { r =>
        val key = (r.getString(0), r.getDate(1).toString)
        val nExact = r.getAs[Long]("n_exact_7d")
        val nK = r.getAs[Long]("n_k")
        val est = r.getAs[Double]("est_7d")
        // same window grid as q125, and (no hash collisions at this sf)
        // the gauge column equals q125's exact distinct
        assert(ex(key) == nExact)
        if (nK < Events.SwK) assert(est == nExact.toDouble)
        else assert(est > 0.0 && nK == Events.SwK.toLong)
      }
      assert(sk.map(r => (r.getString(0), r.getDate(1).toString)).toSet ==
        ex.keySet)
    }
  }

  describe("eventDisorder (q174)") {
    it("measures per-user out-of-order delays against the ingest sequence") {
      // user 1 (clicks), ingest order = event_id: ts 10:00, 10:05,
      // 10:03 (2 min late), 09:50 (15 min late vs the 10:05 high-water)
      // user 2 (purchases): perfectly ordered
      val r = Events.eventDisorderFrom(events(
          (1, ts("2024-01-01 10:00:00"), 1L, "click", 1.0, "{}"),
          (2, ts("2024-01-01 10:05:00"), 1L, "click", 1.0, "{}"),
          (3, ts("2024-01-01 10:03:00"), 1L, "click", 1.0, "{}"),
          (4, ts("2024-01-01 09:50:00"), 1L, "click", 1.0, "{}"),
          (5, ts("2024-01-01 10:00:00"), 2L, "purchase", 1.0, "{}"),
          (6, ts("2024-01-01 10:01:00"), 2L, "purchase", 1.0, "{}")))
        .collect().map(x => x.getAs[String]("event_type") -> x).toMap
      val c = r("click")
      assert(c.getAs[Long]("n_events") == 4L)
      assert(c.getAs[Long]("n_disordered") == 2L)
      assert(c.getAs[Long]("n_late_1s") == 2L) // both delays exceed 1 s
      assert(c.getAs[Long]("n_late_60s") == 2L) // 120 s and 900 s
      assert(c.getAs[Long]("n_late_600s") == 1L) // only the 900 s one
      assert(c.getAs[Long]("max_delay_us") == 900L * 1000000L)
      assert(c.getAs[Double]("disorder_rate") == 0.5)
      val p = r("purchase")
      assert(p.getAs[Long]("n_disordered") == 0L &&
        p.getAs[Long]("max_delay_us") == 0L)
    }

    it("delays are measured within a user, not across users") {
      // user 2's early event lands AFTER user 1's late one in the
      // ingest sequence but is not late relative to user 1's clock
      val r = Events.eventDisorderFrom(events(
          (1, ts("2024-01-01 12:00:00"), 1L, "click", 1.0, "{}"),
          (2, ts("2024-01-01 08:00:00"), 2L, "click", 1.0, "{}")))
        .collect()
      assert(r.head.getAs[Long]("n_disordered") == 0L)
    }
  }

  describe("botAudit (q181)") {
    it("segments cadence bots, burst bots, and humans") {
      var id = 0L
      def ev(user: Long, t: String) = {
        id += 1; (id, ts(t), user, "click", 1.0, "{}")
      }
      val rows =
        // user 1: 10 events 61m1s apart — median gap 3661 s (fast),
        // never more than 1 event per hour (no burst)
        (0 until 10).map(i => ev(1L, f"2024-01-0${1 + (i * 3661) / 86400}%d " +
          f"${((i * 3661) % 86400) / 3600}%02d:${((i * 3661) % 3600) / 60}%02d:${(i * 3661) % 60}%02d")) ++
        // user 2: 5 events in one hour (burst) but n < BotMinEvents,
        // so the fast leg cannot fire despite tiny gaps
        (0 until 5).map(i => ev(2L, f"2024-01-01 10:${i * 10}%02d:00")) ++
        // user 3: 10 events a day apart — plainly human
        (1 to 10).map(d => ev(3L, f"2024-01-$d%02d 09:00:00")) ++
        // user 4: a single event — no gaps, med2 null → human
        Seq(ev(4L, "2024-01-01 12:00:00"))
      val r = Events.botAuditFrom(events(rows: _*)).collect()
        .map(x => x.getAs[String]("verdict") -> x).toMap
      assert(r.keySet == Set("fast_median", "burst", "human"))
      assert(r("fast_median").getAs[Long]("n_users") == 1L)
      assert(r("fast_median").getAs[Long]("n_events") == 10L)
      assert(r("burst").getAs[Long]("n_users") == 1L)
      assert(r("burst").getAs[Long]("n_events") == 5L)
      assert(r("human").getAs[Long]("n_users") == 2L)
      assert(r("human").getAs[Long]("n_events") == 11L)
      assert(r("human").getAs[Double]("event_share") == 11.0 / 26.0)
    }

    it("both legs firing together get the combined verdict") {
      var id = 0L
      def ev(user: Long, t: String) = {
        id += 1; (id, ts(t), user, "click", 1.0, "{}")
      }
      // 10 events 1 s apart: median gap 1 s (fast) AND 10 in one hour
      val rows = (0 until 10).map(i => ev(9L, f"2024-01-01 10:00:$i%02d"))
      val r = Events.botAuditFrom(events(rows: _*)).collect()
      assert(r.map(_.getAs[String]("verdict")).toSeq ==
        Seq("fast_median+burst"))
    }
  }

  describe("nativeSessions (q207)") {
    it("merges events within the gap (touching windows merge), splits past it, ends at last + gap") {
      val r = Events.nativeSessionsFrom(events(
          (1L, ts("2024-01-01 10:00:00"), 7L, "click", 1.0, "{}"),
          (2L, ts("2024-01-01 10:20:00"), 7L, "click", 2.0, "{}"),
          // exactly prev + 30 min: windows TOUCH, so they merge (the
          // same strict-> boundary as q37)
          (3L, ts("2024-01-01 10:50:00"), 7L, "click", 4.0, "{}"),
          // 30 min + 1 s past the previous event: a new session
          (4L, ts("2024-01-01 11:20:01"), 7L, "click", 8.0, "{}"),
          (5L, ts("2024-01-01 23:00:00"), 8L, "buy", 16.0, "{}")))
        .collect().map(x => (x.getAs[Long]("user_id"),
          x.getAs[Timestamp]("session_start").toString,
          x.getAs[Timestamp]("session_end").toString,
          x.getAs[Int]("n_events"), x.getAs[Double]("sum_value")))
      assert(r.toSeq == Seq(
        (7L, "2024-01-01 10:00:00.0", "2024-01-01 11:20:00.0", 3, 7.0),
        (7L, "2024-01-01 11:20:01.0", "2024-01-01 11:50:01.0", 1, 8.0),
        (8L, "2024-01-01 23:00:00.0", "2024-01-01 23:30:00.0", 1, 16.0)))
    }

    it("keeps ALL sessions (batch semantics): more rows than q37's watermark form drops") {
      val native = Events.nativeSessions(spark, TestSpark.Sf).collect()
      val custom = Events.sessions(spark, TestSpark.Sf).collect()
      // q37 drops each user's final open session; batch keeps it
      val users = native.map(_.getAs[Long]("user_id")).distinct.length
      assert(native.length == custom.length + users)
    }
  }

  describe("oofEncoding (q210)") {
    // the operator's fold rule, re-derived (hash32("fold|"+id) % 5)
    def foldOf(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"fold|$id".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.take(8), 16) % Events.OofFolds
    }

    it("each cell's encoding is the mean of the OTHER folds' targets") {
      val rows = (1L to 40L).map(id =>
        (id, ts("2024-01-01 10:00:00"), id, "a", (id % 7).toDouble, "{}"))
      val r = Events.oofEncodingFrom(events(rows: _*)).collect()
        .map(x => x.getAs[Int]("fold") ->
          (x.getAs[Long]("n_fold"), x.getAs[Long]("n_oof"),
            x.getAs[Double]("oof_mean"))).toMap
      def r9(v: Double) =
        BigDecimal(v).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      val byFold = rows.groupBy(e => foldOf(e._1))
      byFold.foreach { case (f, in) =>
        val out = rows.filterNot(e => foldOf(e._1) == f)
        val (nF, nO, enc) = r(f.toInt)
        assert(nF == in.size.toLong && nO == out.size.toLong, s"fold $f sizes")
        // exact decimal sum then one double division, like the operator
        val s = out.map(e => BigDecimal(e._5).setScale(2)).sum
        assert(enc == r9((s.toDouble / out.size)), s"fold $f encoding")
      }
      // no row's own target leaks: each fold's encoding differs from
      // the all-in mean whenever the fold's mass is unbalanced
      val allMean = rows.map(_._5).sum / rows.size
      assert(r.values.exists(v => v._3 != allMean))
    }

    it("covers every (type, fold) cell on the fixture with n_fold + n_oof = n_type") {
      val r = Events.oofEncoding(spark, TestSpark.Sf).collect()
      assert(r.nonEmpty)
      r.groupBy(_.getAs[String]("event_type")).foreach { case (_, cells) =>
        val total = cells.head.getAs[Long]("n_fold") + cells.head.getAs[Long]("n_oof")
        cells.foreach { c =>
          assert(c.getAs[Long]("n_fold") + c.getAs[Long]("n_oof") == total)
          assert(!c.getAs[Double]("oof_mean").isNaN)
        }
        assert(cells.map(_.getAs[Int]("fold")).sorted.toSeq ==
          (0 until Events.OofFolds))
      }
    }
  }

  describe("hllDistinct (q201)") {
    // the operator's hash/bucket/rank math, re-derived independently
    def h60(u: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"hll|$u".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    def rho(h: Long): Int = {
      val w = h >> 6
      if (w == 0L) 55 else 55 - java.lang.Long.toBinaryString(w).length
    }

    it("builds exactly the md5-derived registers and linear-counts the small range") {
      val users = Seq(11L, 22L, 33L, 44L, 55L)
      val rows = users.zipWithIndex.map { case (u, i) =>
        (i.toLong, ts("2024-01-01 10:00:00"), u, "a", 1.0, "{}")
      } :+ (99L, ts("2024-01-01 11:00:00"), 11L, "a", 1.0, "{}") // repeat
      val r = Events.hllDistinctFrom(events(rows: _*)).collect()
        .map(x => x.getAs[String]("event_type") -> x).toMap
      val regs = users.map(h60).groupBy(_ % 64)
        .map { case (b, hs) => b -> hs.map(rho).max }
      val a = r("a")
      assert(a.getAs[Long]("n_exact") == 5L) // the repeat never inflates
      assert(a.getAs[Long]("n_regs") == regs.size.toLong)
      assert(a.getAs[Long]("n_zero_regs") == 64L - regs.size)
      val expected = BigDecimal(64.0 * math.log(64.0 / (64 - regs.size)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(a.getAs[Double]("est_hll") == expected)
      // merging a single type's registers is the identity
      assert(r("ALL").getAs[Double]("est_hll") == a.getAs[Double]("est_hll"))
    }

    it("the ALL row IS the register merge: equals a direct one-type computation") {
      import org.apache.spark.sql.functions.lit
      val ev = graft.sources.Tables.events(spark, TestSpark.Sf)
      val all = Events.hllDistinct(spark, TestSpark.Sf).collect()
        .find(_.getAs[String]("event_type") == "ALL").get
      val z = Events.hllDistinctFrom(ev.withColumn("event_type", lit("z")))
        .collect().find(_.getAs[String]("event_type") == "z").get
      assert(all.getAs[Double]("est_hll") == z.getAs[Double]("est_hll"))
      assert(all.getAs[Long]("n_exact") == z.getAs[Long]("n_exact"))
      assert(all.getAs[Long]("n_regs") == z.getAs[Long]("n_regs"))
    }

    it("estimates within the m=64 error envelope on the fixture") {
      val r = Events.hllDistinct(spark, TestSpark.Sf).collect()
      assert(r.nonEmpty)
      r.foreach { x =>
        assert(x.getAs[Long]("n_regs") <= 64L)
        // 1.04/sqrt(64) = 13% standard error; 3σ guard
        assert(math.abs(x.getAs[Double]("rel_err")) < 0.4,
          s"${x.getAs[String]("event_type")}: rel_err out of envelope")
      }
    }
  }

  describe("lpmEnrich (q247)") {
    // independent reimplementation: per-event md5-derived IP classified
    // by a driver-side scan of the full dim, longest prefix wins
    def md5Ip(e: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"ip|$e".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.take(8), 16)
    }
    def ipv4(d: String): Long =
      d.split('.').foldLeft(0L)((a, o) => (a << 8) | o.toLong)
    val dim = Events.CidrDim.map { case (n, l, lab) =>
      (l, ipv4(n) >>> (32 - l), lab)
    }

    it("matches a brute-force longest-prefix classification") {
      val n = 400
      val events = (1L to n.toLong).map(i =>
        (i, s"t${i % 3}", i % 50, (i % 97) / 10.0))
        .toDF("event_id", "event_type", "user_id", "value")
      val expected = (1L to n.toLong).map { i =>
        val ip = md5Ip(i)
        val (len, _, lab) = dim
          .filter { case (l, k, _) => (ip >> (32 - l)) == k }
          .maxBy { case (l, _, lab) => (l, lab) }
        ((lab, len), (i % 50, math.round((i % 97) / 10.0 * 100)))
      }.groupBy(_._1).map { case ((lab, len), xs) =>
        (lab, len, xs.size.toLong, xs.map(_._2._1).distinct.size.toLong,
          xs.map(_._2._2).sum)
      }.toSeq.sortBy(x => (-x._2, x._1))
      val got = Events.lpmEnrichFrom(events).collect().map(r =>
        (r.getAs[String]("policy"), r.getAs[Int]("prefix_len"),
          r.getAs[Long]("n_events"), r.getAs[Long]("n_users"),
          r.getAs[Long]("cents"))).toSeq
      assert(got == expected)
      assert(got.map(_._3).sum == n) // catch-all /0: every event lands
    }
  }
}
