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
}
