package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.scalatest.funspec.AnyFunSpec

import graft.TestSpark

class SessionizeSpec extends AnyFunSpec {
  private lazy val spark = TestSpark.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  describe("built-in session_window parity") {
    it("agrees with the custom-state sessionizer on the fixture corpus") {
      // Same gap semantics, two independent implementations: Spark's
      // built-in session_window aggregate vs the flatMapGroupsWithState
      // operator. In batch mode the custom operator drops each user's
      // trailing session (state discarded at end-of-input, the q37 gate
      // contract); the built-in emits it — so custom ⊂ builtin with the
      // difference exactly one (the latest) session per active user.
      val ev = graft.sources.Tables.events(spark, TestSpark.Sf)
        .select(col("user_id"), col("ts"), col("value"), col("event_id"))
      val custom = Sessionize.sessions(ev).toDF()
        .select(col("user_id"), col("session_start"), col("session_end"),
          col("n_events").cast("long").as("n_events"))
      val builtin = ev
        .groupBy(col("user_id"),
          session_window(col("ts"), s"${Sessionize.GapMinutes} minutes").as("w"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"), col("w.start").as("session_start"),
          (col("w.end") - expr(s"INTERVAL ${Sessionize.GapMinutes} MINUTES"))
            .as("session_end"),
          col("n_events"))
      assert(custom.exceptAll(builtin).count() == 0,
        "custom session missing from the built-in aggregate")
      val extra = builtin.exceptAll(custom)
      val nUsers = ev.select("user_id").distinct().count()
      assert(extra.count() == nUsers,
        "built-in should exceed custom by exactly the trailing sessions")
      // and every extra row is its user's LATEST session
      val latest = builtin.groupBy("user_id")
        .agg(max("session_start").as("session_start"))
      assert(extra.join(latest, Seq("user_id", "session_start")).count() == nUsers)
    }
  }

  describe("flatMapGroupsWithState sessionization (streaming)") {
    it("closes sessions on gap and on end-of-stream timeout") {
      import spark.implicits._
      // user 1: two sessions 40 min apart; user 2: one session
      val rows = Seq(
        (1L, ts("2024-01-01 00:00:00"), 1.0),
        (1L, ts("2024-01-01 00:10:00"), 2.0),
        (1L, ts("2024-01-01 00:50:00"), 4.0), // > 30 min gap → new session
        (2L, ts("2024-01-01 01:00:00"), 8.0))
      val dir = "/dev/shm/graft-test-sessionize"
      val fs = org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(dir), true)
      rows.toDF("user_id", "ts", "value").write.mode("overwrite").parquet(s"$dir/in")

      val src = spark.readStream
        .schema("user_id LONG, ts TIMESTAMP, value DOUBLE")
        .parquet(s"$dir/in")
        .withWatermark("ts", "10 minutes")
      val q = Sessionize.sessions(src)
        .writeStream.format("memory").queryName("sessions_out")
        .outputMode(OutputMode.Append)
        .option("checkpointLocation", s"$dir/ckpt")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()

      val out = spark.table("sessions_out")
        .orderBy("user_id", "session_start").collect()
      // The first session of user 1 closes via the in-stream gap. The
      // trailing sessions (user 1's second, user 2's only) stay open until
      // the watermark passes their last+gap — with AvailableNow and no
      // further data, the final watermark determines whether they flush.
      assert(out.nonEmpty)
      val s1 = out(0)
      assert(s1.getAs[Long]("user_id") == 1L)
      assert(s1.getAs[Timestamp]("session_start") == ts("2024-01-01 00:00:00"))
      assert(s1.getAs[Timestamp]("session_end") == ts("2024-01-01 00:10:00"))
      assert(s1.getAs[Int]("n_events") == 2)
      assert(s1.getAs[Double]("sum_value") == 3.0)
    }

    it("computes multi-session batch output equal to a window reference") {
      import spark.implicits._
      // batch mode: flatMapGroupsWithState runs with batch semantics
      // (all data at once, no timeouts needed for gap-based closes)
      val rows = (0 until 50).flatMap { u =>
        Seq(
          (u.toLong, ts("2024-01-01 00:00:00"), 1.0),
          (u.toLong, ts("2024-01-01 00:05:00"), 1.0),
          (u.toLong, ts("2024-01-01 02:00:00"), 1.0))
      }
      val closed = Sessionize.sessions(rows.toDF("user_id", "ts", "value"))
        .collect()
      // gap closes the first session of every user; the second session of
      // each user remains open (no timeout processing in batch) — one
      // closed session per user
      assert(closed.length == 50)
      assert(closed.forall(_.n_events == 2))
      assert(closed.forall(_.sum_value == 2.0))
    }
  }
}
