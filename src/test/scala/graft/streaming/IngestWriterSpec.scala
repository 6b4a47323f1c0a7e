package graft.streaming

import java.io.File

import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

import graft.TestSpark
import graft.sources.{Partitioned, Tables}

class IngestWriterSpec extends AnyFunSpec {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf
  private val base = "/dev/shm/graft-test-ingest"

  private def rm(p: File): Unit = {
    if (p.isDirectory) p.listFiles.foreach(rm)
    p.delete(); ()
  }

  private def dayDirs(path: String): Array[File] =
    new File(path).listFiles.filter(_.getName.startsWith("event_date="))

  private def parquets(d: File): Int =
    d.listFiles.count(f => f.getName.endsWith(".parquet"))

  describe("streaming ingest into the partitioned layout (the write path)") {
    it("lands the stream day-partitioned, exactly-once under re-drain") {
      rm(new File(base))
      val src = EventStream.source(spark, sf).repartition(2)
      IngestWriter.start(src, s"$base/layout", s"$base/ck").awaitTermination()
      val total = Tables.events(spark, sf).count()
      assert(spark.read.parquet(s"$base/layout").count() == total)
      // trickle shape: one file per writer task per day
      val days = dayDirs(s"$base/layout")
      assert(days.length == 30)
      assert(days.forall(parquets(_) == 2), "expected 2 trickle files per day")
      // re-running the drained query must not double-write: the sink's
      // commit log makes the replay a no-op
      IngestWriter.start(src, s"$base/layout", s"$base/ck").awaitTermination()
      assert(spark.read.parquet(s"$base/layout").count() == total)
    }

    it("compaction splits big days and merges trickle files per the q111 arithmetic") {
      // small target → each ~33-row day SPLITS into ceil(n/20) files
      Partitioned.compactEvents(spark, s"$base/layout", s"$base/split", 20L)
      val perDay = spark.read.parquet(s"$base/layout")
        .groupBy("event_date").count().collect()
        .map(r => r.get(0).toString -> r.getLong(1)).toMap
      dayDirs(s"$base/split").foreach { d =>
        val day = d.getName.stripPrefix("event_date=")
        val expect = ((perDay(day) + 19) / 20).toInt
        assert(parquets(d) == expect, s"$day: ${parquets(d)} vs $expect")
      }
      // the split files carry NEAR-DISJOINT user ranges (the in-day
      // z-order): consecutive files by min_user never overlap beyond
      // the boundary user, so a user-range query prunes files within
      // the kept days too
      val spans = spark.read.parquet(s"$base/split")
        .groupBy(col("event_date"), input_file_name().as("f"))
        .agg(min("user_id").as("mn"), max("user_id").as("mx"))
        .collect()
        .groupBy(_.get(0).toString)
      spans.values.foreach { files =>
        val ordered = files.sortBy(_.getAs[Long]("mn"))
        ordered.sliding(2).foreach {
          case Array(a, b) =>
            assert(a.getAs[Long]("mx") <= b.getAs[Long]("mn"),
              s"overlapping user ranges in ${a.get(0)}")
          case _ =>
        }
      }
      // huge target → the two trickle files per day MERGE into one
      Partitioned.compactEvents(spark, s"$base/layout", s"$base/merge", 1000000L)
      assert(dayDirs(s"$base/merge").forall(parquets(_) == 1))
      // rows are intact either way
      val a = spark.read.parquet(s"$base/layout").drop("event_date")
      val b = spark.read.parquet(s"$base/merge").drop("event_date")
      assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
    }
  }
}
