package graft.streaming

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.scalatest.funspec.AnyFunSpec

import graft.TestSpark
import graft.sources.Tables

class TopKAggSpec extends AnyFunSpec {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // best-first: highest value, then lowest event_id
  private val ord: Ordering[(Long, Double)] =
    Ordering.by[(Long, Double), (Double, Long)](p => (-p._2, p._1))

  describe("TopKAgg typed aggregator") {
    it("matches the window top-k on the events table (batch)") {
      val events = Tables.events(spark, TestSpark.Sf)
        .select($"user_id", $"event_id", $"value")
      val agg = new TopKAgg[(Long, Double)](3)(ord, implicitly)
      val typed = events.as[(Long, Long, Double)]
        .groupByKey(_._1)
        .mapValues(r => (r._2, r._3))
        .agg(agg.toColumn.name("top"))
        .flatMap { case (uid, top) =>
          top.zipWithIndex.map { case ((eid, v), i) => (uid, eid, v, i + 1) }
        }
        .collect().toSet
      val rn = row_number().over(Window.partitionBy("user_id")
        .orderBy(desc("value"), asc("event_id")))
      val windowed = events.withColumn("rank", rn).filter($"rank" <= 3)
        .as[(Long, Long, Double, Int)].collect().toSet
      assert(typed == windowed)
    }

    it("keeps at most k elements in the buffer through reduce and merge") {
      val agg = new TopKAgg[(Long, Double)](2)(ord, implicitly)
      val b = (1L to 100L).foldLeft(agg.zero)((buf, i) =>
        agg.reduce(buf, (i, i.toDouble)))
      assert(b.size == 2)
      val merged = agg.merge(b, agg.reduce(agg.zero, (200L, 1000.0)))
      assert(merged.size == 2)
      assert(agg.finish(merged).head == ((200L, 1000.0)))
    }

    it("computes streaming per-key top-k in complete mode") {
      val dir = "/dev/shm/graft-test-topkagg"
      val fs = org.apache.hadoop.fs.FileSystem
        .getLocal(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(dir), true)
      Seq((1L, 10L, 5.0), (1L, 11L, 9.0), (1L, 12L, 7.0), (2L, 20L, 1.0))
        .toDF("user_id", "event_id", "value")
        .write.mode("overwrite").parquet(s"$dir/in")
      val agg = new TopKAgg[(Long, Double)](2)(ord, implicitly)
      val q = spark.readStream
        .schema("user_id LONG, event_id LONG, value DOUBLE")
        .parquet(s"$dir/in")
        .as[(Long, Long, Double)]
        .groupByKey(_._1)
        .mapValues(r => (r._2, r._3))
        .agg(agg.toColumn.name("top"))
        .writeStream.format("memory").queryName("topk_out")
        .outputMode(OutputMode.Complete)
        .option("checkpointLocation", s"$dir/ckpt")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val out = spark.table("topk_out")
        .as[(Long, Seq[(Long, Double)])].collect().toMap
      assert(out(1L) == Seq((11L, 9.0), (12L, 7.0)))
      assert(out(2L) == Seq((20L, 1.0)))
    }
  }
}
