package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

import graft.TestSpark
import graft.sources.Tables

class TopKPerKeySpec extends AnyFunSpec {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def windowTopK(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.withColumn("rank",
        row_number().over(Window.partitionBy("user_id")
          .orderBy(desc("value"), asc("event_id"))))
      .filter(col("rank") <= k)

  describe("TopKPerKey native operator") {
    it("matches the row_number window formulation on the events table") {
      val events = Tables.events(spark, TestSpark.Sf)
        .select("user_id", "event_id", "event_type", "value")
      val k = 3
      val native = TopKPerKey(events, Seq(col("user_id")),
        Seq(col("value").desc, col("event_id").asc), k)
      val expected = windowTopK(events, k)
      assert(native.columns.toSeq ==
        Seq("user_id", "event_id", "event_type", "value", "rank"))
      val n = native.orderBy("user_id", "rank").collect().toSeq
      val e = expected.orderBy("user_id", "rank").collect().toSeq
      assert(n == e)
    }

    it("keeps whole groups when k exceeds the group size") {
      val df = Seq((1, 10), (1, 20), (2, 5)).toDF("g", "v")
      val out = TopKPerKey(df, Seq(col("g")), Seq(col("v").desc), 10)
        .orderBy("g", "rank").collect()
      assert(out.map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSeq ==
        Seq((1, 20, 1), (1, 10, 2), (2, 5, 1)))
    }

    it("breaks ties deterministically via the tie-break column") {
      val df = Seq((1, 7, "b"), (1, 7, "a"), (1, 7, "c")).toDF("g", "v", "t")
      val out = TopKPerKey(df, Seq(col("g")),
        Seq(col("v").desc, col("t").asc), 2).orderBy("rank").collect()
      assert(out.map(r => (r.getString(2), r.getInt(3))).toSeq ==
        Seq(("a", 1), ("b", 2)))
    }

    it("survives many input partitions (partial pass per partition)") {
      val df = spark.range(0, 10000, 1, 17)
        .select((col("id") % 50).as("g"), col("id").as("v"))
      val out = TopKPerKey(df, Seq(col("g")), Seq(col("v").desc), 2)
      // top-2 of g: ids ≡ g (mod 50) → 9950+g and 9900+g
      val got = out.orderBy("g", "rank")
        .select("g", "v").as[(Long, Long)].collect().toSeq
      val want = (0L until 50L).flatMap(g => Seq((g, 9950 + g), (g, 9900 + g)))
      assert(got == want)
    }

    it("bounds a mega-hot key: map side ships k rows per partition, not the key") {
      // one key holds 1M of 1.01M rows; the partial pass caps its
      // shuffle contribution at k × partitions — the skew story
      val df = spark.range(0, 1010000, 1, 23)
        .select(when(col("id") < 1000000, lit(0L)).otherwise(col("id") % 10 + 1).as("g"),
          col("id").as("v"))
      val out = TopKPerKey(df, Seq(col("g")), Seq(col("v").desc), 2)
        .orderBy("g", "rank").select("g", "v").as[(Long, Long)].collect().toSeq
      val hot = out.filter(_._1 == 0L)
      assert(hot == Seq((0L, 999999L), (0L, 999998L)))
      assert(out.size == 22) // hot key + 10 modular keys, 2 each
    }

    it("plans a partial stage below the exchange and a final above it") {
      val events = Tables.events(spark, TestSpark.Sf)
        .select("user_id", "event_id", "value")
      val plan = TopKPerKey(events, Seq(col("user_id")),
        Seq(col("value").desc, col("event_id").asc), 5)
        .queryExecution.executedPlan.toString
      // partial → exchange → final, top-down in the plan string
      val fin = plan.indexOf("TopKPerKey ")
      val ex = plan.indexOf("Exchange hashpartitioning")
      val part = plan.indexOf("TopKPerKeyPartial")
      assert(fin >= 0 && ex > fin && part > ex, s"unexpected plan:\n$plan")
    }
  }
}
