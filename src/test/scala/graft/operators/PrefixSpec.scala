package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

import graft.TestSpark

/** [[Prefix.cumSums]] must be bit-identical to the single-partition
  * global window it replaces, on every input shape the fine-bucket
  * arithmetic could mishandle: dense grains, clustered/sparse spans,
  * negative keys, multiple counters, empty input.
  */
class PrefixSpec extends AnyFunSpec {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def check(values: Seq[(Long, Long)]): Unit = {
    val df = values.toDF("v", "cnt").repartition(7)
    val got = Prefix.cumSums(df, "v", col("v"), Seq("cnt"), Seq("cum"))
      .select("v", "cum").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val w = Window.orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = df.withColumn("cum", sum("cnt").over(w))
      .select("v", "cum").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == want)
  }

  describe("Prefix.cumSums") {
    it("matches the global window on a dense value grain") {
      check((1L to 500L).map(v => (v, v % 7 + 1)))
    }

    it("matches on clustered + sparse spans (ingest strides, tombstones)") {
      check((0L until 200L).map(i => (i, i + 1)) ++
        (0L until 200L).map(i => (1000000L + 3 * i, 2L)) ++
        Seq((Long.MinValue / 4, 9L), (Long.MaxValue / 4, 9L)))
    }

    it("matches with negative keys") {
      check((-300L to 300L by 7).map(v => (v, 1L)))
    }

    it("matches with a single value") {
      check(Seq((42L, 17L)))
    }

    it("returns the empty relation unchanged") {
      val df = Seq.empty[(Long, Long)].toDF("v", "cnt")
      val r = Prefix.cumSums(df, "v", col("v"), Seq("cnt"), Seq("cum"))
      assert(r.columns.contains("cum") && r.count() == 0)
    }

    it("carries two counters through shared buckets") {
      val df = (1L to 300L).map(v => (v, v % 3, v % 5))
        .toDF("v", "a", "b").repartition(5)
      val got = Prefix.cumSums(df, "v", col("v"),
          Seq("a", "b"), Seq("ca", "cb"))
        .select("v", "ca", "cb").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val w = Window.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val want = df
        .withColumn("ca", sum("a").over(w))
        .withColumn("cb", sum("b").over(w))
        .select("v", "ca", "cb").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == want)
    }

    it("a monotone non-strict key (cents) preserves value order") {
      // doubles sharing a cent bucket must still rank by exact value
      val df = Seq((1.004, 2L), (1.001, 3L), (0.25, 5L), (7.5, 1L))
        .toDF("v", "cnt").repartition(3)
      val got = Prefix.cumSums(df, "v", round(col("v") * 100),
          Seq("cnt"), Seq("cum"))
        .select("v", "cum").collect()
        .map(r => (r.getDouble(0), r.getLong(1))).toMap
      assert(got == Map(0.25 -> 5L, 1.001 -> 8L, 1.004 -> 10L, 7.5 -> 11L))
    }

    it("rejects a key span that would overflow the bucket arithmetic") {
      val df = Seq((Long.MinValue, 1L), (Long.MaxValue, 1L)).toDF("v", "cnt")
      intercept[IllegalArgumentException] {
        Prefix.cumSums(df, "v", col("v"), Seq("cnt"), Seq("cum")).collect()
      }
    }
  }
}
