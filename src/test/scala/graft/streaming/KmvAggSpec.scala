package graft.streaming

import org.scalatest.funspec.AnyFunSpec

import graft.TestSpark

class KmvAggSpec extends AnyFunSpec {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  describe("KmvAgg typed aggregator") {
    it("keeps the k smallest DISTINCT values through reduce, skipping duplicates") {
      val agg = new KmvAgg(3)
      val b = Seq(9L, 5L, 5L, 7L, 5L, 1L, 9L, 3L)
        .foldLeft(agg.zero)(agg.reduce)
      assert(b == Seq(1L, 3L, 5L)) // sorted, distinct, bounded
      // a value above the current kth min cannot enter a full buffer
      assert(agg.reduce(b, 6L) == Seq(1L, 3L, 5L))
      assert(agg.reduce(b, 2L) == Seq(1L, 2L, 3L))
    }

    it("merges two sketches exactly like sketching the union") {
      val agg = new KmvAgg(4)
      val x = Seq(1L, 3L, 5L, 7L)
      val y = Seq(2L, 3L, 6L, 9L)
      assert(agg.merge(x, y) == Seq(1L, 2L, 3L, 5L)) // shared 3 emitted once
      assert(agg.merge(Nil, y) == y && agg.merge(x, Nil) == x)
    }

    it("the drained streaming sketch equals the batch distinct k-minima") {
      val r = EventStream.streamedSketch(spark, TestSpark.Sf).collect()
      assert(r.nonEmpty)
      r.foreach { x =>
        val nK = x.getAs[Long]("n_k")
        val exact = x.getAs[Long]("n_exact")
        assert(nK == math.min(graft.operators.Analytics.SkK, exact))
        if (nK < graft.operators.Analytics.SkK) // unsaturated: exact
          assert(x.getAs[Double]("est_distinct") == exact.toDouble)
        else // saturated: within the k=128 sketch's plausible band
          assert(math.abs(x.getAs[Double]("est_distinct") - exact) < 0.4 * exact)
      }
    }
  }
}
