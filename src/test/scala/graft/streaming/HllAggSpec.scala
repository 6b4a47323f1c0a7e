package graft.streaming

import org.scalatest.funspec.AnyFunSpec

import graft.TestSpark

class HllAggSpec extends AnyFunSpec {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  describe("HllAgg typed aggregator") {
    it("updates the right register with the leading-zero rank, monotonically") {
      val agg = new HllAgg(64)
      assert(agg.zero == Seq.fill(64)(0))
      // h = bucket 5, remainder 1 → bit length 1 → rho 54
      val b1 = agg.reduce(agg.zero, (1L << 6) | 5L)
      assert(b1(5) == 54 && b1.count(_ != 0) == 1)
      // a smaller rank for the same bucket never downgrades it
      val b2 = agg.reduce(b1, (3L << 6) | 5L) // remainder 3 → rho 53
      assert(b2(5) == 54)
      // remainder 0 → all 54 zero bits → rho 55
      val b3 = agg.reduce(b2, 7L) // bucket 7, w = 0
      assert(b3(7) == 55)
    }

    it("merge is the element-wise max: union of sketches, order-free") {
      val agg = new HllAgg(64)
      val hs = Seq(0x123456789abL, 0xfedcba987L, 0x42L, 0x1L << 59)
      val one = hs.foldLeft(agg.zero)(agg.reduce)
      val (a, b) = hs.splitAt(2)
      val merged = agg.merge(
        a.foldLeft(agg.zero)(agg.reduce), b.foldLeft(agg.zero)(agg.reduce))
      assert(merged == one)
      assert(agg.merge(one, agg.zero) == one)
      assert(agg.merge(merged, one) == one) // idempotent
    }

    it("any split of a hash stream merges to the same registers as one pass (property)") {
      val agg = new HllAgg(64)
      var seed = 42L
      def nextLong(): Long = {
        seed = seed * 6364136223846793005L + 1442695040888963407L
        (seed >>> 4) & ((1L << 60) - 1) // non-negative 60-bit, like hash60
      }
      (0 until 20).foreach { trial =>
        val hs = Seq.fill(50 + trial)(nextLong())
        val whole = hs.foldLeft(agg.zero)(agg.reduce)
        val cut = 1 + (trial * 7) % (hs.length - 1)
        val (a, b) = hs.splitAt(cut)
        val split = agg.merge(
          a.foldLeft(agg.zero)(agg.reduce), b.foldLeft(agg.zero)(agg.reduce))
        assert(split == whole, s"trial $trial cut $cut")
        // commutativity: merge order never matters
        assert(agg.merge(
          b.foldLeft(agg.zero)(agg.reduce),
          a.foldLeft(agg.zero)(agg.reduce)) == whole)
      }
    }

    it("derives the bucket shift and rank base from m (m=16 / m=256 vs scalar reference)") {
      // scalar reference: the 60-bit hash splits into log2(m) bucket
      // bits (low) and a 60-log2(m)-bit remainder; rank = leading
      // zeros of the remainder within its own width, plus one
      def reference(m: Int, hs: Seq[Long]): Seq[Int] = {
        val b = Integer.numberOfTrailingZeros(m)
        val regs = Array.fill(m)(0)
        hs.foreach { h =>
          val bucket = (h & (m - 1)).toInt
          val w = h >>> b
          val width = 60 - b
          val rho = width - BigInt(w).bitLength + 1
          if (rho > regs(bucket)) regs(bucket) = rho
        }
        regs.toSeq
      }
      var seed = 7L
      def nextLong(): Long = {
        seed = seed * 6364136223846793005L + 1442695040888963407L
        (seed >>> 4) & ((1L << 60) - 1)
      }
      Seq(16, 64, 256).foreach { m =>
        val agg = new HllAgg(m)
        val hs = Seq.fill(400)(nextLong()) ++ Seq(0L, 1L, (1L << 59) | 3L)
        assert(hs.foldLeft(agg.zero)(agg.reduce) == reference(m, hs),
          s"m=$m registers must match the scalar reference")
      }
      // an all-zero remainder saturates at the full remainder width + 1
      val a16 = new HllAgg(16)
      assert(a16.reduce(a16.zero, 3L)(3) == 57) // 60-4 zero bits → rho 57
      val a256 = new HllAgg(256)
      assert(a256.reduce(a256.zero, 5L)(5) == 53) // 60-8 zero bits → rho 53
    }

    it("q211: the drained streaming registers equal the batch q201 sketch exactly") {
      val streamed = EventStream.streamedHll(spark, TestSpark.Sf).collect()
        .map(_.toSeq).toSeq
      val batch = graft.operators.Events.hllDistinct(spark, TestSpark.Sf)
        .collect().map(_.toSeq).toSeq
      assert(streamed == batch,
        "complete-mode drain must reproduce the batch register file")
    }
  }
}
