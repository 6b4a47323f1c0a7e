package graft.operators

import org.scalatest.funspec.AnyFunSpec

import graft.TestSpark

class CupedSpec extends AnyFunSpec {
  private lazy val spark = TestSpark.spark

  describe("CUPED variance-reduced readout (q244)") {
    it("reduces variance and preserves the overall mean") {
      val rows = Analytics.cupedReadout(spark, TestSpark.Sf).collect()
      assert(rows.length == 2) // the two hash cohorts
      val vr = rows.head.getAs[Double]("var_reduction")
      // theta is the pooled least-squares optimum, so the adjusted
      // variance can never exceed the raw variance
      assert(vr >= 0.0 && vr <= 1.0)
      assert(rows.forall(_.getAs[Double]("var_reduction") == vr))
      // CUPED centers the covariate, so the POOLED adjusted mean
      // equals the pooled raw mean (the adjustment moves cohorts
      // relative to each other, never the total)
      val n = rows.map(_.getAs[Long]("n_users").toDouble)
      val raw = rows.map(_.getAs[Double]("mean_y"))
      val adj = rows.map(_.getAs[Double]("adj_mean_y"))
      val pooledRaw = (raw, n).zipped.map(_ * _).sum / n.sum
      val pooledAdj = (adj, n).zipped.map(_ * _).sum / n.sum
      assert(math.abs(pooledRaw - pooledAdj) < 1e-4)
    }

    it("is partitioning-invariant (decimal moments)") {
      val ev = graft.sources.Tables.events(spark, TestSpark.Sf)
      val a = Analytics.cupedFrom(ev).collect().toSeq
      val b = Analytics.cupedFrom(ev.repartition(7)).collect().toSeq
      assert(a == b)
    }
  }
}
