package graft.operators

import org.scalatest.funspec.AnyFunSpec

import graft.TestSpark

class CalibrationSpec extends AnyFunSpec {
  private lazy val spark = TestSpark.spark

  describe("model-vs-heuristic calibration (q242)") {
    it("bins cover the corpus and the gaps are internally consistent") {
      val rows = TextAnalysis.scoreCalibration(spark, TestSpark.Sf).collect()
      assert(rows.nonEmpty)
      val n = rows.map(_.getAs[Long]("n_docs")).sum
      assert(n == 500L) // every non-empty doc scored
      rows.foreach { r =>
        val bin = r.getAs[Int]("bin")
        assert(bin >= 0 && bin <= 9)
        val ms = r.getAs[Double]("mean_score")
        // bin means sit inside their decile (9 is the closed top bin)
        assert(ms >= bin / 10.0 - 1e-6)
        assert(ms < (bin + 1) / 10.0 + 1e-6 || bin == 9)
        assert(r.getAs[Double]("gap") >= 0.0 && r.getAs[Double]("gap") <= 1.0)
        // w_gap = gap * n_b / N
        val w = r.getAs[Double]("w_gap")
        assert(math.abs(w - r.getAs[Double]("gap") *
          r.getAs[Long]("n_docs") / n.toDouble) < 1e-8)
      }
      // the ECE headline (sum of weighted gaps) is a valid probability gap
      val ece = rows.map(_.getAs[Double]("w_gap")).sum
      assert(ece >= 0.0 && ece <= 1.0)
    }

    it("is partitioning-invariant (decimal bin sums)") {
      val docs = graft.sources.Tables.documents(spark, TestSpark.Sf)
      val a = TextAnalysis.scoreCalibrationFrom(docs).collect().toSeq
      val b = TextAnalysis.scoreCalibrationFrom(docs.repartition(7))
        .collect().toSeq
      assert(a == b)
    }
  }
}
