package graft.operators

import org.scalatest.funspec.AnyFunSpec

import graft.TestSpark

class IvfRecallSpec extends AnyFunSpec {
  private lazy val spark = TestSpark.spark

  describe("ANN recall audit (q236)") {
    it("reports one row per query with consistent bounds") {
      val rows = Similarity.ivfRecall(spark, TestSpark.Sf).collect()
      assert(rows.length == Similarity.NumQueries)
      rows.foreach { r =>
        val nIvf = r.getAs[Long]("n_ivf")
        val nCommon = r.getAs[Long]("n_common")
        val recall = r.getAs[Double]("recall")
        assert(nIvf <= Similarity.K)
        assert(nCommon <= nIvf)
        assert(recall >= 0.0 && recall <= 1.0)
        assert(math.abs(recall - nCommon.toDouble / Similarity.K) < 1e-9)
        // the approximate answer can never beat the exact one
        if (nIvf == Similarity.K)
          assert(r.getAs[Double]("cosine_gap") >= 0.0)
      }
      // the probe set must find SOMETHING on the fixture corpus
      assert(rows.map(_.getAs[Long]("n_common")).sum > 0L)
    }

    it("is partitioning-invariant") {
      val e = graft.sources.Tables.embeddings(spark, TestSpark.Sf)
      val a = Similarity.ivfRecallFrom(e).collect().toSeq
      val b = Similarity.ivfRecallFrom(e.repartition(7)).collect().toSeq
      assert(a == b)
    }
  }
}
