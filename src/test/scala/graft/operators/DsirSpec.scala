package graft.operators

import org.scalatest.funspec.AnyFunSpec

import graft.TestSpark

class DsirSpec extends AnyFunSpec {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  describe("DSIR importance weighting (q234)") {
    it("weights target-vocabulary docs positive and raw-vocabulary docs negative") {
      // disjoint vocabularies: target (en) speaks only 'aa bb', raw
      // speaks only 'zz yy' — every en doc must score positive, every
      // raw doc negative
      val docs = Seq(
        (1L, "aa bb aa bb", "en", "s1"),
        (2L, "bb aa aa", "en", "s1"),
        (3L, "zz yy zz yy", "de", "s2"),
        (4L, "yy zz", "fr", "s2"))
        .toDF("doc_id", "text", "lang", "source")
      val out = Curation.dsirWeightsFrom(docs).collect()
        .map(r => r.getString(0) ->
          ((r.getAs[Long]("n_pos"), r.getAs[Long]("n_docs"),
            r.getAs[Double]("mean_weight")))).toMap
      assert(out("s1")._1 == 2L && out("s1")._2 == 2L)
      assert(out("s1")._3 > 0.0)
      assert(out("s2")._1 == 0L && out("s2")._3 < 0.0)
    }

    it("is order- and partitioning-invariant (exact decimal dot products)") {
      val docs = graft.sources.Tables.documents(spark, TestSpark.Sf)
      val a = Curation.dsirWeightsFrom(docs).collect().toSeq
      val b = Curation.dsirWeightsFrom(docs.repartition(7, $"lang"))
        .collect().toSeq
      assert(a == b)
    }

    it("profiles the fixture corpus with full coverage") {
      val rows = Curation.dsirWeights(spark, TestSpark.Sf).collect()
      assert(rows.map(_.getAs[Long]("n_docs")).sum == 500L)
      rows.foreach { r =>
        val pr = r.getAs[Double]("pos_rate")
        assert(pr >= 0.0 && pr <= 1.0)
      }
      // the weights must discriminate: not every doc on one side
      val pos = rows.map(_.getAs[Long]("n_pos")).sum
      assert(pos > 0L && pos < 500L)
    }
  }
}
