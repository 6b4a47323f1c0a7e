package graft.operators

import org.scalatest.funspec.AnyFunSpec

import graft.TestSpark

class NdcgSpec extends AnyFunSpec {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  describe("BM25 nDCG eval (q245)") {
    it("scores a frequency-monotone corpus as perfectly ranked") {
      // equal lengths => BM25 is monotone in tf, so the ranking equals
      // the relevance ordering and nDCG must be exactly 1
      val d = docs(
        1L -> "spark spark spark spark a b",
        2L -> "spark spark spark c d e",
        3L -> "spark spark f g h i",
        4L -> "spark j k l m n",
        5L -> "o p q r s t")
      val r = TextAnalysis.bm25NdcgFrom(d).collect()(0)
      assert(r.getAs[Double]("ndcg") == 1.0)
      assert(r.getAs[Long]("n_returned") == 4L) // doc 5 has no term
      assert(r.getAs[Long]("n_overlap") == 4L)
    }

    it("detects a deliberately inverted ranking as imperfect") {
      // BM25's idf makes the RARE term outrank the common one: doc A
      // stuffs the common term, doc B holds the rare one — raw
      // occurrence grading disagrees with the ranker, so nDCG < 1
      val common = Seq.fill(30)("spark").mkString(" ")
      val rows = Seq(
        1L -> s"$common a b",
        2L -> "vector c d e f g h i j k l m n o p q r s t u v w x y z aa bb cc dd ee ff",
        3L -> "spark vector z1 z2") ++
        (10L to 40L).map(i => i -> s"spark filler$i")
      val d = docs(rows: _*)
      val r = TextAnalysis.bm25NdcgFrom(d).collect()(0)
      val ndcg = r.getAs[Double]("ndcg")
      assert(ndcg > 0.0 && ndcg < 1.0)
    }

    it("stays within metric bounds on the fixture corpus") {
      val r = TextAnalysis.bm25Ndcg(spark, TestSpark.Sf).collect()(0)
      assert(r.getAs[Int]("k") == TextAnalysis.Bm25TopK)
      assert(r.getAs[Long]("n_returned") <= TextAnalysis.Bm25TopK)
      val ndcg = r.getAs[Double]("ndcg")
      assert(ndcg > 0.0 && ndcg <= 1.0)
      assert(r.getAs[Long]("n_overlap") <= TextAnalysis.Bm25TopK)
      assert(r.getAs[Double]("dcg") <= r.getAs[Double]("idcg"))
    }
  }
}
