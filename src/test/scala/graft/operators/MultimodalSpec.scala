package graft.operators

import org.scalatest.funspec.AnyFunSpec

import graft.TestSpark

class MultimodalSpec extends AnyFunSpec {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf
  import spark.implicits._

  describe("mediaMeta (q30)") {
    it("derives bounded fake dimensions from payload hashes") {
      val rows = Multimodal.mediaMeta(spark, sf).collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        assert(r.getAs[Long]("width") >= 64 && r.getAs[Long]("width") < 64 + 1217)
        assert(r.getAs[Long]("height") >= 64 && r.getAs[Long]("height") < 64 + 961)
        assert(r.getAs[Long]("n_frames") >= 1 && r.getAs[Long]("n_frames") <= 32)
        assert(r.getAs[String]("sha").length == 64)
      }
    }
  }

  describe("decodeFeatures (typed mapPartitions pipeline)") {
    it("is deterministic and yields a probability histogram") {
      val feats = Multimodal.decodeFeatures(Multimodal.payloads(spark, sf))
      val twice = Multimodal.decodeFeatures(Multimodal.payloads(spark, sf))
      val a = feats.filter(_.doc_id == 1L).head()
      val b = twice.filter(_.doc_id == 1L).head()
      assert(a.width == b.width && a.height == b.height)
      assert(a.histogram.toSeq == b.histogram.toSeq)
      assert(math.abs(a.histogram.sum - 1.0) < 1e-9)
    }

    it("survives an empty payload") {
      val empty = Seq((99L, Array.emptyByteArray)).toDF("doc_id", "payload")
      val f = Multimodal.decodeFeatures(empty).head()
      assert(f.n_bytes == 0)
      assert(f.histogram.forall(_ == 0.0))
    }
  }
}
