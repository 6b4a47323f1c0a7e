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

  describe("resizeFeatures") {
    it("fits into the bounding box preserving aspect, never upscales") {
      val feats = Multimodal.decodeFeatures(Multimodal.payloads(spark, sf))
      val resized = Multimodal.resizeFeatures(feats, 224, 224).collect()
      assert(resized.nonEmpty)
      resized.foreach { r =>
        assert(r.out_width <= 224 && r.out_height <= 224)
        assert(r.scale <= 1.0)
        // aspect preserved within one pixel of the smaller output side
        // (floor quantization dominates for extreme aspect ratios)
        val ar0 = r.width.toDouble / r.height
        val ar1 = r.out_width.toDouble / r.out_height
        val tol = 1.0 / math.min(r.out_width, r.out_height)
        assert(math.abs(ar0 - ar1) / ar0 <= tol, s"$r")
        // one side saturates the box unless the source already fit
        assert(r.scale == 1.0 || r.out_width == 224 || r.out_height == 224 ||
          // floor can land one pixel under the box edge
          r.out_width == 223 || r.out_height == 223)
      }
    }
  }

  describe("sampleFrames") {
    it("emits at most perDoc evenly spaced frames, consistent with q30") {
      val frames = Multimodal.sampleFrames(Multimodal.payloads(spark, sf), 4)
        .collect().groupBy(_.doc_id)
      val meta = Multimodal.mediaMeta(spark, sf).collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_frames")).toMap
      assert(frames.nonEmpty)
      frames.foreach { case (id, fs) =>
        assert(fs.length == math.min(4, meta(id)).toInt)
        assert(fs.forall(f => f.n_frames == meta(id)))
        assert(fs.map(_.frame_idx).distinct.length == fs.length)
        assert(fs.forall(f => f.frame_idx >= 0 && f.frame_idx < f.n_frames))
        assert(fs.forall(_.frame_sha.length == 64))
      }
    }

    it("is deterministic across runs") {
      val a = Multimodal.sampleFrames(Multimodal.payloads(spark, sf), 3)
        .collect().map(f => (f.doc_id, f.frame_idx, f.frame_sha)).toSet
      val b = Multimodal.sampleFrames(Multimodal.payloads(spark, sf), 3)
        .collect().map(f => (f.doc_id, f.frame_idx, f.frame_sha)).toSet
      assert(a == b)
    }
  }
}
