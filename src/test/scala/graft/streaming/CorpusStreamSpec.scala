package graft.streaming

import org.scalatest.funspec.AnyFunSpec

import graft.TestSpark

class CorpusStreamSpec extends AnyFunSpec {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf

  describe("streamedFunnel (q90)") {
    it("a drained complete-mode run equals the batch q88 funnel") {
      val streamed = CorpusStream.streamedFunnel(spark, sf).collect().toSeq
      val batch = graft.operators.TextAnalysis.filterFunnel(spark, sf)
        .collect().toSeq
      assert(streamed.nonEmpty)
      assert(streamed == batch,
        "streaming counters must land exactly on the batch attrition report")
      // a re-drain in the same session re-registers the sink cleanly
      val again = CorpusStream.streamedFunnel(spark, sf).collect().toSeq
      assert(again == batch)
    }
  }
}
