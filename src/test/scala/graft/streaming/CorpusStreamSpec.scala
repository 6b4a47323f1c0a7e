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

  describe("streamedQuality (q220)") {
    it("a drained complete-mode run equals the batch q218 per-source rollup") {
      import org.apache.spark.sql.functions._
      val streamed = CorpusStream.streamedQuality(spark, sf).collect().toSeq
      // batch twin over the same shared z chain
      val batch = graft.operators.TextAnalysis.qualityZ(
          graft.sources.Tables.documents(spark, sf), Seq("source"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("z") >= 0.0, 1L).otherwise(0L)).as("n_keep"))
        .select(col("source"), col("n_docs"), col("n_keep"),
          round(col("n_keep").cast("double") / col("n_docs"), 6)
            .as("keep_rate"))
        .orderBy("source").collect().toSeq
      assert(streamed.nonEmpty)
      assert(streamed == batch,
        "streaming per-source keep counters must equal the batch rollup")
      streamed.foreach { r =>
        assert(r.getAs[Long]("n_keep") <= r.getAs[Long]("n_docs"))
        val rate = r.getAs[Double]("keep_rate")
        assert(rate >= 0.0 && rate <= 1.0)
      }
    }
  }
}
