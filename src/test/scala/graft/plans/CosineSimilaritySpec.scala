package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

import graft.TestSpark
import graft.sources.Tables

class CosineSimilaritySpec extends AnyFunSpec {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def composed = {
    def dot(a: String, b: String) =
      aggregate(zip_with(col(a), col(b), (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    dot("a", "b") / (sqrt(dot("a", "a")) * sqrt(dot("b", "b")))
  }

  describe("CosineSimilarity expression") {
    it("is bit-equal to the composed higher-order form on real vectors") {
      GraftFunctions.register(spark)
      val e = Tables.embeddings(spark, TestSpark.Sf)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      val pairs = e.select(col("vec_id").as("ida"), col("emb").as("a"))
        .crossJoin(e.select(col("vec_id").as("idb"), col("emb").as("b")))
        .filter(col("ida") < 20 && col("idb") < 20)
      val diff = pairs.select(
          call_function("cosine_similarity", col("a"), col("b")).as("fused"),
          composed.as("ref"))
        .filter(col("fused") =!= col("ref"))
      assert(diff.count() == 0)
    }

    it("works through SQL after registration") {
      GraftFunctions.register(spark)
      val r = spark.sql(
        "SELECT cosine_similarity(array(1.0d, 0.0d), array(0.0d, 1.0d)) AS c").collect()(0)
      assert(r.getDouble(0) == 0.0)
      val r2 = spark.sql(
        "SELECT cosine_similarity(array(2.0d, 0.0d), array(1.0d, 0.0d)) AS c").collect()(0)
      assert(r2.getDouble(0) == 1.0)
    }

    it("returns null on null input and clamps mismatched lengths") {
      GraftFunctions.register(spark)
      val r = spark.sql(
        "SELECT cosine_similarity(CAST(NULL AS ARRAY<DOUBLE>), array(1.0d)) AS c").collect()(0)
      assert(r.isNullAt(0))
      val r2 = spark.sql(
        "SELECT cosine_similarity(array(1.0d, 9.0d), array(1.0d)) AS c").collect()(0)
      // clamps to length 1: dot=1, but norms use only the first element
      // of each array per the generated loop
      assert(r2.getDouble(0) == 1.0 / (math.sqrt(1.0) * math.sqrt(1.0)))
    }

    it("rejects non-array arguments at analysis time") {
      GraftFunctions.register(spark)
      val e = intercept[Exception] {
        spark.sql("SELECT cosine_similarity('a', array(1.0d))").collect()
      }
      assert(e.getMessage.contains("ARRAY<DOUBLE>"))
    }
  }
}
