package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

import graft.TestSpark
import graft.sources.Tables

/** The r13 fused codebook kernels must be BIT-identical to the composed
  * `transform(sequence(..), k -> dot_product(..))` trees they replaced
  * (q36/q61/q75/q76/q100/q136 argmin/argmax boundaries and every
  * downstream mean ride on those bits).
  */
class CodebookScoresSpec extends AnyFunSpec {
  private lazy val spark = TestSpark.spark

  // a deterministic 16×8 "codebook" literal derived from fixed doubles
  private val cb: Seq[Seq[Double]] =
    (0 until 16).map(k => (0 until 8).map(d =>
      math.sin(k * 8 + d + 1) * (1.0 + 0.01 * d)))
  private val cc: Seq[Double] = cb.map(c => c.map(x => x * x).sum)

  describe("CodebookScores / AdcCellScores expressions") {
    it("codebook_scores is bit-equal to the composed transform+dot_product form") {
      GraftFunctions.register(spark)
      val cbLit = typedlit(cb)
      val e = Tables.embeddings(spark, TestSpark.Sf)
        .select(slice(col("embedding").cast("array<double>"), 1, 8).as("v"))
      val composed = transform(sequence(lit(0), lit(cb.size - 1)), k =>
        call_function("dot_product", col("v"), element_at(cbLit, k + 1)))
      val diff = e.select(
          call_function("codebook_scores", col("v"), cbLit).as("fused"),
          composed.as("ref"))
        .filter(col("fused") =!= col("ref"))
      assert(diff.count() == 0)
    }

    it("adc_cell_scores is bit-equal to the composed -2*dot+cc form") {
      GraftFunctions.register(spark)
      val cbLit = typedlit(cb)
      val ccLit = typedlit(cc)
      val e = Tables.embeddings(spark, TestSpark.Sf)
        .select(slice(col("embedding").cast("array<double>"), 9, 8).as("v"))
      val composed = transform(sequence(lit(0), lit(cb.size - 1)), k =>
        lit(-2.0) * call_function("dot_product", col("v"),
          element_at(cbLit, k + 1)) + element_at(ccLit, k + 1))
      val diff = e.select(
          call_function("adc_cell_scores", col("v"), cbLit, ccLit).as("fused"),
          composed.as("ref"))
        .filter(col("fused") =!= col("ref"))
      assert(diff.count() == 0)
    }

    it("codebook_argmax_cell equals array_position(s, array_max(s)) - 1 on real vectors") {
      GraftFunctions.register(spark)
      val cbLit = typedlit(cb)
      val e = Tables.embeddings(spark, TestSpark.Sf)
        .select(col("embedding").cast("array<double>").as("v"))
      val s = call_function("codebook_scores", col("v"), cbLit)
      val composed = (array_position(s, array_max(s)) - 1).cast("int")
      val diff = e.select(
          call_function("codebook_argmax_cell", col("v"), cbLit).as("fused"),
          composed.as("ref"))
        .filter(col("fused") =!= col("ref"))
      assert(diff.count() == 0)
    }

    it("adc_argmin_cell equals array_position(s, array_min(s)) - 1 on real vectors") {
      GraftFunctions.register(spark)
      val cbLit = typedlit(cb)
      val ccLit = typedlit(cc)
      val e = Tables.embeddings(spark, TestSpark.Sf)
        .select(slice(col("embedding").cast("array<double>"), 1, 8).as("v"))
      val s = call_function("adc_cell_scores", col("v"), cbLit, ccLit)
      val composed = (array_position(s, array_min(s)) - 1).cast("int")
      val diff = e.select(
          call_function("adc_argmin_cell", col("v"), cbLit, ccLit).as("fused"),
          composed.as("ref"))
        .filter(col("fused") =!= col("ref"))
      assert(diff.count() == 0)
    }

    it("argmin/argmax keep the FIRST index on exact ties") {
      GraftFunctions.register(spark)
      // two identical centroids -> tie; composed form picks the first
      val r = spark.sql(
        """SELECT codebook_argmax_cell(array(1.0d, 2.0d),
          |  array(array(0.5d, 0.5d), array(1.0d, 1.0d), array(1.0d, 1.0d))) AS c
          |""".stripMargin).collect()(0)
      assert(r.getInt(0) == 1)
      val r2 = spark.sql(
        """SELECT adc_argmin_cell(array(1.0d, 2.0d),
          |  array(array(1.0d, 1.0d), array(1.0d, 1.0d), array(0.0d, 0.0d)),
          |  array(2.0d, 2.0d, 10.0d)) AS c
          |""".stripMargin).collect()(0)
      assert(r2.getInt(0) == 0)
    }

    it("works through SQL and keeps ascending-k order") {
      GraftFunctions.register(spark)
      val r = spark.sql(
        """SELECT codebook_scores(array(1.0d, 2.0d),
          |  array(array(1.0d, 0.0d), array(0.0d, 1.0d), array(1.0d, 1.0d))) AS s
          |""".stripMargin).collect()(0)
      assert(r.getSeq[Double](0) == Seq(1.0, 2.0, 3.0))
      val r2 = spark.sql(
        """SELECT adc_cell_scores(array(1.0d, 2.0d),
          |  array(array(1.0d, 0.0d), array(0.0d, 1.0d)),
          |  array(1.0d, 1.0d)) AS s
          |""".stripMargin).collect()(0)
      assert(r2.getSeq[Double](0) == Seq(-2.0 * 1.0 + 1.0, -2.0 * 2.0 + 1.0))
    }

    it("returns null on null input and clamps mismatched lengths like dot_product") {
      GraftFunctions.register(spark)
      val r = spark.sql(
        """SELECT codebook_scores(CAST(NULL AS ARRAY<DOUBLE>),
          |  array(array(1.0d))) AS s""".stripMargin).collect()(0)
      assert(r.isNullAt(0))
      val r2 = spark.sql(
        """SELECT codebook_scores(array(1.0d, 9.0d), array(array(2.0d))) AS s"""
        ).collect()(0)
      assert(r2.getSeq[Double](0) == Seq(2.0))
    }

    it("rejects wrong argument types at analysis time") {
      GraftFunctions.register(spark)
      val e1 = intercept[Exception] {
        spark.sql("SELECT codebook_scores(array(1.0d), array(1.0d))").collect()
      }
      assert(e1.getMessage.contains("ARRAY<ARRAY<DOUBLE>>"))
      val e2 = intercept[Exception] {
        spark.sql(
          "SELECT adc_cell_scores(array(1.0d), array(array(1.0d)), 'x')").collect()
      }
      assert(e2.getMessage.contains("ARRAY<DOUBLE>"))
    }
  }
}
