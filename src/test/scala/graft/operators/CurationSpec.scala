package graft.operators

import org.apache.spark.sql.DataFrame
import org.scalatest.funspec.AnyFunSpec

import graft.TestSpark

class CurationSpec extends AnyFunSpec {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs(rows: (Long, String, String, String, Long)*): DataFrame =
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")

  describe("hashSplit (q45)") {
    it("assigns every doc, roughly 80/10/10, and is stable across runs") {
      val r = Curation.hashSplit(spark, TestSpark.Sf)
        .collect().map(x => x.getAs[String]("split") -> x.getAs[Long]("n_docs")).toMap
      val total = r.values.sum
      assert(total == 500)
      assert(r("train") > 350 && r("train") < 450) // ~400 expected
      val again = Curation.hashSplit(spark, TestSpark.Sf)
        .collect().map(x => x.getAs[String]("split") -> x.getAs[Long]("n_docs")).toMap
      assert(again == r)
    }
  }

  describe("decontaminate (q46)") {
    it("flags docs sharing a bigram with the benchmark, counts distinct overlaps") {
      // benchmark = doc_ids 0-4; only "x y" is shared below
      val r = Curation.decontaminateFrom(docs(
        (0L, "x y unique0", "en", "s", 1L),
        (1L, "benchmark text one", "en", "s", 1L),
        (2L, "benchmark text two", "en", "s", 1L),
        (3L, "filler three a", "en", "s", 1L),
        (4L, "filler four b", "en", "s", 1L),
        (5L, "contains x y twice x y", "en", "s", 1L), // "x y" shared (distinct: 1)
        (6L, "benchmark text one copy", "en", "s", 1L), // "benchmark text", "text one"
        (7L, "nothing shared here", "en", "s", 1L)))
        .collect()
      assert(r.map(x => (x.getAs[Long]("doc_id"), x.getAs[Long]("n_overlap"))).toSeq ==
        Seq((5L, 1L), (6L, 2L)))
    }
  }

  describe("repetition (q47)") {
    it("scores duplicate bigrams and drops shingle-less docs") {
      val r = Curation.repetitionFrom(docs(
        (1L, "a b a b a", "en", "s", 1L), // 4 shingles, 2 distinct
        (2L, "all distinct words here", "en", "s", 1L), // 3/3
        (3L, "single", "en", "s", 1L))) // no shingles: dropped
        .collect()
      assert(r.length == 2)
      assert(r(0).getAs[Int]("n_shingles") == 4)
      assert(r(0).getAs[Int]("n_distinct") == 2)
      assert(r(0).getAs[Double]("rep_ratio") == 0.5)
      assert(r(1).getAs[Double]("rep_ratio") == 0.0)
    }
  }

  describe("sourceMixture (q48)") {
    it("allocates the exact budget with largest-remainder rounding") {
      // tokens: s1=3, s2=3, s3=1 of 7; raw = 42857.142../42857.142../14285.714..
      // floors sum to 99999, the 1 leftover unit goes to s3 (largest frac)
      val r = Curation.sourceMixtureFrom(docs(
        (1L, "one two three", "en", "s1", 1L),
        (2L, "four five six", "en", "s2", 1L),
        (3L, "seven", "en", "s3", 1L)))
        .collect()
      assert(r.map(x => (x.getAs[String]("source"), x.getAs[Long]("alloc_tokens"))).toSeq ==
        Seq(("s1", 42857L), ("s2", 42857L), ("s3", 14286L)))
    }

    it("allocations sum exactly to the budget on the fixture") {
      val total = Curation.sourceMixture(spark, TestSpark.Sf)
        .agg(org.apache.spark.sql.functions.sum("alloc_tokens"))
        .collect()(0).getLong(0)
      assert(total == Curation.MixBudget)
    }
  }

  describe("mixtureSample (q52)") {
    it("downsamples every source near its rate, deterministically") {
      val r = Curation.mixtureSample(spark, TestSpark.Sf).collect()
      assert(r.nonEmpty)
      r.foreach { x =>
        val bp = x.getAs[Long]("rate_bp")
        assert(bp > 0 && bp <= Curation.SampleBp, s"rate_bp $bp out of range")
        assert(x.getAs[Long]("n_kept") > 0)
      }
      // half-the-corpus budget: kept tokens must land well under the
      // full corpus and in the neighborhood of 50%
      val keptTokens = r.map(_.getAs[Long]("kept_tokens")).sum.toDouble
      val allTokens = Curation.sourceMixture(spark, TestSpark.Sf)
        .agg(org.apache.spark.sql.functions.sum("n_tokens"))
        .collect()(0).getLong(0).toDouble
      val frac = keptTokens / allTokens
      assert(frac > 0.3 && frac < 0.7, s"kept fraction $frac")
      val again = Curation.mixtureSample(spark, TestSpark.Sf).collect()
      assert(again.toSeq == r.toSeq)
    }
  }
}
