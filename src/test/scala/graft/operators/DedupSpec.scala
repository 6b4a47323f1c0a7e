package graft.operators

import org.apache.spark.sql.DataFrame
import org.scalatest.funspec.AnyFunSpec

import graft.TestSpark

class DedupSpec extends AnyFunSpec {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*): DataFrame =
    rows.map { case (id, t) => (id, t, "en", "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  private val base =
    "supplier performance data pipelines aggregate delivery quality metrics " +
      "across regions and categories every single day without fail while " +
      "analysts review dashboards tracking fill rates lead times and risk " +
      "scores for procurement planning decisions next quarter"
  private val nearDup = base.replace("quality", "quantity")
  private val distinct1 =
    "completely unrelated text about orchestration frameworks scheduling " +
      "batch jobs overnight with retries and alerts"

  private val corpus = docs(
    (1L, base), (2L, base), // exact dups
    (3L, nearDup),          // near dup of 1/2
    (4L, distinct1))

  describe("exactDedup (q21)") {
    it("counts duplicate docs and clusters") {
      val r = Dedup.exactDedupFrom(corpus).collect()(0)
      assert(r.getAs[Long]("n_docs") == 4L)
      assert(r.getAs[Long]("n_distinct") == 3L)
      assert(r.getAs[Long]("n_dup_docs") == 1L)
      assert(r.getAs[Long]("n_dup_clusters") == 1L)
    }

    it("treats case/punctuation variants as duplicates") {
      val r = Dedup.exactDedupFrom(docs((1L, "Hello,  World!"), (2L, "hello world")))
        .collect()(0)
      assert(r.getAs[Long]("n_distinct") == 1L)
    }
  }

  describe("minhashCandidates (q22)") {
    it("finds exact and near duplicates, not unrelated docs") {
      val pairs = Dedup.candidatePairsFrom(Dedup.bandsFrom(corpus))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs.contains((1L, 2L)), "exact dup pair")
      assert(pairs.contains((1L, 3L)) && pairs.contains((2L, 3L)), "near dup pairs")
      assert(!pairs.exists { case (a, b) => a == 4L || b == 4L }, "unrelated doc")
    }
  }

  describe("simhash (q23)") {
    it("gives identical signatures to identical docs, near for near-dups") {
      val sig = Dedup.simhashFrom(corpus).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(sig(1L) == sig(2L))
      val hammingNear = java.lang.Long.bitCount(sig(1L) ^ sig(3L))
      val hammingFar = java.lang.Long.bitCount(sig(1L) ^ sig(4L))
      assert(hammingNear <= 8, s"near-dup hamming $hammingNear")
      assert(hammingFar > hammingNear, s"far $hammingFar vs near $hammingNear")
    }
  }

  describe("ngramJaccard (q24)") {
    it("scores exact dups 1.0 and near dups below") {
      val byPair = Dedup.ngramJaccardFrom(corpus).collect()
        .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) -> r.getAs[Double]("jaccard"))
        .toMap
      assert(byPair((1L, 2L)) == 1.0)
      assert(byPair((1L, 3L)) < 1.0 && byPair((1L, 3L)) > 0.5)
    }
  }
}
