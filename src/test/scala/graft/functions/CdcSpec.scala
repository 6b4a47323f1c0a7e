package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funspec.AnyFunSpec

import graft.TestSpark

class CdcSpec extends AnyFunSpec {
  private lazy val spark = TestSpark.spark

  private def hashes(s: String): Seq[Long] = {
    val a = Cdc.chunkHashes(UTF8String.fromString(s))
    (0 until a.numElements()).map(a.getLong)
  }

  describe("content-defined chunking (q241)") {
    it("boundaries follow the windowed rule exactly") {
      val rng = new scala.util.Random(7)
      val s = (0 until 400).map(_ => ('a' + rng.nextInt(26)).toChar).mkString
      val want = (0 to s.length - Cdc.Window - 1).filter { i =>
        Cdc.hash32Str(s.substring(i, i + Cdc.Window)) % Cdc.Divisor == 0
      }.map(_ + Cdc.Window)
      assert(Cdc.boundaries(s) == want)
      // chunks partition the text: k boundaries => k+1 chunks
      assert(hashes(s).size == want.size + 1)
    }

    it("chunk hashes survive a prefix insertion (the CDC property)") {
      val rng = new scala.util.Random(11)
      (0 until 10).foreach { trial =>
        val s = (0 until 600).map(_ => ('a' + rng.nextInt(26)).toChar).mkString
        val edited = s"inserted prefix $trial " + s
        val a = hashes(s)
        val b = hashes(edited)
        val shared = a.toSet.intersect(b.toSet).size
        // everything after the first re-aligned boundary is identical;
        // only the head chunk (and the synthetic prefix) may differ
        assert(shared >= a.size - 1,
          s"trial $trial: ${a.size} chunks, only $shared survived the edit")
      }
    }

    it("degenerate inputs: short docs yield one whole-text chunk") {
      assert(hashes("tiny").size == 1)
      assert(hashes("x" * Cdc.Window).size == 1) // no interior boundary fits
      assert(hashes("") == Seq.empty)
    }

    it("audits the planted corpus distributed with real dup mass") {
      import graft.operators.Dedup
      val rows = Dedup.cdcChunks(spark, TestSpark.Sf).collect()
      val planted = Dedup.replicaPlanted(
        graft.sources.Tables.documents(spark, TestSpark.Sf)).count()
      assert(rows.map(_.getAs[Long]("n_docs")).sum == planted)
      assert(planted > 500L) // the replica arm fired
      rows.foreach { r =>
        assert(r.getAs[Long]("n_distinct") <= r.getAs[Long]("n_chunks"))
        assert(r.getAs[Double]("mean_chunk_len") > 0.0)
      }
      // exact-copy replicas guarantee duplicate chunks somewhere
      assert(rows.map(r =>
        r.getAs[Long]("n_chunks") - r.getAs[Long]("n_distinct")).sum > 0L)
    }
  }
}
