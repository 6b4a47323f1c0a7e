package graft.operators

import org.scalatest.funspec.AnyFunSpec

import graft.TestSpark

class MerkleSpec extends AnyFunSpec {
  private lazy val spark = TestSpark.spark

  private def docs = graft.sources.Tables.documents(spark, TestSpark.Sf)

  describe("Merkle table diff (q240)") {
    it("proves identical copies equal at every node") {
      val out = Curation.merkleDiffFrom(docs, docs).collect()
      assert(out.nonEmpty && out.forall(_.getAs[Boolean]("is_match")))
      // the grid carries all four levels, root included
      assert(out.map(_.getAs[Int]("level")).toSet == Set(0, 1, 2, 3))
      assert(out.count(_.getAs[Int]("level") == 3) == 1)
    }

    it("localizes planted damage to exactly the damaged buckets") {
      val out = Curation.merkleDiffFrom(docs, Curation.mutatedMirror(docs))
        .collect()
      val byLevel = out.groupBy(_.getAs[Int]("level"))
      // the planted drop/mutate ids, bucketed like the operator
      val damaged = docs.select("doc_id").collect().map(_.getLong(0))
        .filter(id => id % 101 == 0 || id % 97 == 0)
        .map(id => (id % Curation.MerkleBuckets).toInt).toSet
      val leafMismatch = byLevel(0).filterNot(_.getAs[Boolean]("is_match"))
        .map(_.getAs[Int]("node")).toSet
      assert(leafMismatch == damaged)
      // a parent mismatches iff one of its children does
      (1 until Curation.MerkleLevels).foreach { k =>
        val mk = byLevel(k).filterNot(_.getAs[Boolean]("is_match"))
          .map(_.getAs[Int]("node")).toSet
        val expect = byLevel(k - 1).filterNot(_.getAs[Boolean]("is_match"))
          .map(_.getAs[Int]("node") / Curation.MerkleFanout).toSet
        assert(mk == expect, s"level $k")
      }
      // root must flag the divergence
      assert(!byLevel(3).head.getAs[Boolean]("is_match"))
      // row-count accounting sees the drops
      val root = byLevel(3).head
      assert(root.getAs[Long]("n_left") > root.getAs[Long]("n_right"))
    }

    it("digests are partitioning-invariant (order-free xor fold)") {
      val a = Curation.merkleDiffFrom(docs, Curation.mutatedMirror(docs))
        .collect().toSeq
      val b = Curation.merkleDiffFrom(docs.repartition(7),
        Curation.mutatedMirror(docs).repartition(3)).collect().toSeq
      assert(a == b)
    }
  }
}
