package graft.sources

import org.scalatest.funspec.AnyFunSpec

import graft.TestSpark

class BucketingSpec extends AnyFunSpec {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf

  describe("bucketed co-located join") {
    it("joins two bucketed tables with zero exchanges") {
      Bucketing.bucketize(Tables.lineitem(spark, sf), "l_orderkey", 8, "b_lineitem")
      Bucketing.bucketize(
        Tables.orders(spark, sf).withColumnRenamed("o_orderkey", "l_orderkey"),
        "l_orderkey", 8, "b_orders")

      val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val joined = spark.table("b_lineitem")
          .join(spark.table("b_orders"), Seq("l_orderkey"))
        val plan = joined.queryExecution.executedPlan.toString
        assert(plan.contains("SortMergeJoin"))
        assert(!plan.contains("Exchange hashpartitioning"),
          s"bucketed join must not shuffle:\n$plan")

        // and the result matches the plain (shuffling) join
        val plain = Tables.lineitem(spark, sf)
          .join(Tables.orders(spark, sf)
            .withColumnRenamed("o_orderkey", "l_orderkey"), Seq("l_orderkey"))
        assert(joined.count() == plain.count())
      } finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      }
    }

    it("q59 snapshot diff over bucketed snapshots runs with zero exchanges") {
      // the CDC claim in Curation.snapshotDiff's scale notes, proven:
      // store both crawl snapshots bucketed by doc_id and the full-outer
      // diff join needs no shuffle at all
      import graft.operators.Curation
      val docs = Tables.documents(spark, sf)
      Bucketing.bucketize(Curation.oldSnapshotOf(docs), "doc_id", 8, "b_snap_old")
      Bucketing.bucketize(Curation.newSnapshotOf(docs), "doc_id", 8, "b_snap_new")
      val diff = Curation.snapshotDiffFrom(
        spark.table("b_snap_old"), spark.table("b_snap_new"))
      val plan = diff.queryExecution.executedPlan.toString
      val joinPart = plan.substring(plan.indexOf("SortMergeJoin"))
      assert(plan.contains("SortMergeJoin") && joinPart.contains("FullOuter"),
        s"expected full-outer SMJ:\n$plan")
      assert(!joinPart.contains("Exchange hashpartitioning"),
        s"bucketed snapshot diff must not shuffle into the join:\n$plan")
      // rows identical to the unbucketed operator
      val plain = Curation.snapshotDiff(spark, sf).collect().toSeq
      assert(diff.collect().toSeq == plain)
    }

    it("q85 over the materialized winnow index: parity, one winnow pass, no fp exchange") {
      import graft.operators.{Dedup, TextAnalysis}
      val viaIndex = Dedup.containmentPairsOfFps(
        TextAnalysis.winnowIndexFor(spark, sf))
      val recomputed = Dedup.containmentPairsFrom(Tables.documents(spark, sf))
        .collect().toSeq
      assert(viaIndex.collect().toSeq == recomputed,
        "index-served candidates must equal the recomputed ones")
      val p = viaIndex.queryExecution.executedPlan.toString
      // the winnow pass happened at index-build time, not here...
      assert(!p.contains("winnow_positions"),
        s"reading the index must not re-winnow:\n$p")
      // ...and the bucketed scan carries the fp hash distribution, so
      // neither the df count nor the fp self-join re-shuffles on fp
      assert(!p.contains("Exchange hashpartitioning(fp"),
        s"fp-keyed stages must ride the bucketed layout:\n$p")
      assert(p.contains("SelectedBucketsCount") || p.contains("Bucketed: true"),
        s"expected a bucketed scan:\n$p")
    }
  }
}
