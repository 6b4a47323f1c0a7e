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

    it("the fp index carries a parquet bloom filter that skips row groups stats cannot") {
      import scala.jdk.CollectionConverters._
      import spark.implicits._
      import org.apache.parquet.filter2.compat.FilterCompat
      import org.apache.parquet.filter2.predicate.FilterApi
      import org.apache.parquet.hadoop.ParquetFileReader
      import org.apache.parquet.hadoop.util.HadoopInputFile
      val tbl = graft.operators.TextAnalysis.winnowIndexFor(spark, sf)
      val conf = spark.sparkContext.hadoopConfiguration
      val inputFile = HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(tbl.inputFiles.head), conf)
      // 1. the footer advertises a bloom filter on the fp column chunk
      locally {
        val r = ParquetFileReader.open(inputFile)
        try {
          val fpCol = r.getFooter.getBlocks.get(0).getColumns.asScala
            .find(_.getPath.toDotString == "fp").get
          assert(fpCol.getBloomFilterOffset > 0,
            "the fp column must carry a written bloom filter")
        } finally r.close()
      }
      // 2. a probe value INSIDE the file's min/max but absent: the
      // uniform-hash case where zone maps keep the row group and only
      // the bloom filter can skip it
      val fps = spark.read.parquet(tbl.inputFiles.head)
        .select("fp").as[Long].collect().toSet
      assert(fps.size >= 2)
      val absent = Iterator.iterate(fps.min + 1)(_ + 1)
        .find(v => !fps.contains(v)).get
      assert(absent < fps.max)
      val pred = FilterApi.eq(FilterApi.longColumn("fp"),
        java.lang.Long.valueOf(absent))
      def filteredRows(useBloom: Boolean): Long = {
        val opts = org.apache.parquet.HadoopReadOptions.builder(conf)
          .withRecordFilter(FilterCompat.get(pred))
          .useBloomFilter(useBloom)
          .useStatsFilter(true)
          .useDictionaryFilter(false) // isolate bloom vs zone maps
          .build()
        val r = ParquetFileReader.open(inputFile, opts)
        try r.getFilteredRecordCount finally r.close()
      }
      assert(filteredRows(useBloom = false) > 0,
        "zone maps alone must retain the row group (probe sits inside min/max)")
      assert(filteredRows(useBloom = true) == 0L,
        "the bloom filter must skip every row group for the absent key")
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
