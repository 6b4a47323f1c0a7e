package graft.app

import org.scalatest.funspec.AnyFunSpec

import graft.TestSpark

class CorpusPipelineSpec extends AnyFunSpec {
  private lazy val spark = TestSpark.spark

  describe("CorpusPipeline curation flow") {
    it("monotonically narrows the corpus and writes both output formats") {
      val out = "/dev/shm/graft-test-corpus"
      val r = CorpusPipeline.run(spark, TestSpark.Sf, out)
      assert(r.n_input > 0)
      assert(r.n_lang_kept <= r.n_input)
      assert(r.n_quality_kept <= r.n_lang_kept)
      assert(r.n_after_exact <= r.n_quality_kept)
      assert(r.n_output == r.n_after_exact - r.n_near_dup_dropped -
        r.n_contaminated - r.n_repetitive)
      assert(r.n_output > 0)
      // both sinks carry the same corpus
      val pq = spark.read.parquet(s"$out/corpus_parquet")
      val jl = graft.sources.Jsonl.readDocuments(spark, s"$out/corpus_jsonl")
      assert(pq.count() == jl.count())
      // the parquet sink is hive-partitioned on the split assignment and
      // benchmark stand-ins never reach the corpus
      assert(pq.select("split").distinct().count() <= 3)
      assert(pq.filter(org.apache.spark.sql.functions.col("doc_id") <
        graft.operators.Curation.BenchDocs).count() == 0)
      // cleaned corpus has no exact duplicates left
      import org.apache.spark.sql.functions._
      val norm = trim(regexp_replace(
        regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""), "\\s+", " "))
      assert(pq.select(md5(norm).as("fp")).distinct().count() == r.n_output)
      // the packing manifest covers exactly the released corpus with a
      // gapless token layout
      val pk = spark.read.parquet(s"$out/packing_parquet")
      assert(pk.count() == r.n_output)
      assert(r.n_sequences >= 1)
      val totTokens = pk.agg(sum("n_tokens")).collect()(0).getLong(0)
      val lastEnd = pk.agg(max(col("start_off") + col("n_tokens")))
        .collect()(0).getLong(0)
      assert(totTokens == lastEnd, "packing offsets must be gapless")
      // the synthetic corpus has no PII to scrub — the stage must be a
      // clean no-op on it (the q62 gate exercises the hit paths)
      assert(r.n_pii_docs == 0)
      // the shard deal covers every packed sequence exactly once, with
      // dense positions inside each shard directory
      val sh = spark.read.parquet(s"$out/shards_parquet")
      assert(sh.count() == r.n_sequences)
      assert(sh.select("seq_id").distinct().count() == r.n_sequences)
      assert(r.n_shards >= 1 &&
        r.n_shards <= graft.operators.Curation.NumShards)
      val dense = sh.groupBy("shard")
        .agg(count(lit(1)).as("n"), max("shard_pos").as("mx"))
        .collect()
      dense.foreach(x =>
        assert(x.getAs[Long]("mx") == x.getAs[Long]("n") - 1,
          s"shard ${x.get(0)} positions must be dense from 0"))
    }

    it("is deterministic") {
      val a = CorpusPipeline.run(spark, TestSpark.Sf, "/dev/shm/graft-test-corpus-a")
      val b = CorpusPipeline.run(spark, TestSpark.Sf, "/dev/shm/graft-test-corpus-b")
      assert(a == b)
    }
  }

  describe("trainingShards (q89→q52→q63→q81 as ONE chained job)") {
    it("the one-lineage chain hashes identically to the stage-materialized run, and is deterministic") {
      import org.apache.spark.sql.functions._
      val docs = graft.sources.Tables.documents(spark, TestSpark.Sf)
      def hashOf(df: org.apache.spark.sql.DataFrame): String = {
        val rows = df.orderBy("shard", "shard_pos").collect()
          .map(_.toSeq.map(String.valueOf).mkString("|")).mkString("\n")
        java.security.MessageDigest.getInstance("MD5")
          .digest(rows.getBytes("UTF-8")).map("%02x".format(_)).mkString
      }
      val end = CorpusPipeline.trainingShards(docs)
      val chained = hashOf(end)
      assert(end.count() > 0, "the chained artifact must not be empty")
      // staged twin: materialize every stage boundary like the
      // production CTAS flow; compose ≡ staged is the proof that the
      // verified per-operator plans fuse into one lineage without a
      // driver-side cliff between them
      val out = "/dev/shm/graft-test-chain"
      graft.operators.Dedup.keepLedgerFrom(docs)
        .write.mode("overwrite").parquet(s"$out/ledger")
      val kept = docs.join(spark.read.parquet(s"$out/ledger")
        .filter(col("keep")).select("doc_id"), Seq("doc_id"))
      graft.operators.Curation.mixtureKeepDocs(kept)
        .write.mode("overwrite").parquet(s"$out/mixed")
      graft.operators.Curation.packSequencesFrom(
          spark.read.parquet(s"$out/mixed"))
        .write.mode("overwrite").parquet(s"$out/packing")
      val staged = hashOf(graft.operators.Curation.shuffleShardsFrom(
        spark.read.parquet(s"$out/packing")))
      assert(chained == staged,
        "chained artifact must hash-match the stage-materialized run")
      assert(hashOf(CorpusPipeline.trainingShards(docs)) == chained,
        "the chain must be deterministic across runs")
    }
  }
}
