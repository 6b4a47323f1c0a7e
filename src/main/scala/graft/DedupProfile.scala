package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFns
import graft.operators.Dedup
import graft.sources.Tables

/** Dev-only stage-level profiler for the dedup pipeline: times each
  * sub-relation of q22/q24 in isolation to locate where wall-clock goes
  * (bands agg vs band join vs shingle explode vs verify joins).
  */
object DedupProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/spark-scratch")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name ${(System.nanoTime() - t0) / 1e9}%.2f s -> $r")
      r
    }
    val docs = Tables.documents(spark, sfDir)
    docs.cache().count()
    time("warmup-docs-count")(docs.count())

    // q22 sub-stages
    val sh = docs.repartition(col("doc_id"))
      .select(col("doc_id"),
        explode(TextFns.shingles2(TextFns.toks(col("text")))).as("s"))
      .select(col("doc_id"), TextFns.hash60(col("s")).as("h"))
    time("shingle-hash-count")(sh.count())
    time("shingle-hash-count2")(sh.count())
    val bands = Dedup.bandsFrom(docs)
    time("bands-count")(bands.count())
    time("bands-count2")(bands.count())
    val pairs = Dedup.candidatePairsFrom(bands)
    time("pairs-count")(pairs.count())
    time("pairs-count2")(pairs.count())
    time("q22-full-write")(
      Dedup.minhashCandidates(spark, sfDir)
        .write.mode("overwrite").parquet("/dev/shm/graft-prof/pairs"))
    time("q22-full-write2")(
      Dedup.minhashCandidates(spark, sfDir)
        .write.mode("overwrite").parquet("/dev/shm/graft-prof/pairs"))

    // q24 sub-stages over materialized pairs
    val mpairs = spark.read.parquet("/dev/shm/graft-prof/pairs")
    val ex = docs.repartition(col("doc_id"))
      .select(col("doc_id"),
        explode(array_distinct(TextFns.shingles2(TextFns.toks(col("text"))))).as("sx"))
      .select(col("doc_id"), TextFns.hash60(col("sx")).as("s"))
    time("ex-count")(ex.count())
    time("ex-count2")(ex.count())
    val inter = mpairs
      .join(ex.select(col("doc_id").as("doc_a"), col("s")), Seq("doc_a"))
      .join(ex.select(col("doc_id").as("doc_b"), col("s")), Seq("doc_b", "s"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_common"))
    time("inter-count")(inter.count())
    time("inter-count2")(inter.count())
    time("q24-of-pairs")(Dedup.ngramJaccardOfPairs(mpairs, docs).count())
    time("q24-of-pairs2")(Dedup.ngramJaccardOfPairs(mpairs, docs).count())
    spark.stop()
  }
}
