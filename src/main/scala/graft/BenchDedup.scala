package graft

import org.apache.spark.sql.SparkSession

import graft.operators.Dedup
import graft.sources.Tables

/** Dev-only focused profiler for the dedup bench queries (q22/q24) —
  * mirrors Bench's session config so regressions seen in the driver's
  * BENCH_r{N}.json can be reproduced in isolation.
  */
object BenchDedup {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val wh = "/dev/shm/graft-bench-wh"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/spark-scratch")
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[dedup-bench] $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    time("q22_minhash_candidates") {
      Dedup.minhashCandidates(spark, sfDir)
        .write.mode("overwrite").parquet(s"$wh/pairs")
    }
    time("q22_again") {
      Dedup.minhashCandidates(spark, sfDir)
        .write.mode("overwrite").parquet(s"$wh/pairs")
    }
    time("q24_ngram_jaccard") {
      Dedup.ngramJaccardOfPairs(
        spark.read.parquet(s"$wh/pairs"), Tables.documents(spark, sfDir)).count()
    }
    time("q24_again") {
      Dedup.ngramJaccardOfPairs(
        spark.read.parquet(s"$wh/pairs"), Tables.documents(spark, sfDir)).count()
    }
    spark.stop()
  }
}
