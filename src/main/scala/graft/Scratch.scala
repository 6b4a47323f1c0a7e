package graft
import org.apache.spark.sql.SparkSession
import graft.operators.{Dedup, Similarity}

/** Dev-only probe harness (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/spark-scratch")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val wh = "/dev/shm/graft-scale-smoke"
    val emb = spark.read.parquet(s"$wh/embeddings")
    val docs = spark.read.parquet(s"$wh/documents")
    def best(name: String, n: Int)(f: => Long): Unit = {
      val times = (1 to n).map { _ =>
        val t0 = System.nanoTime(); val r = f; ((System.nanoTime() - t0) / 1e9, r)
      }
      println(f"[scratch] $name: rows=${times.head._2} min=${times.map(_._1).min}%.1f med=${times.map(_._1).sorted.apply(n / 2)}%.1f")
    }
    best("knn 20k", 3) { Similarity.knnBruteFrom(emb).count() }
    best("ann 20k", 3) { Similarity.annLshFrom(emb).count() }
    // exact-dedup-first pipeline: collapse identical docs, then LSH
    best("dedup-then-minhash", 2) {
      val canonical = docs
        .withColumn("fp", org.apache.spark.sql.functions.md5(
          org.apache.spark.sql.functions.col("text")))
        .dropDuplicates("fp")
      Dedup.candidatePairsFrom(Dedup.bandsFrom(canonical)).count()
    }
    spark.stop()
  }
}
