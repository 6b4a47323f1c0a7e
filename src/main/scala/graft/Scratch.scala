package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.sources.Tables

/** Dev-only probe harness (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/spark-scratch")
      .config("spark.sql.parquet.aggregatePushdown", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = "/root/testdata/sf0.1"
    def best(name: String, n: Int)(f: => Long): Unit = {
      val times = (1 to n).map { _ =>
        val t0 = System.nanoTime(); val r = f
        ((System.nanoTime() - t0) / 1e9, r)
      }
      println(f"[scratch] $name: rows=${times.head._2} min=${times.map(_._1).min}%.2f med=${times.map(_._1).sorted.apply(n / 2)}%.2f")
    }
    val docs = Tables.documents(spark, sf)
    best("q22 current (bcast)", 3) {
      Dedup.candidatePairsFrom(Dedup.bandsFrom(docs)).count()
    }
    best("q22 shuffle_hash", 3) {
      val b = Dedup.bandsFrom(docs)
      b.alias("a").hint("shuffle_hash")
        .join(b.alias("b").hint("shuffle_hash"),
          col("a.band_id") === col("b.band_id") &&
            col("a.band_key") === col("b.band_key") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct().count()
    }
    best("q22 merge", 3) {
      val b = Dedup.bandsFrom(docs)
      b.alias("a").hint("merge")
        .join(b.alias("b"),
          col("a.band_id") === col("b.band_id") &&
            col("a.band_key") === col("b.band_key") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct().count()
    }
    spark.stop()
  }
}
