package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Dev-only probe harness (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val feats = Multimodal.decodeFeatures(
      Multimodal.payloads(spark, "/root/testdata/sf0.001"))
    val n = feats.count()
    val f0 = feats.filter(_.doc_id == 0L).head()
    println(s"[probe] decodeFeatures rows=$n doc0: bytes=${f0.n_bytes} w=${f0.width} h=${f0.height} hist=${f0.histogram.map(x => f"$x%.3f").mkString(",")}")
    println(s"[probe] hist sums to ${f0.histogram.sum}")
    // edge: empty payload through the same pipeline
    val empty = Seq((99L, Array.emptyByteArray)).toDF("doc_id", "payload")
    val fe = Multimodal.decodeFeatures(empty).head()
    println(s"[probe] empty payload: bytes=${fe.n_bytes} w=${fe.width} h=${fe.height} hist=${fe.histogram.mkString(",")}")
    spark.stop()
  }
}
