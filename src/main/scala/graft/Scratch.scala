package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.streaming.EventStream

/** Dev-only probe harness (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = "/root/testdata/sf0.001"

    // drive the streaming surface end-to-end
    val q = EventStream.runAvailableNow(spark, sf, "probe_stream")
    println(s"[probe] stream status=${q.status.message} isActive=${q.isActive}")
    val t = spark.table("probe_stream")
    println(s"[probe] streamed rows=${t.count()}")
    t.orderBy("window_start", "event_type").show(4, false)

    // probe: run it twice into a fresh sink — same result? (restartability)
    EventStream.runAvailableNow(spark, sf, "probe_stream2")
    val again = spark.table("probe_stream2").count()
    println(s"[probe] second run rows=$again (first=${t.count()})")

    // refactored query surface still serves the driver contract
    val e = SparkEntry.entry(spark)
    println(s"[probe] entry rows=${e.count()}")
    println(s"[probe] q24 via refactored core rows=${SparkEntry.queries("q24_ngram_jaccard")(spark, sf).count()}")
    spark.stop()
  }
}
