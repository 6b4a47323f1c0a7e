package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.SkewJoin
import graft.sources.Tables
import graft.streaming.Sessionize

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
    val sf = "/root/testdata/sf0.01"

    // sessionize the REAL events table (batch semantics of the operator)
    val ev = Tables.events(spark, sf)
    val sessions = Sessionize.sessions(ev)
    val stats = sessions.groupBy().agg(
      count(lit(1)).as("n_sessions"),
      countDistinct(col("user_id")).as("n_users"),
      sum("n_events").as("events_in_closed"),
      max("n_events").as("max_len")).collect()(0)
    println(s"[probe] sessions(sf0.01 events): closed=${stats.getLong(0)} users=${stats.getLong(1)} " +
      s"events=${stats.getLong(2)} maxLen=${stats.getInt(3)}")
    // sanity: closed-session event totals cannot exceed total events
    val totalEv = ev.count()
    println(s"[probe] total events=$totalEv >= closed-session events: ${stats.getLong(2) <= totalEv}")

    // salted join vs plain join on the real lineitem/supplier tables
    val l = Tables.lineitem(spark, sf).withColumnRenamed("l_suppkey", "s_suppkey")
    val s = Tables.supplier(spark, sf)
    val plain = l.join(s, Seq("s_suppkey")).agg(count(lit(1)), sum("l_quantity")).collect()(0)
    val salted = SkewJoin.salted(l, s, "s_suppkey", 8).agg(count(lit(1)), sum("l_quantity")).collect()(0)
    println(s"[probe] salted==plain: ${plain.toString == salted.toString} ($plain vs $salted)")
    spark.stop()
  }
}
