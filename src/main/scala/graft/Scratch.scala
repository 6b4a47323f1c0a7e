package graft
import org.apache.spark.sql.SparkSession

/** Dev-only probe harness (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = SparkEntry.entry(spark)
    println(s"[probe] entry rows=${e.count()} cols=${e.columns.mkString(",")}")
    // probe: queries map vs oracleSql map key parity (driver pairs them)
    val qk = SparkEntry.queries.keySet
    val ok = SparkEntry.oracleSql.keySet
    println(s"[probe] queries=${qk.size} oracles=${ok.size} missingOracle=${qk -- ok} extraOracle=${ok -- qk}")
    spark.stop()
  }
}
