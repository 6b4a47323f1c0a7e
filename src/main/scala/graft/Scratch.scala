package graft
import org.apache.spark.sql.SparkSession

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
    val sf = "/root/testdata/sf0.001"
    val q04 = SparkEntry.queries("q04_supplier_kpis")(spark, sf)
    println("=== q04 ===")
    println(q04.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Scan") || l.contains("Join") || l.contains("ReadSchema") || l.contains("PushedFilters"))
      .mkString("\n"))
    val q12 = SparkEntry.queries("q12_filtered_risk")(spark, sf)
    println("=== q12 ===")
    println(q12.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Scan") || l.contains("PushedFilters"))
      .mkString("\n"))
    spark.stop()
  }
}
