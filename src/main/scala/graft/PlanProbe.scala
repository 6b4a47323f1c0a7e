package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: print the executed plan string of one catalog query (the
  * exact text PlanQualitySpec matches against), optionally with session
  * confs set first (`k=v` args after the query name).
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val q = args.headOption.getOrElse("q66_item_cooccurrence")
    val sf = "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/spark-scratch")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(1).foreach { kv =>
      val Array(k, v) = kv.split("=", 2); spark.conf.set(k, v)
    }
    println(SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString)
    spark.stop()
  }
}
