package graft

import org.apache.spark.sql.SparkSession

/** Dev-only per-query timer (NOT the driver bench): times the named
  * catalog queries on SPARK_GRAFT_SF_DIR with the Bench session shape,
  * two passes, reporting both. Usage:
  *   sbt "Test/runMain graft.QTime q58_chunk_dedup q84_winnow"
  */
object QTime {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/spark-scratch")
      .config("spark.sql.warehouse.dir", "/dev/shm/graft-wh")
      .config("spark.sql.parquet.aggregatePushdown", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else Seq("q58_chunk_dedup")
    for (pass <- 1 to 2; n <- names) {
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[qtime] pass=$pass $n%-28s ${s}%.2f s")
    }
    spark.stop()
  }
}
