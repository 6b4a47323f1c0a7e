package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole forked test JVM. */
object TestSpark {
  // local[4, 4]: 4 threads with spark.task.maxFailures = 4, so the
  // retry-determinism gate can inject first-attempt task failures and
  // prove retried tasks cannot flip a gated hash
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4, 4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.local.dir", "/dev/shm/spark-scratch")
    .config("spark.sql.warehouse.dir", "/dev/shm/graft-test-warehouse")
    .getOrCreate()

  val Sf = "/root/testdata/sf0.001"
}
