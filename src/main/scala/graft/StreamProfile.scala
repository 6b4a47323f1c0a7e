package graft

import org.apache.spark.sql.SparkSession

/** Dev-only profiler for the drained streaming queries (q49/q50/q65):
  * times each drain across state-partition settings to split fixed
  * micro-batch machinery (query start/stop, watermark finalization
  * batch) from per-partition state-store commit cost.
  */
object StreamProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/spark-scratch")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name ${(System.nanoTime() - t0) / 1e9}%.2f s -> $r")
      r
    }
    import graft.streaming.EventStream
    val RocksDb =
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    val Hdfs =
      "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
    val Changelog =
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
    for {
      (prov, changelog) <- Seq(("hdfs", "false"), ("rocksdb", "false"),
        ("rocksdb", "true"))
      parts <- Seq("4", "2", "1")
    } {
      // EventStream.drain overrides the Spark provider conf from its own
      // StateProviderConf for every drain, so the sweep must set THAT
      // key — setting spark.sql.streaming.stateStore.providerClass here
      // would silently measure the drain default on both arms.
      spark.conf.set(EventStream.StateProviderConf,
        if (prov == "rocksdb") RocksDb else Hdfs)
      spark.conf.set(EventStream.StatePartitionsConf, parts)
      spark.conf.set(Changelog, changelog)
      val tag = s"$prov cl=$changelog parts=$parts"
      (1 to 2).foreach { pass =>
        time(s"q49 rates $tag pass$pass") {
          EventStream.streamedRates(spark, sfDir).count()
        }
        time(s"q50 join $tag pass$pass") {
          EventStream.streamedRangeJoin(spark, sfDir).count()
        }
        time(s"q65 topk $tag pass$pass") {
          EventStream.streamedTopK(spark, sfDir).count()
        }
      }
    }
    spark.stop()
  }
}
