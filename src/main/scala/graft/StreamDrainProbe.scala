package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Dev-only r13 probe: per-micro-batch durationMs breakdown for the
  * drained streams (query planning vs WAL commits vs state commits vs
  * addBatch), to size the fixed per-drain floor the r12 round measured
  * but never decomposed. Not part of any driver contract.
  */
object StreamDrainProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/spark-scratch")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // mirror Bench's streaming dials (hdfs provider @ 2 state partitions)
    spark.conf.set(graft.streaming.EventStream.StateProviderConf,
      graft.streaming.EventStream.HdfsStateProvider)
    spark.conf.set(graft.streaming.EventStream.StatePartitionsConf, "2")

    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          val wall = (for {s <- si.submissionTime; c <- si.completionTime}
            yield (c - s) / 1e3).getOrElse(-1.0)
          if (wall > 0.05)
            println(f"[sdpstage] id=${si.stageId} tasks=${si.numTasks} " +
              f"wall=$wall%.2f exec=${si.taskMetrics.executorRunTime / 1e3}%.2f " +
              f"cpu=${si.taskMetrics.executorCpuTime / 1e9}%.2f")
        }
      })
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit =
        println(s"[sdp] started ${e.name} at ${System.nanoTime() / 1000000}")
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        import scala.jdk.CollectionConverters._
        val d = p.durationMs.asScala.toSeq.sortBy(-_._2).map {
          case (k, v) => s"$k=$v" }.mkString(" ")
        println(s"[sdp] ${p.name} batch=${p.batchId} rows=${p.numInputRows} $d")
      }
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit =
        println(s"[sdp] terminated at ${System.nanoTime() / 1000000}")
    })

    import graft.streaming.EventStream
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[sdp] TOTAL $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    (1 to 2).foreach { pass =>
      time(s"q49_rates pass$pass") {
        EventStream.streamedRates(spark, sfDir).count()
      }
      time(s"q50_join pass$pass") {
        EventStream.streamedRangeJoin(spark, sfDir).count()
      }
    }
    spark.stop()
  }
}
