package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.operators.Similarity
import graft.sources.Tables

/** Dev-only decomposition probe for the q136/q61/q100 PQ/k-means family
  * (r13 optimization round): times each phase of the trained-PQ path in
  * isolation — seed collect, each Lloyd iteration's aggregate+collect,
  * and the encode/ADC/rerank body — so the fixed per-job overhead is
  * attributable before touching the operators. Not part of any driver
  * contract.
  */
object PqProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_QPROF_RUNS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/spark-scratch")
      .config("spark.sql.warehouse.dir", "/dev/shm/graft-wh")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[pqprof] $name ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    // stage-level accounting: submission→completion wall and summed task
    // time per stage, so driver-side gaps (codegen, scheduling) separate
    // from executor work
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          val wall = (for {s <- si.submissionTime; c <- si.completionTime}
            yield (c - s) / 1e3).getOrElse(-1.0)
          println(f"[pqstage] stage=${si.stageId} tasks=${si.numTasks} " +
            f"wall=$wall%.3f s exec=${si.taskMetrics.executorRunTime / 1e3}%.3f s " +
            f"cpu=${si.taskMetrics.executorCpuTime / 1e9}%.3f s " +
            f"name=${si.name.take(60)}")
        }
      })

    // full warmup (codegen + JIT for every stage shape involved)
    Similarity.annPqTrained(spark, sfDir).write.format("noop").mode("overwrite").save()

    (1 to reps).foreach { i =>
      println(s"[pqprof] --- rep $i ---")
      val e = Tables.embeddings(spark, sfDir)
      // decompose ONE iteration's update query: analysis+optimization vs
      // physical planning vs execution vs re-execution of the same DF
      locally {
        val upd = t("iter_df_construct") { Similarity.pqIterUpdateForProfiling(e) }
        t("iter_plan_only") { upd.queryExecution.executedPlan }
        t("iter_collect1") { upd.collect() }
        t("iter_collect2") { upd.collect() }
        // second fresh DF of the SAME source shape (new literal values):
        // isolates per-new-plan cost (codegen-cache behavior) from
        // first-in-JVM cost
        val upd2 = t("iter2_df_construct") { Similarity.pqIterUpdateForProfiling(e) }
        t("iter2_collect1") { upd2.collect() }
        // aggregate variants: count-only (kernel+explode+shuffle, no
        // decimal) and plain-double sum (decimal cast removed) — sizes
        // the exact-DECIMAL accumulation's share of the map stage
        val updC = Similarity.pqIterUpdateForProfiling(e, "count")
        t("iter_countonly_cold") { updC.collect() }
        val updC2 = Similarity.pqIterUpdateForProfiling(e, "count")
        t("iter_countonly_warm") { updC2.collect() }
        val updD = Similarity.pqIterUpdateForProfiling(e, "sumdouble")
        t("iter_sumdouble_cold") { updD.collect() }
        val updD2 = Similarity.pqIterUpdateForProfiling(e, "sumdouble")
        t("iter_sumdouble_warm") { updD2.collect() }
      }
      val cb = t("train_2iters") { Similarity.trainPqCodebooks(e) }
      t("annPqFrom_body") {
        Similarity.annPqFrom(e, Some(cb))
          .write.format("noop").mode("overwrite").save()
      }
      t("train_iter_single") { Similarity.trainPqCodebooks(e, iters = 1) }
      t("train_iter0_seedsonly") { Similarity.trainPqCodebooks(e, iters = 0) }
      t("full_q136") {
        Similarity.annPqTrained(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      }
      t("full_q100_seeded") {
        Similarity.annPq(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      }
      t("full_q61") {
        Similarity.kmeansTrain(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
