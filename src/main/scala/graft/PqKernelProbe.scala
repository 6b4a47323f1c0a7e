package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.plans.GraftFunctions
import graft.sources.Tables

/** Dev-only micro-probe for the q136 map-stage mystery: the PQ
  * iteration's single-task map stage burns ~0.7 s CPU on 2,000 rows
  * even after the fused-kernel change and with the decimal aggregate
  * removed. Times a matrix of reduced variants (warm, 3 runs each) and
  * prints codegen stats for the full shape, to separate: explode cost,
  * slice cost, kernel cost, struct cost, and JIT-refusal of a huge
  * generated method. Not part of any driver contract.
  */
object PqKernelProbe {
  private val PqM = 8
  private val PqD = 8
  private val PqK = 16
  private val SeedBase = 10L

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val wscg = sys.env.getOrElse("SPARK_GRAFT_PROBE_WSCG", "true")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/spark-scratch")
      .config("spark.sql.codegen.wholeStage", wscg)
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftFunctions.register(spark)

    val e0 = Tables.embeddings(spark, sfDir)
      .select(col("vec_id").cast("long").as("vec_id"),
        col("embedding").cast("array<double>").as("emb"))
    val seeds = e0.filter(col("vec_id") >= SeedBase && col("vec_id") < SeedBase + PqK)
      .orderBy("vec_id").select(col("emb"))
      .collect().toIndexedSeq.map(_.getSeq[Double](0))
    val cents = (0 until PqM).map(m => seeds.map(_.slice(m * PqD, (m + 1) * PqD)))
    def dotSeq(a: Seq[Double], b: Seq[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < math.min(a.length, b.length)) { s += a(i) * b(i); i += 1 }
      s
    }

    def time(name: String, runs: Int = 3)(mk: => DataFrame): Unit = {
      // fresh DF each run (fresh plan; codegen cache may or may not hit)
      (1 to runs).foreach { i =>
        val df = mk
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"[probe] $name run$i ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }

    def scoresOf(m: Int): Column = {
      val sub = slice(col("emb"), m * PqD + 1, PqD)
      val cbLit = typedlit(cents(m).map(_.toSeq))
      val ccLit = typedlit(cents(m).map(c => dotSeq(c, c)))
      call_function("adc_cell_scores", sub, cbLit, ccLit)
    }
    def cellOf(m: Int): Column = {
      val s = scoresOf(m)
      (array_position(s, array_min(s)) - 1).cast("int")
    }
    def structOf(m: Int): Column =
      struct(lit(m).as("m"), cellOf(m).as("cell"),
        slice(col("emb"), m * PqD + 1, PqD).as("v"))

    // sampling mode: run the real update in a loop for external jstack
    if (sys.env.get("SPARK_GRAFT_PROBE_LOOP").contains("1")) {
      val df0 = graft.operators.Similarity.pqIterUpdateForProfiling(
        Tables.embeddings(spark, sfDir))
      df0.write.format("noop").mode("overwrite").save()
      println(s"[probe] pid=${ProcessHandle.current().pid()} looping")
      val t0 = System.nanoTime()
      var n = 0
      while ((System.nanoTime() - t0) / 1e9 < 150) {
        graft.operators.Similarity.pqIterUpdateForProfiling(
          Tables.embeddings(spark, sfDir))
          .write.format("noop").mode("overwrite").save()
        n += 1
      }
      println(f"[probe] loop done n=$n avg=${(System.nanoTime() - t0) / 1e9 / n}%.3f s")
      spark.stop(); return
    }

    // v-1: interleaved A/B — real path vs reconstruction, alternating,
    // run FIRST so JVM drift can't masquerade as a code-path delta
    if (sys.env.get("SPARK_GRAFT_PROBE_INTERLEAVE").contains("1")) {
      def mine(): DataFrame = {
        val e1 = Tables.widened(e0, col("vec_id")).select(col("vec_id"), col("emb"))
        e1.select(explode(array((0 until PqM).map(structOf): _*)).as("x"))
          .select(col("x.m"), col("x.cell"), col("x.v"))
          .groupBy("m", "cell")
          .agg(call_function("vector_sum_dec",
              col("v").cast("array<decimal(38,12)>")).as("sumv"),
            count(lit(1)).as("n"))
          .select(col("m"), col("cell"),
            transform(col("sumv"), x => x.cast("double") / col("n")).as("c"))
      }
      def real(): DataFrame =
        graft.operators.Similarity.pqIterUpdateForProfiling(
          Tables.embeddings(spark, sfDir))
      // warm both shapes once
      mine().write.format("noop").mode("overwrite").save()
      real().write.format("noop").mode("overwrite").save()
      (1 to 4).foreach { i =>
        time(s"ab${i}_mine", 1) { mine() }
        time(s"ab${i}_real", 1) { real() }
      }
      spark.stop(); return
    }

    // v0: scan+count baseline
    time("v0_scan_count") { e0.groupBy().count() }
    // v1: ONE subspace's kernel scores, summed (no argmin, no explode)
    time("v1_one_kernel") {
      e0.select(aggregate(scoresOf(0), lit(0.0), (a, b) => a + b).as("s"))
        .groupBy().sum("s")
    }
    // v2: all 8 kernels, summed
    time("v2_eight_kernels") {
      e0.select((0 until PqM).map(m =>
          aggregate(scoresOf(m), lit(0.0), (a, b) => a + b)).reduce(_ + _).as("s"))
        .groupBy().sum("s")
    }
    // v3: all 8 argmin cells, summed (adds array_min/array_position)
    time("v3_eight_cells") {
      e0.select((0 until PqM).map(m => cellOf(m).cast("long")).reduce(_ + _).as("s"))
        .groupBy().sum("s")
    }
    // v4: explode of 8 (m, cell) structs WITHOUT v payload
    time("v4_explode_nocarry") {
      e0.select(explode(array((0 until PqM).map(m =>
          struct(lit(m).as("m"), cellOf(m).as("cell"))): _*)).as("x"))
        .groupBy("x.m", "x.cell").count()
    }
    // v5: full shape minus decimal (explode with v payload, count agg)
    time("v5_explode_carry") {
      e0.select(explode(array((0 until PqM).map(structOf): _*)).as("x"))
        .select(col("x.m"), col("x.cell"), col("x.v"))
        .groupBy("m", "cell").count()
    }

    // v6: v5 with the widened (repartition(vec_id)) source — the exact
    // embDouble shape the real operators use
    val e1 = Tables.widened(e0, col("vec_id"))
      .select(col("vec_id"), col("emb"))
    time("v6_widened_carry") {
      e1.select(explode(array((0 until PqM).map(structOf): _*)).as("x"))
        .select(col("x.m"), col("x.cell"), col("x.v"))
        .groupBy("m", "cell").count()
    }
    // v7: v6 with the real decimal aggregate
    time("v7_widened_decimal") {
      e1.select(explode(array((0 until PqM).map(structOf): _*)).as("x"))
        .select(col("x.m"), col("x.cell"), col("x.v"))
        .groupBy("m", "cell")
        .agg(call_function("vector_sum_dec",
            col("v").cast("array<decimal(38,12)>")).as("sumv"),
          count(lit(1)).as("n"))
        .select(col("m"), col("cell"),
          transform(col("sumv"), x => x.cast("double") / col("n")).as("c"))
    }
    // v8: v7 without widening (decimal agg on the raw 1-partition scan)
    time("v8_narrow_decimal") {
      e0.select(explode(array((0 until PqM).map(structOf): _*)).as("x"))
        .select(col("x.m"), col("x.cell"), col("x.v"))
        .groupBy("m", "cell")
        .agg(call_function("vector_sum_dec",
            col("v").cast("array<decimal(38,12)>")).as("sumv"),
          count(lit(1)).as("n"))
        .select(col("m"), col("cell"),
          transform(col("sumv"), x => x.cast("double") / col("n")).as("c"))
    }

    // v9: the REAL code path (Similarity.pqIterUpdateForProfiling) in
    // this clean session — discriminates code-path vs session-state
    time("v9_real_path") {
      graft.operators.Similarity.pqIterUpdateForProfiling(
        Tables.embeddings(spark, sfDir))
    }
    // v10: real path again after a heavy warmup (the full q136), to
    // reproduce PqProfile's JVM state
    graft.operators.Similarity.annPqTrained(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    time("v10_real_after_warm") {
      graft.operators.Similarity.pqIterUpdateForProfiling(
        Tables.embeddings(spark, sfDir))
    }

    // dump both plans for diffing
    locally {
      val real = graft.operators.Similarity.pqIterUpdateForProfiling(
        Tables.embeddings(spark, sfDir))
      val mine = e1.select(explode(array((0 until PqM).map(structOf): _*)).as("x"))
        .select(col("x.m"), col("x.cell"), col("x.v"))
        .groupBy("m", "cell")
        .agg(call_function("vector_sum_dec",
            col("v").cast("array<decimal(38,12)>")).as("sumv"),
          count(lit(1)).as("n"))
        .select(col("m"), col("cell"),
          transform(col("sumv"), x => x.cast("double") / col("n")).as("c"))
      java.nio.file.Files.writeString(java.nio.file.Paths.get("/tmp/plan_real.txt"),
        real.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode))
      java.nio.file.Files.writeString(java.nio.file.Paths.get("/tmp/plan_mine.txt"),
        mine.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode))
      println("[probe] plans dumped")
    }

    // codegen stats of the full-carry shape
    val full = e0.select(explode(array((0 until PqM).map(structOf): _*)).as("x"))
      .select(col("x.m"), col("x.cell"), col("x.v"))
      .groupBy("m", "cell").count()
    val codegen = org.apache.spark.sql.execution.debug.codegenString(
      full.queryExecution.executedPlan)
    // print sizes only (full source is huge)
    println("[probe] codegen units:")
    codegen.split("\n").filter(l =>
      l.contains("WholeStageCodegen") || l.contains("Found") ||
      l.contains("subtree") || l.contains("Object[]")).take(40)
      .foreach(l => println("[probe]   " + l.take(160)))
    println(s"[probe] codegen total source chars=${codegen.length}")
    spark.stop()
  }
}
