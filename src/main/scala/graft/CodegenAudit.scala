package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{SparkPlan, WholeStageCodegenExec}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Dev-only catalog sweep for the r13 JIT-refusal finding: HotSpot
  * refuses to compile any method over 8,000 bytecodes
  * (-XX:DontCompileHugeMethods, on by default), so a whole-stage-codegen
  * stage whose consume method crosses that line silently runs in the
  * bytecode INTERPRETER — Spark only warns/falls back at
  * `spark.sql.codegen.hugeMethodLimit` (65,535), leaving a 8k–65k dead
  * zone with no signal (q136's PQ map stage sat there at ~100× the
  * JIT-ed cost). This tool executes every declared query at the given
  * SF, walks the final adaptive plan's codegen stages, recompiles each,
  * and reports any stage whose max method exceeds the JIT limit.
  * Not part of any driver contract.
  *
  * Usage: runMain graft.CodegenAudit [startIdx [count]]
  */
object CodegenAudit {
  private def allStages(p: SparkPlan): Seq[WholeStageCodegenExec] = {
    val here = p match {
      case w: WholeStageCodegenExec => Seq(w)
      case _ => Nil
    }
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case other => other.children
    }
    here ++ kids.flatMap(allStages)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val start = args.headOption.map(_.toInt).getOrElse(0)
    val count = args.drop(1).headOption.map(_.toInt).getOrElse(Int.MaxValue)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/spark-scratch")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // Spark's own ByteCodeStats came back all-zero on this janino/JDK
    // combination, so the audit takes ground truth from the JIT itself:
    // run with SPARK_GRAFT_EXTRA_JVM="-XX:+PrintCompilation" and grep
    // the log for "hot method too big" COMPILE SKIPPED entries — each
    // names the refused generated method; this tool prints query
    // boundaries so refusals attribute to queries by position. Queries
    // run TWICE so a method must get hot enough to be submitted.
    val names = SparkEntry.queries.keys.toSeq.sorted.slice(start, start + count)
    names.foreach { name =>
      try {
        (1 to 2).foreach { _ =>
          SparkEntry.queries(name)(spark, sfDir)
            .write.format("noop").mode("overwrite").save()
        }
        println(s"[cga] $name done")
      } catch {
        case e: Throwable =>
          println(s"[cga] $name ERROR ${e.getClass.getSimpleName}: " +
            s"${Option(e.getMessage).getOrElse("").take(80)}")
      }
    }
    spark.stop()
  }
}
