package graft

import org.apache.spark.sql.SparkSession

import graft.operators.Dedup
import graft.sources.Tables

/** Dev-only probe: print the AQE FINAL plan of the LSH band self-join to
  * confirm the two band pipelines collapse into one via runtime exchange
  * reuse (the initial plan always shows both sides).
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/spark-scratch")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = Dedup.candidatePairsFrom(Dedup.bandsFrom(Tables.documents(spark, sf)))
    df.collect() // materialize THIS execution so AQE finalizes it
    val plan = df.queryExecution.executedPlan.toString
    println("[probe] q22 reused=" + plan.contains("ReusedExchange"))
    println(plan.linesIterator.take(40).mkString("\n"))

    val j = Dedup.ngramJaccardFrom(Tables.documents(spark, sf))
    j.collect()
    val jp = j.queryExecution.executedPlan.toString
    // q24 references the sorted-shingle relation twice (doc_a / doc_b
    // sides); count how many times the kernel is evaluated in the final
    // plan vs reused
    println("[probe] q24 reused=" + jp.contains("ReusedExchange") +
      " kernelEvals=" + "sorted_shingle_hashes".r.findAllIn(jp).length)
    spark.stop()
  }
}
