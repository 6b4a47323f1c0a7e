package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.plans.GraftFunctions

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
    GraftFunctions.register(spark)
    def best(name: String, n: Int)(f: => Long): Unit = {
      val times = (1 to n).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[scratch] $name: min=${times.min}%.2f med=${times.sorted.apply(n / 2)}%.2f")
    }
    // micro-bench: fused expression vs composed higher-order, all-pairs
    // cosine over 2000 vectors (4M pairs x 64 dims)
    val e = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.1")
      .repartition(col("vec_id"))
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val a = e.select(col("vec_id").as("ida"), col("emb").as("a"))
    val b = e.select(col("vec_id").as("idb"), col("emb").as("b"))
    def dot(x: String, y: String) =
      aggregate(zip_with(col(x), col(y), (p, q) => p * q), lit(0.0), (acc, v) => acc + v)
    best("all-pairs fused codegen", 3) {
      a.crossJoin(b).select(call_function("cosine_similarity", col("a"), col("b")).as("c"))
        .agg(sum("c")).collect(); 0L
    }
    best("all-pairs composed HOF", 3) {
      a.crossJoin(b).select((dot("a", "b") / (sqrt(dot("a", "a")) * sqrt(dot("b", "b")))).as("c"))
        .agg(sum("c")).collect(); 0L
    }
    // confirm codegen: plan should show no CodegenFallback for the call
    val plan = a.crossJoin(b)
      .select(call_function("cosine_similarity", col("a"), col("b")).as("c"))
      .queryExecution.executedPlan.toString
    println("[scratch] wholestage codegen present: " + plan.contains("WholeStageCodegen"))
    spark.stop()
  }
}
