package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Parquet table loader over the driver corpus (`TESTDATA.md`).
  *
  * Every query in the engine reads through here so that source-level
  * concerns (format, pruning, partition sizing) live in one place.
  * Column pruning + predicate pushdown reach the parquet scan because we
  * hand Catalyst a plain `spark.read.parquet` relation — never a cached
  * RDD or a collected snapshot.
  */
object Tables {

  /** Full corpus table list (TESTDATA.md). */
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Event-time columns stored as parquet TIMESTAMP(NANOS). Spark has no
    * nanosecond timestamp type, so we read them as raw nanos-since-epoch
    * longs (`spark.sql.legacy.parquet.nanosAsLong`) and convert with
    * integer `div` (a double-precision divide would lose sub-second
    * precision at 1.7e18 nanos). Day/second-level semantics downstream are
    * unaffected.
    */
  private val nanosCols: Map[String, Seq[String]] = Map(
    "orders" -> Seq("o_orderdate"),
    "lineitem" -> Seq("l_shipdate"),
    "events" -> Seq("ts"))

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/$name.parquet")
    nanosCols.getOrElse(name, Nil).foldLeft(raw) { (df, c) =>
      if (df.schema.fieldNames.contains(c) && df.schema(c).dataType == LongType)
        df.withColumn(c, timestamp_micros(expr(s"$c div 1000")))
      else df
    }
  }

  /** Conf key gating [[widened]]: `auto` (default) widens only when the
    * scan is under-partitioned; `never` guarantees no added shuffle.
    */
  val WidenConf = "spark.graft.widenUnderPartitionedScans"

  /** Widen an under-partitioned scan for map parallelism — gated, never
    * unconditional. The single-file test fixtures give parquet one scan
    * partition, so per-row kernels (minhash, simhash, shingles, vector
    * math) would run single-core; a real multi-file 100 TB corpus already
    * has file-split parallelism and must NOT pay a corpus-wide shuffle
    * before map-only work. We therefore repartition only when the
    * physical scan yields fewer partitions than `defaultParallelism`
    * (`PlanQualitySpec` asserts no Exchange is added for already-parallel
    * input).
    */
  def widened(df: DataFrame, key: Column): DataFrame = {
    val never = df.sparkSession.conf.get(WidenConf, "auto") == "never"
    if (never || df.rdd.getNumPartitions >=
        df.sparkSession.sparkContext.defaultParallelism) df
    else df.repartition(key)
  }

  def region(spark: SparkSession, dir: String): DataFrame    = apply(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = apply(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = apply(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = apply(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = apply(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = apply(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = apply(spark, dir, "lineitem")
  def events(spark: SparkSession, dir: String): DataFrame    = apply(spark, dir, "events")
  def documents(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")
}
