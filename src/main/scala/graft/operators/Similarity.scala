package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFns
import graft.plans.GraftFunctions
import graft.sources.Tables

/** Similarity search over the `embeddings` table (64-dim float
  * vectors): brute-force cosine top-k as the exact baseline, and a
  * signed-random-projection (SRP) LSH bucketed variant as the scale
  * path.
  *
  * Scale design (100 TB):
  *  - brute force broadcasts the (small) query set and computes the dot
  *    products map-side against the full corpus scan; the only shuffle
  *    carries (query_id, cosine) pairs into a per-query top-k window —
  *    partitioned by query_id, so no single-partition bottleneck;
  *  - SRP-LSH reduces each vector to a bucket id via sign bits of
  *    deterministic pseudo-random hyperplanes; candidates meet in a
  *    bucket hash-join, so comparisons scale with bucket occupancy, not
  *    corpus². Planes derive from md5(plane,coord) — no stored model,
  *    reproducible on any engine;
  *  - all vector math runs through the native codegen expressions in
  *    `graft.plans` (fused cosine / dot product) — sequential-fold
  *    double arithmetic, bitwise equal to the oracle's
  *    `list_inner_product` over `DOUBLE[]`, ~20× interpreted HOFs.
  */
object Similarity {

  /** Neighbors returned per query. */
  val K = 10

  /** Query set: vec_id < NumQueries. */
  val NumQueries = 10

  /** SRP planes → 2^NumPlanes buckets. */
  val NumPlanes = 4


  /** embedding cast to double, repartitioned: the embeddings table is a
    * single parquet file → one scan partition, and per-row vector math
    * would otherwise run single-core.
    */
  private def embDouble(df: DataFrame): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    df.repartition(col("vec_id"))
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
  }

  /** Fused codegen cosine (graft.plans.CosineSimilarity) — bit-equal to
    * `dotSeq(a,b) / (sqrt(dotSeq(a,a)) * sqrt(dotSeq(b,b)))` but one
    * generated loop instead of three interpreted higher-order passes.
    */
  private def cosine(a: Column, b: Column): Column =
    call_function("cosine_similarity", a, b)

  private def queriesOf(e: DataFrame): DataFrame =
    e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("emb").as("q_emb"))

  private def topK(scored: DataFrame, k: Int): DataFrame = {
    val rn = row_number().over(
      Window.partitionBy("query_id").orderBy(desc("cosine"), asc("neighbor_id")))
    scored.withColumn("rank", rn).filter(col("rank") <= k)
      .orderBy("query_id", "rank")
  }

  /** q25 — exact brute-force cosine top-k per query vector. */
  def knnBrute(spark: SparkSession, dir: String): DataFrame =
    knnBruteFrom(Tables.embeddings(spark, dir))

  def knnBruteFrom(embeddings: DataFrame): DataFrame = {
    val e = embDouble(embeddings)
    val scored = e.crossJoin(broadcast(queriesOf(e)))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(cosine(col("q_emb"), col("emb")), 9).as("cosine"))
    topK(scored, K)
  }

  /** Deterministic SRP hyperplane p as a LITERAL 64-dim double array:
    * weights are md5-derived in Scala with exactly the oracle's formula
    * (`ubigint(md5_hex8('pl<p>_<j>')) / 2^31 − 1`), so no hashing runs
    * per row — the plane is a constant the codegen'd dot product reads.
    */
  private def planeWeights(p: Int): Seq[Double] = (0 until 64).map { j =>
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"pl${p}_$j".getBytes("UTF-8")).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.take(8), 16).toDouble / 2147483648.0 - 1.0
  }

  private def planeVec(p: Int): Column = array(planeWeights(p).map(lit): _*)

  /** q26 — SRP-LSH bucketed ANN: bucket by hyperplane sign bits, exact
    * cosine re-rank within the bucket.
    */
  def annLsh(spark: SparkSession, dir: String): DataFrame =
    annLshFrom(Tables.embeddings(spark, dir))

  def annLshFrom(embeddings: DataFrame): DataFrame = {
    val bucket = (0 until NumPlanes)
      .map(p => when(call_function("dot_product", col("emb"), planeVec(p)) > 0,
        lit(1 << p)).otherwise(lit(0)))
      .reduce(_ + _)
    val e = embDouble(embeddings).withColumn("bucket", bucket)
    val q = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("emb").as("q_emb"),
        col("bucket").as("q_bucket"))
    val scored = e.join(broadcast(q),
        col("bucket") === col("q_bucket") && col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("bucket"),
        round(cosine(col("q_emb"), col("emb")), 9).as("cosine"))
    val rn = row_number().over(
      Window.partitionBy("query_id").orderBy(desc("cosine"), asc("neighbor_id")))
    scored.withColumn("rank", rn).filter(col("rank") <= K)
      .select("query_id", "neighbor_id", "bucket", "cosine", "rank")
      .orderBy("query_id", "rank")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q25_knn_bruteforce" -> (knnBrute _),
    "q26_ann_lsh" -> (annLsh _))

  private val eCte =
    """e AS (SELECT vec_id, embedding::DOUBLE[] AS emb,
      |  sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
      |  FROM embeddings)""".stripMargin

  private def planeSql(p: Int): String =
    s"""list_transform(range(64), j ->
       |  (${TextFns.sql.hash32(s"'pl${p}_' || CAST(j AS INT)")} / 2147483648.0) - 1.0)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q25_knn_bruteforce" ->
      s"""WITH $eCte,
         |q AS (SELECT vec_id AS query_id, emb AS q_emb, nrm AS q_nrm FROM e
         |      WHERE vec_id < $NumQueries),
         |scored AS (
         |  SELECT query_id, e.vec_id AS neighbor_id,
         |    round(list_inner_product(q_emb, emb) / (q_nrm * nrm), 9) AS cosine
         |  FROM e CROSS JOIN q WHERE e.vec_id <> q.query_id),
         |rk AS (SELECT *, row_number() OVER
         |  (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank FROM scored)
         |SELECT query_id, neighbor_id, cosine, CAST(rank AS INT) AS rank
         |FROM rk WHERE rank <= $K ORDER BY query_id, rank""".stripMargin,
    "q26_ann_lsh" -> {
      val bucket = (0 until NumPlanes)
        .map(p => s"CASE WHEN list_inner_product(emb, ${planeSql(p)}) > 0 THEN ${1 << p} ELSE 0 END")
        .mkString("(", " + ", ")")
      s"""WITH $eCte,
         |b AS (SELECT vec_id, emb, nrm, $bucket AS bucket FROM e),
         |q AS (SELECT vec_id AS query_id, emb AS q_emb, nrm AS q_nrm, bucket AS q_bucket
         |      FROM b WHERE vec_id < $NumQueries),
         |scored AS (
         |  SELECT query_id, b.vec_id AS neighbor_id, b.bucket,
         |    round(list_inner_product(q_emb, emb) / (q_nrm * nrm), 9) AS cosine
         |  FROM b JOIN q ON b.bucket = q.q_bucket AND b.vec_id <> q.query_id),
         |rk AS (SELECT *, row_number() OVER
         |  (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank FROM scored)
         |SELECT query_id, neighbor_id, bucket, cosine, CAST(rank AS INT) AS rank
         |FROM rk WHERE rank <= $K ORDER BY query_id, rank""".stripMargin
    })
}
