package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Det.nullIfZero
import graft.functions.TextFns
import graft.sources.Tables

/** Deduplication operators over the `documents` table: exact (hash
  * groupBy), MinHash+LSH candidate generation, SimHash signatures, and
  * n-gram Jaccard verification of LSH candidates.
  *
  * Scale design (100 TB):
  *  - exact dedup is one hash-shuffle on a 128-bit fingerprint — the
  *    partial/final hash aggregate combines map-side, so the shuffle
  *    carries one row per distinct fingerprint per partition;
  *  - MinHash signatures are per-row map work (no shuffle); the LSH
  *    band join shuffles on (band_id, band_key) — that bucket-join IS
  *    the algorithm: candidate pairs only ever meet inside a bucket, so
  *    the quadratic blow-up is confined to same-signature groups;
  *  - SimHash is explode → 32 conditional int sums: map-side combine
  *    reduces each doc to one 32-column row before the shuffle;
  *  - Jaccard verification joins the candidate pair list (small by
  *    construction) back to shingle sets — two hash joins on doc_id.
  */
object Dedup {

  /** MinHash parameters: 8 signatures in 4 bands of 2 rows. */
  val NumHashes = 8
  val NumBands = 4
  val RowsPerBand = 2

  /** SimHash width in bits. */
  val SimBits = 32

  /** Jaccard acceptance threshold for verified near-dups. */
  val JaccardMin = 0.1

  private def normText = trim(regexp_replace(
    regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""), "\\s+", " "))

  private val normSql =
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), '\\s+', ' ', 'g'))"

  /** q21 — exact dedup summary: docs grouped by normalized-text md5. */
  def exactDedup(spark: SparkSession, dir: String): DataFrame =
    exactDedupFrom(Tables.documents(spark, dir))

  def exactDedupFrom(docs: DataFrame): DataFrame =
    docs
      .select(md5(normText).as("fp"))
      .groupBy("fp").agg(count(lit(1)).as("c"))
      .agg(
        sum("c").as("n_docs"),
        count(lit(1)).as("n_distinct"),
        (sum("c") - count(lit(1))).as("n_dup_docs"),
        sum(when(col("c") > 1, 1L).otherwise(0L)).as("n_dup_clusters"))

  /** Per-doc (band_id, band_key) rows: minhash signature split into
    * bands, each band keyed by the md5 of its concatenated minhashes.
    */
  private def bands(spark: SparkSession, dir: String): DataFrame =
    bandsFrom(Tables.documents(spark, dir))

  def bandsFrom(docs: DataFrame): DataFrame = {
    val sh = TextFns.shingles2(TextFns.toks(col("text")))
    val mh = docs
      .select(col("doc_id"), sh.as("shingles"))
      .select(col("doc_id") +:
        (0 until NumHashes).map(j => TextFns.minhash(col("shingles"), j).as(s"mh$j")): _*)
    val bandStructs = (0 until NumBands).map { b =>
      val key = md5(concat((0 until RowsPerBand).map(r => col(s"mh${RowsPerBand * b + r}")): _*))
      struct(lit(b).as("band_id"), key.as("band_key"))
    }
    mh.select(col("doc_id"), explode(array(bandStructs: _*)).as("band"))
      .select(col("doc_id"), col("band.band_id").as("band_id"),
        col("band.band_key").as("band_key"))
  }

  /** SQL twin of [[bands]] (UNION ALL, one arm per band). */
  private def bandsSql: String = {
    val mhs = (0 until NumHashes).map(j => s"${TextFns.sql.minhash("shingles", j)} AS mh$j")
      .mkString(",\n    ")
    val arms = (0 until NumBands).map { b =>
      val key = (0 until RowsPerBand).map(r => s"mh${RowsPerBand * b + r}").mkString(" || ")
      s"SELECT doc_id, $b AS band_id, md5($key) AS band_key FROM mhs"
    }.mkString("\n  UNION ALL ")
    s"""toks AS (SELECT doc_id, ${TextFns.sql.toks} AS w FROM documents),
       |sh AS (SELECT doc_id, list_transform(range(len(w) - 1),
       |  i -> w[CAST(i AS INT) + 1] || ' ' || w[CAST(i AS INT) + 2]) AS shingles FROM toks),
       |mhs AS (SELECT doc_id,
       |    $mhs
       |  FROM sh),
       |bands AS (
       |  $arms)""".stripMargin
  }

  /** Distinct candidate pairs sharing at least one LSH band bucket. */
  private def candidatePairs(spark: SparkSession, dir: String): DataFrame =
    candidatePairsFrom(bands(spark, dir))

  def candidatePairsFrom(b: DataFrame): DataFrame = {
    b.alias("a")
      .join(b.alias("b"),
        col("a.band_id") === col("b.band_id") &&
          col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  private val candidatePairsSql =
    """pairs AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM bands a JOIN bands b
      |    ON a.band_id = b.band_id AND a.band_key = b.band_key
      |   AND a.doc_id < b.doc_id)""".stripMargin

  /** q22 — MinHash+LSH near-dup candidate pairs. */
  def minhashCandidates(spark: SparkSession, dir: String): DataFrame =
    candidatePairs(spark, dir).orderBy("doc_a", "doc_b")

  /** q23 — 32-bit SimHash per document: per-bit majority vote over
    * token hashes (+1 when the bit is set, −1 when clear; bit b of the
    * signature is 1 iff the vote is positive).
    */
  def simhash(spark: SparkSession, dir: String): DataFrame =
    simhashFrom(Tables.documents(spark, dir))

  def simhashFrom(docs: DataFrame): DataFrame = {
    val th = docs
      .select(col("doc_id"), explode(TextFns.toks(col("text"))).as("tok"))
      .select(col("doc_id"), TextFns.hash32(col("tok")).as("h"))
    val votes = (0 until SimBits).map(b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"v$b"))
    val sig = (0 until SimBits)
      .map(b => when(col(s"v$b") > 0, lit(1L << b)).otherwise(lit(0L)))
      .reduce(_ + _)
    th.groupBy("doc_id").agg(votes.head, votes.tail: _*)
      .select(col("doc_id"), sig.as("simhash32"))
      .orderBy("doc_id")
  }

  /** q24 — n-gram Jaccard verification of the LSH candidates: exact
    * similarity on distinct word-bigram sets, thresholded.
    */
  def ngramJaccard(spark: SparkSession, dir: String): DataFrame =
    ngramJaccardFrom(Tables.documents(spark, dir))

  def ngramJaccardFrom(docs: DataFrame): DataFrame = {
    val sh = docs
      .select(col("doc_id"),
        array_distinct(TextFns.shingles2(TextFns.toks(col("text")))).as("sh"))
    candidatePairsFrom(bandsFrom(docs))
      .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        round(size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          nullIfZero(size(array_union(col("sh_a"), col("sh_b")))), 9).as("jaccard"))
      .filter(col("jaccard") >= JaccardMin)
      .orderBy("doc_a", "doc_b")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q21_exact_dedup" -> (exactDedup _),
    "q22_minhash_candidates" -> (minhashCandidates _),
    "q23_simhash" -> (simhash _),
    "q24_ngram_jaccard" -> (ngramJaccard _))

  val oracle: Map[String, String] = Map(
    "q21_exact_dedup" ->
      s"""WITH fps AS (SELECT md5($normSql) AS fp FROM documents),
         |grouped AS (SELECT fp, count(*) AS c FROM fps GROUP BY fp)
         |SELECT CAST(sum(c) AS BIGINT) AS n_docs,
         |  count(*) AS n_distinct,
         |  CAST(sum(c) - count(*) AS BIGINT) AS n_dup_docs,
         |  CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_clusters
         |FROM grouped""".stripMargin,
    "q22_minhash_candidates" ->
      s"""WITH $bandsSql,
         |$candidatePairsSql
         |SELECT doc_a, doc_b FROM pairs ORDER BY doc_a, doc_b""".stripMargin,
    "q23_simhash" -> {
      val votes = (0 until SimBits).map(b =>
        s"sum(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS v$b").mkString(",\n    ")
      val sig = (0 until SimBits)
        .map(b => s"CASE WHEN v$b > 0 THEN ${1L << b} ELSE 0 END")
        .mkString(" + ")
      s"""WITH toks AS (SELECT doc_id, ${TextFns.sql.toks} AS w FROM documents),
         |th AS (SELECT doc_id, ${TextFns.sql.hash32("tok")} AS h
         |       FROM (SELECT doc_id, unnest(w) AS tok FROM toks)),
         |agg AS (SELECT doc_id,
         |    $votes
         |  FROM th GROUP BY doc_id)
         |SELECT doc_id, CAST($sig AS BIGINT) AS simhash32 FROM agg ORDER BY doc_id""".stripMargin
    },
    "q24_ngram_jaccard" ->
      s"""WITH $bandsSql,
         |$candidatePairsSql,
         |shd AS (SELECT doc_id, list_distinct(shingles) AS s FROM sh)
         |SELECT doc_a, doc_b,
         |  round(CAST(len(list_distinct(list_intersect(sa.s, sb.s))) AS DOUBLE) /
         |    NULLIF(len(list_distinct(list_concat(sa.s, sb.s))), 0), 9) AS jaccard
         |FROM pairs
         |JOIN shd sa ON pairs.doc_a = sa.doc_id
         |JOIN shd sb ON pairs.doc_b = sb.doc_id
         |WHERE round(CAST(len(list_distinct(list_intersect(sa.s, sb.s))) AS DOUBLE) /
         |    NULLIF(len(list_distinct(list_concat(sa.s, sb.s))), 0), 9) >= $JaccardMin
         |ORDER BY doc_a, doc_b""".stripMargin)
}
