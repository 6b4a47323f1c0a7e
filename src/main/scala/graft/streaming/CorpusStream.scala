package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types._

import graft.operators.TextAnalysis

/** Streaming surface over the `documents` table: corpus-ingest
  * monitoring as Structured Streaming jobs. Where [[EventStream]] twins
  * the event-time operators, this twins the corpus-quality ones — the
  * shape of a drop-folder ingest where document batches land as files
  * and curation dashboards track rejection rates continuously.
  */
object CorpusStream {

  /** Explicit read schema (streaming sources do not infer). */
  val docsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Unbounded source over a directory of document parquet files. */
  def source(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(docsSchema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir)

  /** q90 — the q88 quality funnel as a STREAMING ingest monitor: the
    * same map-side flags + single-row counter aggregate run in
    * complete mode over the document stream, so every micro-batch
    * updates the running attrition counters — the reject-rate
    * dashboard a continuous ingest feeds. A drained AvailableNow run
    * equals batch q88 exactly, which is what the shared oracle gate
    * asserts.
    *
    * Scale shape: state is ONE counter row (9 longs) regardless of
    * corpus volume — the flags are map work, the aggregate combines
    * partially per batch; no watermark needed because the aggregate is
    * global and monotone. The unpivot to the 4-row report happens on
    * the sink, not in the stream.
    */
  def streamedFunnel(spark: SparkSession, dir: String): DataFrame = {
    EventStream.drain(TextAnalysis.funnelAgg(source(spark, dir)),
      "graft_q90_sink", OutputMode.Complete)
    TextAnalysis.funnelReport(spark.table("graft_q90_sink"))
  }

  /** q220 — the q218 quality MODEL as a STREAMING ingest monitor: the
    * per-source keep-rate dashboard a model-filtered drop-folder ingest
    * feeds. Every document is scored map-side with the shared
    * [[TextAnalysis.qualityZ]] chain (one definition — the stream and
    * the batch scorer cannot drift) and a complete-mode per-source
    * counter aggregate tracks docs seen / docs kept; the closing
    * keep-rate division happens on the drained sink. A drained
    * AvailableNow run equals the batch rollup exactly — the oracle
    * computes the same table directly over the documents parquet.
    *
    * Scale shape: state is one (n, kept) counter row per SOURCE
    * (model-scale) regardless of stream volume; flags are map work,
    * the aggregate combines partially per micro-batch; no watermark —
    * the counters are global and monotone (the q90 discipline).
    */
  def streamedQuality(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val agg = TextAnalysis.qualityZ(source(spark, dir), Seq("source"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("z") >= 0.0, 1L).otherwise(0L)).as("n_keep"))
    EventStream.drain(agg, "graft_q220_sink", OutputMode.Complete)
    spark.table("graft_q220_sink")
      .select(col("source"), col("n_docs"), col("n_keep"),
        round(col("n_keep").cast("double") / col("n_docs"), 6)
          .as("keep_rate"))
      .orderBy("source")
  }

  /** q243 — STREAMING integrity digests: q240's Merkle LEAF level
    * maintained incrementally over the document stream — the shape of
    * a replication pipeline that keeps per-bucket content digests
    * current as batches land, so an anti-entropy comparison (q240)
    * never rescans the table. The xor digest is ORDER-FREE and
    * self-inverse, which is exactly what makes it streaming-safe:
    * micro-batch boundaries cannot change any bucket's digest, and a
    * complete-mode aggregate keeps one (digest, count) row per bucket
    * — [[graft.operators.Curation.MerkleBuckets]] rows of state
    * regardless of stream volume. A drained AvailableNow run equals
    * the batch leaf table exactly (the oracle computes it directly
    * over the documents parquet).
    */
  def streamedDigests(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import graft.functions.TextFns
    val agg = source(spark, dir)
      .select(
        (col("doc_id") % graft.operators.Curation.MerkleBuckets)
          .cast("int").as("node"),
        TextFns.hash32(concat(lit("mk|"), col("doc_id").cast("string"),
          lit("|"), col("text"))).as("h"))
      .groupBy("node")
      .agg(expr("bit_xor(h)").as("digest"), count(lit(1)).as("n_rows"))
    EventStream.drain(agg, "graft_q243_sink", OutputMode.Complete)
    spark.table("graft_q243_sink").orderBy("node")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q90_stream_funnel" -> (streamedFunnel _),
    "q220_stream_quality" -> (streamedQuality _),
    "q243_stream_digests" -> (streamedDigests _))

  /** The drained stream equals batch q88, so the oracle IS q88's. */
  val oracle: Map[String, String] = Map(
    // the q240 leaf-digest table computed directly over the parquet —
    // drained ≡ batch because the xor fold is order-free
    "q243_stream_digests" -> {
      val h = graft.functions.TextFns.sql.hash32(
        "'mk|' || CAST(doc_id AS VARCHAR) || '|' || text")
      s"""WITH lh AS (SELECT
         |    CAST(doc_id % ${graft.operators.Curation.MerkleBuckets}
         |      AS INTEGER) AS node,
         |    $h AS h
         |  FROM documents)
         |SELECT node, bit_xor(h) AS digest, count(*) AS n_rows
         |FROM lh GROUP BY 1 ORDER BY 1""".stripMargin
    },
    "q90_stream_funnel" -> TextAnalysis.oracle("q88_filter_funnel"),
    // the q218 z chain rolled to per-source keep counters, computed
    // directly over the documents parquet — drained ≡ batch
    "q220_stream_quality" ->
      s"""WITH toks AS (SELECT source,
         |    ${graft.functions.TextFns.sql.toks} AS w, text FROM documents),
         |feat AS (
         |  SELECT source, CAST(len(w) AS BIGINT) AS nt,
         |    CAST(len(${graft.functions.TextFns.sql.keepIn("w",
             TextAnalysis.Stopwords)}) AS BIGINT) AS stop,
         |    CAST(length(regexp_replace(text, '\\s', '', 'g')) AS BIGINT)
         |      AS nonspace
         |  FROM toks),
         |zz AS (SELECT source,
         |    ${TextAnalysis.QmBias} + ${TextAnalysis.QmWLen} *
         |      ln(1.0 + CAST(nt AS DOUBLE))
         |      + ${TextAnalysis.QmWStop} * (CAST(stop AS DOUBLE) / nt)
         |      + ${TextAnalysis.QmWTok} * (CAST(nonspace AS DOUBLE) / nt) AS z
         |  FROM feat WHERE nt > 0)
         |SELECT source, count(*) AS n_docs,
         |  CAST(sum(CASE WHEN z >= 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
         |  round(CAST(sum(CASE WHEN z >= 0.0 THEN 1 ELSE 0 END) AS DOUBLE)
         |    / count(*), 6) AS keep_rate
         |FROM zz GROUP BY 1 ORDER BY 1""".stripMargin)
}
