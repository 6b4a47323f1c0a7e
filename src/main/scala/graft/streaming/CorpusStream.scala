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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q90_stream_funnel" -> (streamedFunnel _))

  /** The drained stream equals batch q88, so the oracle IS q88's. */
  val oracle: Map[String, String] = Map(
    "q90_stream_funnel" -> TextAnalysis.oracle("q88_filter_funnel"))
}
