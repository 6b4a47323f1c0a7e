package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Analytics, Curation, Dashboard, Dedup, Events, Html, Integrity, Multimodal, Similarity, SupplierPerf, TextAnalysis}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the per-module query/oracle maps. Every `queries` key has a
  * DuckDB-runnable `oracleSql` twin over the same parquet tables unless
  * the operator is not SQL-expressible (then the driver records a weaker
  * rows-only check).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    SupplierPerf.kpis(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 (+ §7.6
    * extensions: text analysis, dedup, similarity, events, multimodal).
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Integrity.queries ++ SupplierPerf.queries ++ Dashboard.queries ++
      TextAnalysis.queries ++ Dedup.queries ++ Similarity.queries ++
      Events.queries ++ Multimodal.queries ++ Analytics.queries ++
      Curation.queries ++ Html.queries ++
      graft.streaming.EventStream.queries ++
      graft.streaming.CorpusStream.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    Integrity.oracle ++ SupplierPerf.oracle ++ Dashboard.oracle ++
      TextAnalysis.oracle ++ Dedup.oracle ++ Similarity.oracle ++
      Events.oracle ++ Multimodal.oracle ++ Analytics.oracle ++
      Curation.oracle ++ Html.oracle ++
      graft.streaming.EventStream.oracle ++
      graft.streaming.CorpusStream.oracle
}
