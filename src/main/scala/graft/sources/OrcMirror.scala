package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** ORC mirror of the `documents` table — the third columnar format in
  * the source surface next to Parquet ([[Tables]]) and the row formats
  * (CSV [[SupplierCsv]], JSONL [[Jsonl]]). Spark bundles the ORC
  * reader/writer (orc-core ships in the distribution), so a warehouse
  * standardized on ORC plugs into the engine without a format
  * migration; the q202 gate proves the WRITE→READ roundtrip preserves
  * every value (strings, ints, nullable lang) by aggregating THROUGH
  * the mirror and hashing against the DuckDB oracle over the original
  * parquet.
  *
  * Zlib compression (the ORC default) and a `source`-sorted write: ORC
  * keeps min/max statistics per stripe, so the sort gives each stripe a
  * tight `source` range and a `source = 'x'` predicate skips whole
  * stripes — the ORC twin of the parquet row-group pruning the zone-map
  * queries (q101/q107) exercise.
  */
object OrcMirror {

  private val relCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  /** The `documents` table of corpus `dir` THROUGH the ORC mirror:
    * written once per corpus fingerprint ([[Materialize.once]] — atomic
    * rename, `_SUCCESS` gate, rebuilt on fixture regeneration), then
    * every caller reads the ORC directory. Deterministic build: one
    * writer task per source over a `doc_id`-sorted stream (sources
    * parallelize the write; within a file the row order is pinned), so
    * rename-race losers hold an identical layout.
    */
  def documentsFor(spark: SparkSession, dir: String): DataFrame = {
    val path = Materialize.once(dir, "documents-orc", s"$dir/documents.parquet")(
      tmp => Tables.documents(spark, dir)
        .repartition(org.apache.spark.sql.functions.col("source"))
        .sortWithinPartitions("source", "doc_id")
        .write.option("compression", "zlib").orc(tmp))
    relCache.computeIfAbsent((spark, path), _ => spark.read.orc(path))
  }
}
