package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** JSONL (one JSON object per line) source/sink — the interchange
  * format document pipelines exchange corpora in. Spark's json format
  * is line-delimited by default, so both directions are native
  * DataFrame I/O: the writer streams per partition (no driver
  * collection), the reader takes an explicit schema — never inference,
  * which at 100 TB means a full extra pass over the data and
  * type-drift surprises (int64 silently widening to double, dates
  * staying strings).
  *
  * Round-trip caveats handled here:
  *  - `mode=FAILFAST` so corrupt lines fail loudly instead of becoming
  *    silent nulls;
  *  - JSON writers drop null-valued fields by default
  *    (`ignoreNullFields=false` keeps them, so schema round-trips);
  *  - partition count is preserved (one .jsonl part per task — the
  *    natural sharding for downstream corpus consumers).
  */
object Jsonl {

  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("ignoreNullFields", "false")
      .json(path)

  def read(spark: SparkSession, schema: StructType, path: String): DataFrame =
    spark.read.schema(schema).option("mode", "FAILFAST").json(path)

  /** documents-table convenience: read a JSONL corpus with the engine's
    * documents schema (same shape `Tables.documents` yields).
    */
  def readDocuments(spark: SparkSession, path: String): DataFrame =
    read(spark, new StructType()
      .add("doc_id", "long").add("text", "string").add("lang", "string")
      .add("source", "string").add("n_chars", "long"), path)
}
