package graft.sources

import org.apache.spark.sql.DataFrame

/** Bucketed-table layout for co-located joins: write both sides of a
  * recurring big-big join bucketed (and sorted) by the join key, and
  * every subsequent join on that key runs shuffle-free — the scan
  * itself provides the hash distribution and sort order, so the join
  * is a zero-exchange sort-merge.
  *
  * This is the storage-layout half of the 100 TB design: shuffles paid
  * once at write time, amortized over every downstream join/aggregate
  * on the key (the fact-table pattern for lineitem ⋈ orders).
  */
object Bucketing {

  /** Save `df` as a bucketed, per-bucket-sorted catalog table.
    * Drops any prior table AND its orphaned managed location first — a
    * fresh in-memory catalog over an old warehouse dir would otherwise
    * refuse the name (LOCATION_ALREADY_EXISTS).
    */
  def bucketize(df: DataFrame, key: String, buckets: Int, table: String): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val loc = new org.apache.hadoop.fs.Path(wh, table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)
  }
}
