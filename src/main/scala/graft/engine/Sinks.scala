package graft.engine

import org.apache.spark.sql.DataFrame

/** Batch write sinks for the ETL surface. The reference only writes
  * HTML (`pipeline.HtmlSink`); a 100 TB engine needs real columnar
  * sinks with layout control.
  */
object Sinks {

  /** Partitioned parquet write — the standard large-table layout:
    * `partitionBy` gives partition-pruned reads on the partition
    * columns, `maxRecordsPerFile` bounds file sizes, and writers
    * shuffle-free append within each task's partition. */
  def writeParquet(df: DataFrame, path: String,
      partitionBy: Seq[String] = Nil,
      maxRecordsPerFile: Long = 0L): Unit = {
    val w0 = df.write.mode("overwrite")
    val w1 = if (partitionBy.nonEmpty) w0.partitionBy(partitionBy: _*) else w0
    val w2 = if (maxRecordsPerFile > 0)
      w1.option("maxRecordsPerFile", maxRecordsPerFile) else w1
    w2.parquet(path)
  }

  /** CSV sink with header (round-trips `ProductPipeline.loadCsv`). */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  /** Bucketed managed table: rows are hash-bucketed by `key` at write
    * time, so joins/aggregations between tables sharing (key, buckets)
    * read co-located data and plan with NO shuffle exchange — the
    * pre-partitioning that amortizes one shuffle across every later
    * join at 100 TB. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)
}
