package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loader for the driver's TPC-H-ish test tables
  * (TESTDATA.md). Filters/projections applied downstream are pushed
  * into the parquet scan by Catalyst (column pruning + predicate
  * pushdown), so callers should select/filter as early as possible
  * and never cache the raw table.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Scale-adaptive CPU spread for expression-heavy map stages
    * (tokenize/explode, digest, kernel math): round-robin repartition
    * to the default parallelism ONLY when the scan has fewer
    * partitions. The test tables are single-row-group parquet files —
    * parquet cannot split inside a row group, so every scan here is
    * one task and the per-row work serializes on one core no matter
    * the cluster size; a production many-split input already has scan
    * parallelism and skips the extra exchange entirely (the gate reads
    * the planned scan partitioning, not a constant). */
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
