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
}
