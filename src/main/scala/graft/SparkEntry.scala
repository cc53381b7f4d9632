package graft

import graft.engine.Q
import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is registered as a
  * [[graft.engine.Q]] in one of the suite objects under
  * `graft.queries`; this object just flattens the registry into the
  * driver's `queries` / `oracleSql` maps.
  */
object SparkEntry {

  private def registry: Seq[Q] =
    RelationalQueries.all ++ TextQueries.all ++ DedupQueries.all ++
      AnnQueries.all ++ AnalysisQueries.all ++ EventQueries.all ++
      MultimodalQueries.all ++ CoverageQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.q10.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap
}
