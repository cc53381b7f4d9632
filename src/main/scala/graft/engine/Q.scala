package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine query: the Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle query
  * over the same parquet tables. Queries with `oracle = None` get the
  * driver's weaker rows-only check (SparkEntry contract).
  *
  * Determinism contract (SURVEY.md §7.4.1-2): every query ends in an
  * ORDER BY over non-floating keys, and every floating-point output is
  * either (a) a raw column read from parquet, (b) a single chain of
  * scalar IEEE ops over identical inputs, or (c) derived from
  * exact-integer aggregates (quantized cents / 1e6 units) so Spark and
  * DuckDB produce bit-identical doubles regardless of aggregation order.
  *
  * Caching contract: query bodies persist branched pipelines
  * (MEMORY_AND_DISK) and do NOT unpersist — the driver mains clear the
  * cache between queries (`spark.catalog.clearCache()`). A long-lived
  * session composing these queries directly should do the same, or
  * cached blocks accumulate.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(name: String, oracle: String)(
      run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, Some(oracle))

  def noOracle(name: String)(run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, None)
}
