package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation + co-located-join utilities (the 100 TB toolkit:
  * broadcast / bucketing / salting / AQE — broadcast is used inline by
  * the queries, AQE is session config, these are the other two).
  */
object SkewOps {

  /** Salted equi-join for a skewed build side: every big-side row gets
    * a salt in [0, salt); the small side is replicated once per salt
    * value; the join key becomes (key, salt), so one hot key's rows
    * spread over `salt` reducers instead of one. Row-level salt
    * assignment is arbitrary (it only routes rows) — the join result
    * is identical to the unsalted join.
    *
    * Use when one key holds a large fraction of the big side and the
    * small side is too big to broadcast; AQE's skew-join handles sort
    * -merge skew automatically, but salting is the explicit form that
    * also works for hash aggregation (salt, partial-agg, de-salt). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salt: Int): DataFrame = {
    val bigS = big.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salt.toLong)))
    val smallS = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(salt.toLong - 1))))
    bigS.join(smallS, Seq(key, "__salt")).drop("__salt")
  }

  /** Salted two-phase aggregation: count per key via (key, salt)
    * partial aggregation then a final combine — the hash-agg analogue
    * of [[saltedJoin]] for hot grouping keys. Exact for the
    * demonstrated count/sum shapes. */
  def saltedCount(df: DataFrame, key: String, salt: Int): DataFrame =
    df.withColumn("__salt", pmod(monotonically_increasing_id(), lit(salt.toLong)))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("partial_cnt"))
      .groupBy(col(key))
      .agg(sum(col("partial_cnt")).as("cnt"))
}
