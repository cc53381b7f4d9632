package graft

import graft.engine.{Sinks, SkewOps, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale-technique specs: salting preserves join/agg semantics while
  * spreading hot keys; bucketed tables join without a shuffle. */
class SkewOpsSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session

  private def skewed() = {
    import spark.implicits._
    // one hot key (0) holding 90% of rows
    (Seq.fill(900)(0L) ++ (1L to 100L)).map(k => (k, s"v$k")).toDF("k", "payload")
  }

  test("saltedJoin equals the plain join and routes by (key, salt)") {
    import spark.implicits._
    val big = skewed()
    val small = (0L to 100L).map(k => (k, k * 10)).toDF("k", "dim")
    val plain = big.join(small, Seq("k")).groupBy("k").agg(count(lit(1)).as("n"))
    val salted = SkewOps.saltedJoin(big, small, "k", salt = 8)
      .groupBy("k").agg(count(lit(1)).as("n"))
    assert(salted.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      plain.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap)
    val plan = SkewOps.saltedJoin(big, small, "k", 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("__salt"), "join key carries the salt")
  }

  test("saltedCount equals plain count on the hot key") {
    val got = SkewOps.saltedCount(skewed(), "k", 8)
      .filter(col("k") === 0L).collect().head.getLong(1)
    assert(got == 900L)
  }

  test("co-bucketed tables join without a shuffle exchange") {
    val orders = Tables(spark, "/root/testdata/sf0.001", "orders")
      .select("o_orderkey", "o_totalprice")
    val li = Tables(spark, "/root/testdata/sf0.001", "lineitem")
      .select("l_orderkey", "l_quantity")
    Sinks.writeBucketed(orders, "b_orders", "o_orderkey", 8)
    Sinks.writeBucketed(li.withColumnRenamed("l_orderkey", "o_orderkey"),
      "b_lineitem", "o_orderkey", 8)
    val joined = spark.table("b_orders")
      .join(spark.table("b_lineitem"), Seq("o_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle:\n$plan")
    assert(joined.count() == li.count())
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
  }
}
