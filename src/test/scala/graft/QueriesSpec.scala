package graft

import org.scalatest.funsuite.AnyFunSuite

/** Integration: every registered query runs at sf0.001 and holds its
  * structural invariants. Exact-value correctness is the DuckDB oracle
  * gate (tools/check.py); these are the cheap always-on checks. */
class QueriesSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  private val sf = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs at sf0.001") {
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty)
      assert(df.count() >= 0)
    }
  }

  test("q18 cosine invariants: rn<=10, i!=j, cos in (0,1]") {
    val rows = SparkEntry.queries("q18_cosine_topk")(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (i, j, rn, cos) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(i != j)
      assert(rn >= 1 && rn <= 10)
      assert(cos > 0.0 && cos <= 1.0 + 1e-9)
    }
  }

  test("q01 top-parts is sorted desc with deterministic ties") {
    val rows = SparkEntry.queries("q01_top_parts")(spark, sf).collect()
    val prices = rows.map(_.getDouble(3)).toSeq
    assert(prices == prices.sortBy(-(_: Double)))
    assert(rows.length == 10)
  }
}
