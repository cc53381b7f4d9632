package graft

import graft.functions.{TopKBuffer, TopKScoreId}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** TopKBuffer edge cases + the graft_topk aggregate through the
  * expression layer. */
class TopKImperativeSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session

  private def drain(b: TopKBuffer): Seq[(Double, Long)] =
    b.scores.indices.map(i => (b.scores(i), b.ids(i)))

  test("buffer keeps k best with (score desc, id asc) ties") {
    val b = new TopKBuffer(3)
    Seq((1.0, 5L), (3.0, 2L), (3.0, 1L), (2.0, 9L), (0.5, 7L))
      .foreach { case (s, i) => b.insert(s, i) }
    assert(drain(b) == Seq((3.0, 1L), (3.0, 2L), (2.0, 9L)))
  }

  test("rejects worse-than-last when full; accepts equal score smaller id") {
    val b = new TopKBuffer(2)
    b.insert(5.0, 10L); b.insert(4.0, 20L)
    b.insert(3.0, 1L) // worse, rejected
    assert(drain(b) == Seq((5.0, 10L), (4.0, 20L)))
    b.insert(4.0, 5L) // tie with last, smaller id wins
    assert(drain(b) == Seq((5.0, 10L), (4.0, 5L)))
  }

  test("merge equals bulk insert") {
    val a = new TopKBuffer(4); val b = new TopKBuffer(4); val ref = new TopKBuffer(4)
    val xs = Seq((1.0, 1L), (9.0, 2L), (3.0, 3L))
    val ys = Seq((8.0, 4L), (2.0, 5L), (9.0, 6L))
    xs.foreach { case (s, i) => a.insert(s, i); ref.insert(s, i) }
    ys.foreach { case (s, i) => b.insert(s, i); ref.insert(s, i) }
    var i = 0
    while (i < b.scores.length) { a.insert(b.scores(i), b.ids(i)); i += 1 }
    assert(drain(a) == drain(ref))
  }

  test("aggregate ignores null scores/ids and handles k > group size") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(5.0), Some(10L)), (1L, None, Some(11L)),
      (1L, Some(7.0), None), (2L, Some(1.0), Some(20L)))
      .toDF("g", "score", "id")
    val got = df.groupBy("g")
      .agg(TopKScoreId.graft_topk(col("score"), col("id"), 5).as("top"))
      .orderBy("g").collect()
    assert(got(0).getSeq[Any](1).length == 1) // only the fully-non-null row
    assert(got(1).getSeq[Any](1).length == 1)
  }
}
