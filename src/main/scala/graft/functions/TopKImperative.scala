package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Bounded top-k buffer: at most k (score, id) pairs, ordered by
  * (score desc, id asc) — the engine's T3 tie rule. Kept simple
  * (sorted array, k is small) rather than a heap; replace the trim
  * with a binary heap if k grows. */
final class TopKBuffer(val k: Int) {
  var scores: Array[Double] = Array.empty
  var ids: Array[Long] = Array.empty

  def insert(score: Double, id: Long): Unit = {
    val n = scores.length
    if (n < k || score > scores(n - 1) ||
      (score == scores(n - 1) && id < ids(n - 1))) {
      // find insertion point (score desc, id asc)
      var i = 0
      while (i < n && (scores(i) > score ||
        (scores(i) == score && ids(i) < id))) i += 1
      val m = math.min(n + 1, k)
      val ns = new Array[Double](m); val ni = new Array[Long](m)
      System.arraycopy(scores, 0, ns, 0, i)
      System.arraycopy(ids, 0, ni, 0, i)
      if (i < m) { ns(i) = score; ni(i) = id }
      if (i + 1 < m) {
        System.arraycopy(scores, i, ns, i + 1, m - i - 1)
        System.arraycopy(ids, i, ni, i + 1, m - i - 1)
      }
      scores = ns; ids = ni
    }
  }
}

/** T3 top-k as a native `TypedImperativeAggregate` (SURVEY.md §4 item
  * 3): one pass, at most k entries per group in the buffer, partial
  * aggregation map-side — only k (score, id) pairs per key cross the
  * shuffle. Sibling of the typed-Aggregator form
  * ([[TopKByScore]]); this one lives in the expression layer (usable
  * from SQL / Column without Dataset encoders) and keeps primitive
  * buffers. Output: array<struct<score double, id long>> ranked by
  * (score desc, id asc). */
case class TopKScoreId(
    left: Expression, // score
    right: Expression, // id
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] with BinaryLike[Expression] {

  override def prettyName: String = "graft_topk"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType), StructField("id", LongType))))

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = left.eval(input)
    val i = right.eval(input)
    if (s != null && i != null)
      buf.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(a: TopKBuffer, b: TopKBuffer): TopKBuffer = {
    var i = 0
    while (i < b.scores.length) { a.insert(b.scores(i), b.ids(i)); i += 1 }
    a
  }

  override def eval(buf: TopKBuffer): Any =
    new GenericArrayData(buf.scores.indices.map(i =>
      InternalRow(buf.scores(i), buf.ids(i))).toArray[Any])

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.k); out.writeInt(buf.scores.length)
    var i = 0
    while (i < buf.scores.length) {
      out.writeDouble(buf.scores(i)); out.writeLong(buf.ids(i)); i += 1
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new TopKBuffer(in.readInt())
    val n = in.readInt()
    buf.scores = new Array[Double](n); buf.ids = new Array[Long](n)
    var i = 0
    while (i < n) { buf.scores(i) = in.readDouble(); buf.ids(i) = in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKScoreId =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKScoreId =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKScoreId =
    copy(left = newLeft, right = newRight)
}

object TopKScoreId {
  /** Column API: `graft_topk(score, id, k)` aggregate. */
  def graft_topk(score: Column, id: Column, k: Int): Column =
    Bridge.column(TopKScoreId(Bridge.expression(score),
      Bridge.expression(id), k).toAggregateExpression())
}
