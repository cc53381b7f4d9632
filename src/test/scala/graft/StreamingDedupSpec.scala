package graft

import graft.dedup.DedupOps
import graft.streaming.StreamingDedup
import graft.streaming.StreamingDedup.Doc
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

class StreamingDedupSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session

  private val a = "the quick brown fox jumps over the lazy dog tonight"
  private val aNear = "quick brown fox jumps over the lazy dog tonight" // first token dropped
  private val other = "completely unrelated words about spark shuffle partitions here"

  test("row-local band signatures match the batch DataFrame pipeline") {
    import spark.implicits._
    val docs = Seq((1L, a), (2L, aNear)).toDF("doc_id", "text")
    val batchSigs = DedupOps.minhashSignatures(DedupOps.shingles(docs))
      .collect().groupBy(_.getLong(0)).view
      .mapValues(_.sortBy(_.getLong(1)).map(_.getString(2)).toSeq).toMap
    val rowsPerBand = DedupOps.NumHashes / DedupOps.Bands
    for ((id, text) <- Seq(1L -> a, 2L -> aNear)) {
      val local = StreamingDedup.bandSignatures(text).toMap
      // batch band sig = md5 of concatenated minhashes, recompute here
      val md = java.security.MessageDigest.getInstance("MD5")
      (0 until DedupOps.Bands).foreach { b =>
        val concat = batchSigs(id).slice(b * rowsPerBand, (b + 1) * rowsPerBand).mkString
        val expect = md.digest(concat.getBytes("UTF-8")).map("%02x".format(_)).mkString
        assert(local(b.toLong) == expect, s"doc $id band $b")
      }
    }
  }

  test("stream emits a candidate pair when a near-dup arrives, exactly once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Doc]
    val q = StreamingDedup.candidates(src.toDS())
      .writeStream.format("memory").queryName("neardup_cand")
      .outputMode("append").start()
    src.addData(Doc(1, a), Doc(3, other))
    q.processAllAvailable()
    assert(spark.table("neardup_cand").count() == 0) // nothing collides yet
    src.addData(Doc(2, aNear))
    q.processAllAvailable()
    val pairs = spark.table("neardup_cand")
      .select("i", "j").distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
    // replaying the same doc adds no new pairs (bucket state remembers it)
    src.addData(Doc(2, aNear))
    q.processAllAvailable()
    val after = spark.table("neardup_cand")
      .select("i", "j").distinct().count()
    q.stop()
    assert(after == 1)
  }

  test("streaming candidates agree with the batch LSH candidates") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq(Doc(1, a), Doc(2, aNear), Doc(3, other),
      Doc(4, other + " extended with more unrelated tokens"))
    val batch = DedupOps.lshCandidates(DedupOps.minhashSignatures(
      DedupOps.shingles(corpus.map(d => (d.doc_id, d.text)).toDF("doc_id", "text"))))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val src = MemoryStream[Doc]
    val q = StreamingDedup.candidates(src.toDS())
      .writeStream.format("memory").queryName("neardup_all")
      .outputMode("append").start()
    corpus.foreach { d => src.addData(d); q.processAllAvailable() }
    val streamed = spark.table("neardup_all")
      .select("i", "j").distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    q.stop()
    assert(streamed == batch)
  }
}
