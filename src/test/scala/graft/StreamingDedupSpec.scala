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
    // stateTtlMs = 0 (NoTimeout): processAllAvailable never terminates
    // once a processing-time timeout keeps requesting no-data batches
    val q = StreamingDedup.candidates(src.toDS(), stateTtlMs = 0)
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

  test("bucket state expires after the processing-time TTL") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // With a processing-time timeout the engine keeps scheduling
    // no-data batches, so neither processAllAvailable nor AvailableNow
    // ever drains (see the operator scaladoc). Assert by POLLING the
    // committed state through the statestore data source instead: the
    // bucket id-sets must appear, then SHRINK to zero once the TTL
    // passes — with no new input — then repopulate for late arrivals.
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ttl_ckpt").toString
    val src = MemoryStream[Doc]
    // 5 s TTL: long enough that the statestore-read poll jobs (~0.5 s
    // each) between two within-TTL arrivals cannot expire the bucket,
    // short enough that the expiry phase stays well inside the await
    val q = StreamingDedup.candidates(src.toDS(), stateTtlMs = 5000)
      .writeStream.format("memory").queryName("neardup_ttl")
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    def stateKeys(): Long =
      try spark.read.format("statestore").load(ckpt).count()
      catch { case _: Throwable => -1L } // no snapshot committed yet
    def awaitTrue(what: String)(cond: => Boolean): Unit = {
      val deadline = System.currentTimeMillis() + 60000
      while (!cond && System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(cond, s"timed out waiting for: $what")
    }
    try {
      src.addData(Doc(1, a))
      awaitTrue("doc 1's four band buckets in state")(stateKeys() == 4)
      // TTL fires on the engine's own no-data batches — no new input;
      // ~5 s of wall clock passes inside this await
      awaitTrue("state shrinks to zero after the TTL")(stateKeys() == 0)
      src.addData(Doc(2, aNear))
      awaitTrue("doc 2's fresh buckets in state")(stateKeys() == 4)
      assert(spark.table("neardup_ttl").count() == 0,
        "no candidate pair: doc 1 was forgotten before doc 2 arrived")
      // liveness: docs 1 and 2 arrive in ONE batch, so the pair
      // emission cannot race the TTL — even if doc 2's buckets expired
      // during the asserts above (GC pause, loaded CI), the two docs
      // collide within the batch itself and the pair is emitted
      src.addData(Doc(1, a), Doc(2, aNear))
      awaitTrue("live buckets emit the candidate pair")(
        spark.table("neardup_ttl").filter("i = 1 AND j = 2").count() > 0)
    } finally q.stop()
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
    val q = StreamingDedup.candidates(src.toDS(), stateTtlMs = 0)
      .writeStream.format("memory").queryName("neardup_all")
      .outputMode("append").start()
    corpus.foreach { d => src.addData(d); q.processAllAvailable() }
    val streamed = spark.table("neardup_all")
      .select("i", "j").distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    q.stop()
    assert(streamed == batch)
  }
}
