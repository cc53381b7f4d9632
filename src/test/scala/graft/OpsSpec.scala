package graft

import graft.ann.EmbeddingOps
import graft.dedup.DedupOps
import graft.engine.SimilarityOps
import graft.multimodal.BinaryOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Operator-level specs on tiny crafted corpora (the oracle gate
  * covers full-table exactness; these pin the semantics). */
class OpsSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("shingles: word 3-grams, distinct, none for short docs") {
    // NB tokens are 2+ chars (sklearn \w\w+ pattern) — 1-char words drop
    val sh = DedupOps.shingles(docs(
      1L -> "aa bb cc dd", 2L -> "xx yy", 3L -> "pp pp pp pp pp"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(sh == Set((1L, "aa bb cc"), (1L, "bb cc dd"), (3L, "pp pp pp")))
  }

  test("identical docs share identical minhash signatures") {
    val sh = DedupOps.shingles(docs(
      1L -> "the quick brown fox jumps over", 2L -> "the quick brown fox jumps over"))
    val sigs = DedupOps.minhashSignatures(sh).collect()
      .groupBy(_.getLong(0)).view.mapValues(
        _.map(r => (r.getLong(1), r.getString(2))).toSet).toMap
    assert(sigs(1L) == sigs(2L))
    assert(sigs(1L).size == DedupOps.NumHashes)
  }

  test("jaccard is exact on crafted overlap") {
    val sh = DedupOps.shingles(docs(
      1L -> "aa bb cc dd ee", // shingles: aa-bb-cc bb-cc-dd cc-dd-ee
      2L -> "bb cc dd ee ff")) // shingles: bb-cc-dd cc-dd-ee dd-ee-ff
    import spark.implicits._
    val pairs = Seq((1L, 2L)).toDF("i", "j")
    val j = DedupOps.jaccard(pairs, sh).collect().head
    assert(j.getLong(2) == 2L) // inter
    assert(j.getDouble(5) == 2.0 / 4.0)
  }

  test("cosine: identical docs rank each other first with cos 1.0") {
    val tf = SimilarityOps.termFreq(docs(
      1L -> "alpha beta beta gamma", 2L -> "alpha beta beta gamma",
      3L -> "delta epsilon zeta"), dropStopwords = false)
    val top = SimilarityOps.cosineTopK(tf, col("doc_id") < 10, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(top.contains((1L, 2L, 1.0)))
    assert(top.contains((2L, 1L, 1.0)))
    // disjoint vocab -> no pair with doc 3
    assert(!top.exists(t => t._1 == 3L || t._2 == 3L))
  }

  test("embedding quantization + rankPairs finds the planted neighbor") {
    import spark.implicits._
    val emb = Seq(
      (0L, Array.tabulate(64)(i => math.sin(i + 1).toFloat)),
      (1L, Array.tabulate(64)(i => (math.sin(i + 1) * 1.001f).toFloat)), // near-dup of 0
      (2L, Array.tabulate(64)(i => math.cos(3 * i + 2).toFloat)))
      .toDF("vec_id", "embedding")
    val qv = EmbeddingOps.quantized(emb)
    val cand = Seq((0L, 1L), (0L, 2L)).toDF("i", "j")
    val ranked = EmbeddingOps.rankPairs(qv, cand, 2).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(ranked.head._1 == 1L && ranked.head._2 == 1L)
    assert(ranked.find(_._1 == 1L).get._3 > 0.999)
  }

  test("planeWeight is deterministic and in [-8, 7]") {
    val ws = for (p <- 0 until 16; d <- 0 until 64)
      yield EmbeddingOps.planeWeight(p, d)
    assert(ws.forall(w => w >= -8 && w <= 7))
    assert(EmbeddingOps.planeWeight(3, 7) == EmbeddingOps.planeWeight(3, 7))
  }

  test("dot_q native expression matches the HOF fold exactly") {
    import spark.implicits._
    val df = Seq(
      (Array(1L, 2L, 3L), Array(4L, 5L, 6L)),          // 4+10+18 = 32
      (Array(-7L, 0L, 9L), Array(3L, 100L, -2L)),      // -21+0-18 = -39
      (Array.empty[Long], Array.empty[Long]))          // empty fold = 0
      .toDF("a", "b")
    val hof = aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
      lit(0L), (acc, v) => acc + v)
    val rows = df.select(
      graft.functions.VecExprs.dot_q(col("a"), col("b")).as("native"),
      hof.as("hof")).collect()
    rows.foreach(r => assert(r.get(0) == r.get(1)))
    // length mismatch: zip_with pads with null -> null, like the HOF
    val mism = Seq((Array(1L, 2L), Array(3L))).toDF("a", "b")
    val m = mism.select(
      graft.functions.VecExprs.dot_q(col("a"), col("b")).as("native"),
      hof.as("hof")).collect().head
    assert(m.isNullAt(0) && m.isNullAt(1))
  }

  test("quantize_vec matches transform(round(cast)) elementwise") {
    import spark.implicits._
    val vals = Seq(
      Array(0.1f, -0.37f, 1.0f, -1.0f, 0.0000025f, -0.0000025f, 0.9999995f),
      Array.tabulate(64)(i => math.sin(i * 0.7 - 3).toFloat),
      Array.empty[Float]).toDF("embedding")
    val old = transform(col("embedding"),
      x => round(x.cast("double") * EmbeddingOps.QuantScale).cast("long"))
    val rows = vals.select(
      graft.functions.VecExprs.quantize_vec(
        col("embedding"), EmbeddingOps.QuantScale).as("native"),
      old.as("hof")).collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1))
    }
    // non-finite values fail loudly in BOTH forms: under ANSI mode
    // (the Spark 4 default these sessions run) the old chain's long
    // cast throws CAST_OVERFLOW; the native expression throws too
    val nan = Seq(Array(Float.NaN)).toDF("embedding")
    intercept[Exception] {
      nan.select(old.as("hof")).collect()
    }
    intercept[Exception] {
      nan.select(graft.functions.VecExprs.quantize_vec(
        col("embedding"), EmbeddingOps.QuantScale).as("native")).collect()
    }
  }

  test("bucket_strs matches the long-form buckets pipeline (ppt 4 and 8)") {
    import spark.implicits._
    val emb = Seq.tabulate(40)(v =>
      (v.toLong, Array.tabulate(64)(i => math.sin(v * 17 + i * 0.9).toFloat)))
      .toDF("vec_id", "embedding")
    val vecs = EmbeddingOps.quantizedVec(emb)
    for (ppt <- Seq(4, 8)) {
      val native = EmbeddingOps.bucketsVec(vecs, ppt).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      val longForm = EmbeddingOps.buckets(spark,
        vecs.select(col("vec_id"), posexplode(col("qv")).as(Seq("d", "q")))
          .select(col("vec_id"), col("d").cast("long").as("d"), col("q")),
        ppt).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      assert(native == longForm, s"ppt=$ppt")
      assert(native.size == 40 * 4)
    }
  }

  test("dot_q runs inside a WholeStageCodegen span") {
    import spark.implicits._
    // the r21 HOF fold was CodegenFallback — the sims projection ran
    // interpreted; the native expression must keep the stage codegen'd
    val vecs = EmbeddingOps.quantizedVec(
      Seq.tabulate(20)(v =>
        (v.toLong, Array.tabulate(64)(i => math.sin(v + i * 0.3).toFloat)))
        .toDF("vec_id", "embedding"))
    val pairs = Seq((1L, 2L), (3L, 4L)).toDF("i", "j")
    val df = EmbeddingOps.simsVec(vecs, pairs)
    df.collect() // drive THIS Dataset's QueryExecution so AQE finalizes
    // the AQE final plan marks whole-stage-codegen'd operators "*(n)";
    // the projection computing graft_dot_q must carry the marker
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("isFinalPlan=true"), s"plan not finalized:\n$plan")
    val projLines = plan.linesIterator
      .filter(l => l.contains("Project") && l.contains("graft_dot_q")).toSeq
    assert(projLines.nonEmpty, s"no dot_q projection in plan:\n$plan")
    assert(projLines.exists(_.contains("*(")),
      s"dot_q projection not codegen'd:\n${projLines.mkString("\n")}")
  }

  test("shingle_sk matches conv(substr(md5, 1, 15), 16, 10)") {
    import spark.implicits._
    val df = Seq("aa bb cc", "the quick brown", "x" * 200, "", "ünïcode ok")
      .toDF("shingle")
    val rows = df.select(
      graft.functions.MinHashExprs.shingle_sk(col("shingle")).as("native"),
      conv(substring(md5(col("shingle").cast("binary")), 1, 15), 16, 10)
        .cast("long").as("sql")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    assert(rows.forall(_.getLong(0) >= 0L))
  }

  test("decodeStub is deterministic; decodeAll keeps every row") {
    val media = docs(1L -> "hello", 2L -> "a longer payload here", 3L -> "")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    val out = BinaryOps.decodeAll(spark, media, partitions = 2)
      .collect().map(m => m.doc_id -> m).toMap
    assert(out.size == 3)
    assert(out(1L).byte_len == 5L)
    assert(out(3L).format == "empty")
    assert(out(1L).checksum ==
      BinaryOps.decodeStub(1L, "hello".getBytes("UTF-8")).checksum)
  }
}
