package graft.queries

import graft.ann.EmbeddingOps
import graft.engine.{Q, Tables}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor suite over `embeddings`
  * (FIXTURES.md §B: `vec_id, embedding list<float>, label`). */
object AnnQueries {

  /** Brute-force exact cosine top-10 for queries vec_id < 50 — the ANN
    * correctness baseline. */
  val q25 = Q("q25_ann_bruteforce",
    s"""WITH qv AS (${EmbeddingOps.quantizedSql}),
      |cand AS (
      |SELECT a.vec_id AS i, b.vec_id AS j FROM
      |(SELECT DISTINCT vec_id FROM qv WHERE vec_id < 50) a,
      |(SELECT DISTINCT vec_id FROM qv) b WHERE b.vec_id <> a.vec_id),
      |${EmbeddingOps.rankPairsSql(10)}""".stripMargin) { (s, dir) =>
    val qv = EmbeddingOps.quantized(Tables(s, dir, "embeddings"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ids = qv.select("vec_id").distinct()
    val cand = ids.filter(col("vec_id") < 50).select(col("vec_id").as("i"))
      .crossJoin(ids.select(col("vec_id").as("j")))
      .filter(col("j") =!= col("i"))
    EmbeddingOps.rankPairs(qv, cand, 10).orderBy("i", "rn")
  }

  /** Sign-LSH bucketed ANN: 16 md5-derived integer hyperplanes in 4
    * hash tables of 4 (OR-amplified); candidates share any table's
    * bucket with the query; exact re-rank of candidates only, top-5.
    * The scale path — at 100 TB the bucket joins replace the all-pairs
    * product; recall < 1 by design. */
  val q26 = Q("q26_ann_lsh",
    s"""WITH qv AS (${EmbeddingOps.quantizedSql}),
      |buckets AS (${EmbeddingOps.bucketsSql("qv")}),
      |cand AS (
      |SELECT DISTINCT a.vec_id AS i, b.vec_id AS j FROM buckets a
      |JOIN buckets b ON a.tbl = b.tbl AND a.bucket = b.bucket AND b.vec_id <> a.vec_id
      |WHERE a.vec_id < 50),
      |${EmbeddingOps.rankPairsSql(5)}""".stripMargin) { (s, dir) =>
    val qv = EmbeddingOps.quantized(Tables(s, dir, "embeddings"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val buckets = EmbeddingOps.buckets(s, qv)
    val a = buckets.filter(col("vec_id") < 50)
      .select(col("vec_id").as("i"), col("tbl"), col("bucket"))
    val b = buckets.select(col("vec_id").as("j"), col("tbl"), col("bucket"))
    val cand = a.join(b, Seq("tbl", "bucket")).filter(col("j") =!= col("i"))
      .select("i", "j").distinct()
    EmbeddingOps.rankPairs(qv, cand, 5).orderBy("i", "rn")
  }

  def all: Seq[Q] = Seq(q25, q26)
}
