package graft

import graft.engine.SimilarityOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Incremental index maintenance: merging a new-document batch into an
  * existing top-k table must equal a full rebuild, bit-for-bit. */
class MergeTopKSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session

  test("mergeTopK equals full rebuild on the real documents table") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val oldDocs = docs.filter(col("doc_id") < 400)
    val newDocs = docs.filter(col("doc_id") >= 400)
    val tfOld = SimilarityOps.termFreq(oldDocs, dropStopwords = true)
      .persist()
    val tfNew = SimilarityOps.termFreq(newDocs, dropStopwords = true)
      .persist()
    val tfAll = SimilarityOps.termFreq(docs, dropStopwords = true)
      .persist()
    val k = 10
    val existing = SimilarityOps.rankTopK(
      SimilarityOps.cosinePairs(tfOld, tfOld), k)
    val merged = SimilarityOps.mergeTopK(existing, tfOld, tfNew, k)
      .collect().map(_.toSeq).toSet
    val rebuilt = SimilarityOps.rankTopK(
      SimilarityOps.cosinePairs(tfAll, tfAll), k)
      .collect().map(_.toSeq).toSet
    assert(merged == rebuilt)
    assert(merged.nonEmpty)
    tfOld.unpersist(); tfNew.unpersist(); tfAll.unpersist()
  }

  test("merging an empty batch is a no-op") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").filter(col("doc_id") < 50)
    val tf = SimilarityOps.termFreq(docs, dropStopwords = true).persist()
    val tfEmpty = tf.filter(col("doc_id") < 0)
    val existing = SimilarityOps.rankTopK(SimilarityOps.cosinePairs(tf, tf), 5)
    val merged = SimilarityOps.mergeTopK(existing, tf, tfEmpty, 5)
      .collect().map(_.toSeq).toSet
    assert(merged == existing.collect().map(_.toSeq).toSet)
    tf.unpersist()
  }
}
