package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Term-frequency vectorization + sparse cosine similarity + per-key
  * top-k — the reference's offline index build
  * (`/root/reference/amazon1.py:116-179`): CountVectorizer
  * (`amazon1.py:133`), `cosine_similarity` as sparse `X·Xᵀ`
  * (`amazon1.py:138`), and `build_top_neighbors_matrix`
  * (`amazon1.py:143-159`).
  *
  * Spark-first design (SURVEY.md §2.4 J1, §2.6 T3): the reference's
  * scipy matrix product becomes an inverted-index equi-self-join on
  * `term` over long-form `(doc, term, tf)` rows — the classic sparse
  * cosine join. Zero-similarity pairs are never materialized, partial
  * aggregation combines map-side, and stopword/document-frequency
  * pruning bounds the join fan-out (the reference's vocab cap plays the
  * same role, `amazon1.py:133`). At the 100 TB design point the exact
  * join is reserved for bounded query sets; unbounded all-pairs
  * near-dup goes through the MinHash-LSH operators in `graft.dedup`.
  *
  * Determinism: tf counts are exact longs, so dot products and squared
  * norms are exact integers; `cos = dot / (sqrt(n2_i) * sqrt(n2_j))`
  * is a fixed chain of correctly-rounded IEEE ops over exact inputs →
  * bit-identical across engines, safe to rank on. Ties break by
  * ascending neighbor id, reproducing Python's stable sort
  * (`amazon1.py:148`, SURVEY.md §2.6 T3). Self-pairs are excluded with
  * an explicit `i != j` — fixing the reference's drop-rank-1 bug
  * (`amazon1.py:149`, SURVEY.md §7.4.6).
  */
object SimilarityOps {

  /** M1+M2+M3 long form — tokenize, optionally drop stopwords, count:
    * `(doc_id, tok, tf)`. */
  def termFreq(docs: DataFrame, dropStopwords: Boolean): DataFrame = {
    val toks = docs.select(col("doc_id"),
      explode(TextOps.tokens(col("text"))).as("tok"))
    val filtered =
      if (dropStopwords) toks.filter(!col("tok").isin(TextOps.StopWords: _*))
      else toks
    filtered.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
  }

  def termFreqSql(dropStopwords: Boolean): String = {
    val stop = if (dropStopwords) s"WHERE tok NOT IN ${TextOps.StopWordsSql}" else ""
    s"""SELECT doc_id, tok, count(*) AS tf FROM (
       |SELECT doc_id, unnest(${TextOps.tokensSql("text")}) AS tok FROM documents) $stop
       |GROUP BY doc_id, tok""".stripMargin
  }

  /** Squared L2 norms of the TF vectors (exact integers). */
  def docNorms(tf: DataFrame): DataFrame =
    tf.groupBy("doc_id").agg(sum(col("tf") * col("tf")).as("n2"))

  /** J1 + T3 — top-k cosine neighbors for every doc matching
    * `queryPred`: inverted-index join on term, exact integer dot,
    * ranking window with deterministic tie-break.
    * Returns `(i, j, rn, cos)`. */
  def cosineTopK(tf: DataFrame, queryPred: Column, k: Int): DataFrame =
    cosineTopKFrom(tf.filter(queryPred), tf, k)

  /** As [[cosineTopK]] but with an explicit query-side TF relation
    * (e.g. a semi-joined single document for the online recommend
    * path, where the tiny query side broadcasts). */
  def cosineTopKFrom(tfQueries: DataFrame, tf: DataFrame, k: Int): DataFrame =
    rankTopK(cosinePairs(tfQueries, tf), k)
      .select(col("i"), col("j"), col("rn"), round(col("cos"), 6).as("cos"))

  /** Exact cosine for every (query, corpus) doc pair sharing a term:
    * unrounded `(i, j, cos)`. Norms are per-doc self-norms, so the
    * i-side norms come from the query relation and the j-side from
    * the corpus relation — the two need not overlap (incremental
    * merge joins old docs against a new-docs corpus side). */
  def cosinePairs(tfQueries: DataFrame, tf: DataFrame): DataFrame = {
    val a = tfQueries
      .select(col("doc_id").as("i"), col("tok"), col("tf").as("tf_a"))
    val b = tf.select(col("doc_id").as("j"), col("tok"), col("tf").as("tf_b"))
    // broadcast the bounded query side: `tok` has few distinct values
    // (vocab-capped), so a shuffled join on it is hopelessly skewed —
    // a broadcast hash join streams the full corpus side in parallel
    // with no shuffle, and the (i, j) partial aggregation combines
    // map-side before the one real shuffle
    val dots = broadcast(a).join(b, Seq("tok"))
      .filter(col("i") =!= col("j"))
      .groupBy("i", "j").agg(sum(col("tf_a") * col("tf_b")).as("dot"))
    dots
      .join(docNorms(tfQueries).select(col("doc_id").as("i"), col("n2").as("n2i")), Seq("i"))
      .join(docNorms(tf).select(col("doc_id").as("j"), col("n2").as("n2j")), Seq("j"))
      .select(col("i"), col("j"), (col("dot").cast("double") /
        (sqrt(col("n2i").cast("double")) * sqrt(col("n2j").cast("double")))).as("cos"))
  }

  /** Rank `(i, j, cos)` pairs per i: (cos desc, j asc), keep k.
    * Returns unrounded `(i, j, rn, cos)`. */
  def rankTopK(sims: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("i")).orderBy(desc("cos"), asc("j"))
    sims.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .select("i", "j", "rn", "cos")
  }

  /** Incremental index maintenance: fold a batch of new documents into
    * an existing top-k neighbor table without a full rebuild. Sound
    * because merging only ADDS candidates: an old pair absent from the
    * old top-k is dominated by k still-present better pairs and can
    * never enter the new top-k. Cost is |new docs| × inverted-index
    * postings — at 100 TB this is the difference between an ingest
    * batch and recomputing the corpus.
    *
    * `existing` must be the UNROUNDED table from [[rankTopK]] (ranking
    * merged rounded and unrounded scores would be order-unstable).
    * Returns the same shape, re-ranked. */
  def mergeTopK(existing: DataFrame, tfOld: DataFrame, tfNew: DataFrame,
      k: Int): DataFrame = {
    val tfAll = tfOld.unionByName(tfNew)
    val newLists = cosinePairs(tfNew, tfAll) // new docs get full lists
    // new docs entering old lists: cosine is symmetric, so compute with
    // the BOUNDED batch as the broadcast query side and swap the pair —
    // never broadcast the old corpus
    val updates = cosinePairs(tfNew, tfOld)
      .select(col("j").as("i"), col("i").as("j"), col("cos"))
    rankTopK(existing.select("i", "j", "cos")
      .unionByName(newLists).unionByName(updates), k)
  }

  /** Oracle CTE block shared by the cosine queries: `tf`, `norms`,
    * `dots` (bounded by `queryPredSql`), `sims`. */
  def cosineSimsCte(queryPredSql: String): String =
    s"""tf AS (${termFreqSql(dropStopwords = true)}),
       |norms AS (SELECT doc_id, CAST(sum(tf * tf) AS BIGINT) AS n2 FROM tf GROUP BY doc_id),
       |dots AS (
       |SELECT a.doc_id AS i, b.doc_id AS j, CAST(sum(a.tf * b.tf) AS BIGINT) AS dot
       |FROM tf a JOIN tf b ON a.tok = b.tok
       |WHERE ($queryPredSql) AND b.doc_id <> a.doc_id
       |GROUP BY a.doc_id, b.doc_id),
       |sims AS (
       |SELECT i, j, CAST(dot AS DOUBLE) / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) AS cos
       |FROM dots JOIN norms na ON na.doc_id = i JOIN norms nb ON nb.doc_id = j)""".stripMargin
}
