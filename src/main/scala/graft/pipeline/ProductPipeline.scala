package graft.pipeline

import graft.engine.{CleanOps, SimilarityOps, TextOps}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's complete program — E1 batch EDA, E2 offline index
  * build, E3 online recommend (`/root/reference/amazon1.py`) — as one
  * composable module over a reference-shaped products table
  * (FIXTURES.md §A). Each stage is a pure DataFrame function; the
  * driver-table generalizations live in `graft.queries`, this is the
  * faithful end-to-end replica.
  */
object ProductPipeline {

  /** S2 — CSV scan with header + schema inference (`amazon1.py:24-25`)
    * and a stable `row_id` captured immediately at read (SURVEY.md
    * §7.4.1: pandas row-order semantics — dedup keep-first, stable
    * ties, first-match lookup — need a total order).
    *
    * Scale-safe id derivation, Catalyst-native (r22): `row_id` is the
    * same 0-based (partition, offset) total order that r21's RDD
    * `zipWithIndex` produced — `monotonically_increasing_id()` encodes
    * exactly (partitionId << 33) + offset, so `base(partition) +
    * offset` with bases from one small per-partition count job (the
    * very job zipWithIndex ran) is value-identical. Unlike the RDD
    * round-trip, the CSV file-source relation survives: downstream
    * column pruning still reaches the scan, no eager whole-row
    * Row-boxing pass, and the ingest plan stays whole-stage codegen
    * (the r21 form replaced the scan with a LogicalRDD, losing both —
    * ADVICE r21). The r20 single-task global window remains gone.
    * Both the count job and the final read plan the same file splits
    * (same session, files and conf → deterministic planning), which
    * PipelineSpec's repeated-load determinism test pins. */
  def loadCsv(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.option("header", "true").option("inferSchema", "true")
      .csv(path)
    val mid = monotonically_increasing_id()
    val offsetMask = (1L << 33) - 1
    val counts = raw.select(shiftright(mid, 33).as("pid"))
      .groupBy("pid").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val bases = counts.map { case (pid, n) => val b = acc; acc += n; (pid, b) }
    import spark.implicits._
    val baseDf = bases.toSeq.toDF("__pid", "__base")
    // LEFT join + loud guard: the counts job and this read plan the
    // same splits in practice (same session/files/conf), but if they
    // ever diverge, a pid unseen by the counts job must FAIL the load
    // — an inner join would silently drop its rows instead
    raw.withColumn("__mid", mid)
      .withColumn("__pid", shiftright(col("__mid"), 33))
      .join(broadcast(baseDf), Seq("__pid"), "left")
      .withColumn("row_id",
        when(col("__base").isNull, raise_error(concat(
          lit("loadCsv: partition planning diverged between the " +
            "per-partition count job and the read (pid "),
          col("__pid"), lit(" has no base offset)"))).cast("long"))
          .otherwise(col("__base") + col("__mid").bitwiseAND(offsetMask)))
      .drop("__pid", "__base", "__mid")
  }

  /** E1 cleaning — P1 ×4 (`amazon1.py:51-59`) + P2/P3 discount
    * derivations (`amazon1.py:87-89`) with the NaN-vs-null policy of
    * SURVEY.md §7.4.2 (cleaning yields null, division guarded).
    *
    * Decimal flags match the reference's `columns_to_clean` map
    * (`amazon1.py:50-58`) exactly: only `ratings` allows a decimal
    * point; both price columns strip it, so a price of "₹1,099.50"
    * cleans to 109950.0 — the dot is removed like any other
    * non-digit. That is lossy, but it is the reference's contract and
    * PipelineSpec pins it with a decimal-bearing fixture row. */
  def clean(df: DataFrame): DataFrame = df
    .withColumn("ratings_cleaned",
      CleanOps.cleanNumeric(col("ratings"), allowDecimal = true))
    .withColumn("no_of_ratings_cleaned",
      CleanOps.cleanNumeric(col("no_of_ratings"), allowDecimal = false))
    .withColumn("discount_price_cleaned",
      CleanOps.cleanNumeric(col("discount_price"), allowDecimal = false))
    .withColumn("actual_price_cleaned",
      CleanOps.cleanNumeric(col("actual_price"), allowDecimal = false))
    .withColumn("discount_diff",
      col("actual_price_cleaned") - col("discount_price_cleaned"))
    .withColumn("discount_pct", CleanOps.fillClamp(
      col("discount_diff") / nullif(col("actual_price_cleaned"), lit(0.0)) * 100.0,
      0.0, 0.0, 100.0))

  /** F2 — whole-row dedup, keep FIRST occurrence by row_id (pandas
    * `drop_duplicates` keep='first', `amazon1.py:119-122`; nulls
    * compare equal within the key, matching pandas). */
  def dedupKeepFirst(df: DataFrame): DataFrame = {
    val keyCols = df.columns.filterNot(_ == "row_id").map(col _)
    val w = Window.partitionBy(keyCols: _*).orderBy(col("row_id"))
    df.withColumn("dup_rn", row_number().over(w))
      .filter(col("dup_rn") === 1).drop("dup_rn")
  }

  /** T1 — top-10 by cleaned ratings count (`amazon1.py:63-64`); pandas
    * NaN-sorts-last ≡ desc_nulls_last; row_id breaks ties. */
  def top10(df: DataFrame): DataFrame = df
    .orderBy(desc_nulls_last("no_of_ratings_cleaned"), asc("row_id"))
    .limit(10)
    .select("name", "ratings_cleaned", "no_of_ratings_cleaned",
      "discount_price_cleaned", "actual_price_cleaned")

  /** P7 — `shorten_image_url` (`amazon1.py:163-169`): the id between
    * `images/` and `._AC_UL320_.jpg`. */
  def shortenImageUrl(c: Column): Column =
    substring_index(substring_index(c, "images/", -1), "._AC_UL320_.jpg", 1)

  /** P8 — `shorten_amazon_link` (`amazon1.py:171-176`). */
  def shortenLink(c: Column): Column =
    regexp_replace(c, "^https://www\\.amazon\\.in/", "")

  /** P5+P6 — `search_terms` (`amazon1.py:128-130`): normalize +
    * Porter-stem via the native codegen expression. */
  def searchTerms(c: Column): Column =
    graft.functions.StemText.graft_stem(TextOps.normalize(c))

  /** E2 — offline neighbor-index build (`amazon1.py:116-179`): dedup →
    * dropna(name) → search_terms → TF with vocab cap (M3) → all-pairs
    * exact cosine → per-row top-k (T3). All-pairs is the reference's
    * own semantics and is meant for the ≈10k-row products table; the
    * unbounded-corpus scale path is the LSH family in `graft.dedup`.
    * Returns `(i, j, rn, cos)` plus the deduped base as a pair. */
  def buildIndex(products: DataFrame, k: Int = 10,
      vocabCap: Int = 5000): (DataFrame, DataFrame) = {
    val base = dedupKeepFirst(products)
      .na.drop(Seq("name"))
      .withColumn("image_id", shortenImageUrl(col("image")))
      .withColumn("link_id", shortenLink(col("link")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val docs = base.select(col("row_id").as("doc_id"),
      searchTerms(col("name")).as("text"))
    val tfAll = SimilarityOps.termFreq(docs, dropStopwords = true)
    val vocab = tfAll.groupBy("tok").agg(sum(col("tf")).as("ctf"))
      .orderBy(desc("ctf"), asc("tok")).limit(vocabCap).select("tok")
    val tf = tfAll.join(broadcast(vocab), Seq("tok"), "left_semi")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    (base, SimilarityOps.cosineTopKFrom(tf, tf, k))
  }

  /** Persist / reload the neighbor index (`amazon1.py:155`: build
    * once, amortize across queries — SURVEY.md §4 "materialized
    * neighbor table"). Parquet keeps it queryable by any session. */
  def saveIndex(neighbors: DataFrame, path: String): Unit =
    neighbors.write.mode("overwrite").parquet(path)

  def loadIndex(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** E3 — `get_similar_products` (`amazon1.py:181-202`): exact-name
    * lookup first (F4; keep-first by row_id — documented deterministic
    * choice where Py keeps last and R keeps first, SURVEY.md §2.3),
    * then case-sensitive substring match on the shortened link (F3),
    * then gather k neighbors (J2) and project the display columns
    * (M6). Returns an empty DataFrame when nothing matches.
    *
    * Deviations from the reference, both deliberate: (1) a query doc
    * with no token overlap returns 0 rows — the reference's dense
    * matrix would pad with arbitrary zero-similarity products, which
    * is noise; the sparse index never materializes zero-sim pairs.
    * (2) an empty query string matches the first row via substring
    * fallback — same behavior as Python's `'' in s == True`. */
  def recommend(base: DataFrame, neighbors: DataFrame, query: String,
      k: Int = 5): DataFrame = {
    val exact = base.filter(col("name") === query)
      .select(min(col("row_id")).as("qid"))
    val exactId = exact.collect().headOption.flatMap(r =>
      if (r.isNullAt(0)) None else Some(r.getLong(0)))
    val qid = exactId.orElse {
      base.filter(instr(col("link_id"), query) > 0)
        .select(min(col("row_id")).as("qid")).collect().headOption
        .flatMap(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    }
    // no match: run the same plan with an impossible id so the empty
    // result keeps the full 8-column schema (callers can still select
    // or union it; the reference just prints a message)
    val id = qid.getOrElse(-1L)
    neighbors.filter(col("i") === id && col("rn") <= k)
      .join(base, col("j") === base("row_id"))
      .orderBy("rn")
      .select(col("rn"), col("name"), col("ratings_cleaned"),
        col("no_of_ratings_cleaned"), col("discount_price_cleaned"),
        col("actual_price_cleaned"), col("image_id"), col("link_id"))
  }
}
