package graft.dedup

import graft.engine.TextOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Large-scale document deduplication operators — the training-data
  * pipeline extension of the reference's similarity machinery
  * (north star, BASELINE.json; SURVEY.md §7.2 phase 6). The reference
  * itself only does whole-row dedup (`/root/reference/amazon1.py:119-122`);
  * these generalize it to content-based near-dup detection that
  * survives 100 TB: every method is a bounded-fan-out hash/bucket
  * pipeline (no all-pairs product), and every hash is md5 so the
  * DuckDB oracle reproduces signatures bit-for-bit.
  *
  * Method inventory (each a first-class `queries()` entry):
  *  - exact dedup: normalized-text md5 fingerprint, keep-first
  *  - MinHash: per-doc signature = min over shingles of md5(seed|shingle)
  *  - LSH banding: band signature join → candidate pairs → exact
  *    Jaccard verification (only candidates are verified — the scale
  *    path for unbounded corpora)
  *  - SimHash: weighted token-hash bit votes (long form)
  *  - n-gram Jaccard: exact shingle-inverted-index pair similarity
  */
object DedupOps {

  val NumHashes = 16
  val Bands = 4

  /** Word 3-gram shingles, distinct per doc: `(doc_id, shingle)`.
    *
    * Shuffle-free construction: the token array never leaves its doc
    * row — three staggered `slice`s zipped elementwise give the
    * trigrams directly, so no per-token window sort (the r1 `lead`
    * window shuffled+sorted every token row; at 100 TB that sort IS
    * the job). The only shuffle left is the `distinct`. */
  def shingles(docs: DataFrame): DataFrame =
    shinglesRaw(docs).distinct()

  /** As [[shingles]] but WITHOUT the per-doc distinct — callers that
    * re-key the shingle (e.g. [[shingleKeys]]) dedup on the smaller
    * key instead of paying a string-payload shuffle here. */
  def shinglesRaw(docs: DataFrame): DataFrame = {
    val n3 = greatest(size(col("toks")) - 2, lit(0))
    docs.select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      .select(col("doc_id"), explode(arrays_zip(
        slice(col("toks"), lit(1), n3).as("t0"),
        slice(col("toks"), lit(2), n3).as("t1"),
        slice(col("toks"), lit(3), n3).as("t2"))).as("g"))
      .select(col("doc_id"),
        concat_ws(" ", col("g.t0"), col("g.t1"), col("g.t2")).as("shingle"))
  }

  /** Distinct 60-bit shingle keys per doc: `(doc_id, sk: long)` where
    * `sk = conv(substr(md5(shingle), 1, 15), 16, 10)`. The 15-hex→long
    * conversion is injective, so Spark joining/grouping on the LONG
    * has IDENTICAL equality classes to the oracle grouping on the
    * 15-char md5 prefix STRING — any 60-bit collision collides in both
    * engines the same way, keeping the comparison exact. Longs cut the
    * inverted-index join's shuffle payload and hashing cost ~3× vs raw
    * shingle strings (the q24 r2 regression was allocation pressure in
    * exactly that string-keyed stretch). */
  def shingleKeys(docs: DataFrame): DataFrame =
    shingleKeysRaw(docs).distinct()

  /** As [[shingleKeys]] but WITHOUT the distinct — callers that
    * re-partition by `sk` first (q24) get the distinct, and any
    * downstream sk-keyed join, for free on that one exchange.
    * r22: the key derivation is the native
    * [[graft.functions.MinHashExprs.ShingleSk]] expression — identical
    * values to `conv(substr(md5(shingle), 1, 15), 16, 10) :: long`
    * (OpsSpec pins it), one thread-local digest per shingle instead of
    * builtin md5's per-call getInstance + hex string + conv parse. */
  def shingleKeysRaw(docs: DataFrame): DataFrame =
    shinglesRaw(docs)
      .select(col("doc_id"),
        graft.functions.MinHashExprs.shingle_sk(col("shingle")).as("sk"))

  /** Oracle rendering of [[shingleKeys]] over a shingle relation —
    * DuckDB keeps the string prefix as the key (no 64-bit hex→int cast
    * needed): equality classes match the Spark longs exactly. */
  def shingleKeysSql(shinglesRel: String): String =
    s"SELECT DISTINCT doc_id, substr(md5(shingle), 1, 15) AS sk FROM $shinglesRel"

  /** DuckDB rendering of [[shingles]] over relation `docs(doc_id, text)`. */
  def shinglesSql(docsRel: String): String =
    s"""SELECT DISTINCT doc_id, shingle FROM (
       |SELECT doc_id, tok || ' ' || lead(tok, 1) OVER w || ' ' || lead(tok, 2) OVER w AS shingle
       |FROM (SELECT doc_id, unnest(toks) AS tok, unnest(range(1, len(toks) + 1)) AS pos
       |      FROM (SELECT doc_id, ${TextOps.tokensSql("text")} AS toks FROM $docsRel))
       |WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
       |) WHERE shingle IS NOT NULL""".stripMargin

  /** Corpus augmented with deterministic near-duplicates: every 20th
    * doc re-appears under `doc_id + 100000` with its first token
    * dropped. Used by the near-dup queries so the pair-detection path
    * has real positives to find (the synthetic corpus has few natural
    * near-dups); both engines construct the same corpus. */
  def augmented(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text"))
      .unionByName(docs.filter(col("doc_id") % 20 === 0)
        .select((col("doc_id") + 100000L).as("doc_id"),
          regexp_replace(col("text"), "^[^ ]+ ", "").as("text")))

  val augmentedSql: String =
    """SELECT doc_id, text FROM documents
      |UNION ALL SELECT doc_id + 100000 AS doc_id,
      |regexp_replace(text, '^[^ ]+ ', '') AS text
      |FROM documents WHERE doc_id % 20 = 0""".stripMargin

  /** MinHash signatures: for each seed h in [0, numHashes), the
    * lexicographic min of `md5(h || '|' || shingle)` over the doc's
    * shingle set. One shuffle (groupBy doc_id, h); fan-out bounded by
    * numHashes. Returns `(doc_id, h, minhash)`. */
  def minhashSignatures(sh: DataFrame, numHashes: Int = NumHashes): DataFrame =
    sh.withColumn("h", explode(sequence(lit(0L), lit(numHashes - 1L))))
      .groupBy("doc_id", "h")
      .agg(min(md5(concat(col("h").cast("string"), lit("|"), col("shingle"))
        .cast("binary"))).as("minhash"))

  def minhashSignaturesSql(shinglesRel: String, numHashes: Int = NumHashes): String =
    s"""SELECT doc_id, h, min(md5(CAST(h AS VARCHAR) || '|' || shingle)) AS minhash
       |FROM $shinglesRel, range($numHashes) t(h)
       |GROUP BY doc_id, h""".stripMargin

  /** LSH banding: the signature's `numHashes` rows split into `bands`
    * contiguous bands; a band signature is the md5 of its concatenated
    * minhashes (CASE-pivot keeps the concat order deterministic without
    * an ordered string_agg, which Spark lacks). Docs sharing any
    * (band, signature) bucket become candidate pairs; candidates — and
    * only candidates — get exact-Jaccard verification. Returns
    * `(i, j)` distinct candidate pairs. */
  def lshCandidates(sigs: DataFrame): DataFrame = {
    val rowsPerBand = NumHashes / Bands
    val banded = sigs
      .withColumn("band", floor(col("h") / rowsPerBand).cast("long"))
      .withColumn("slot", (col("h") % rowsPerBand).cast("long"))
    val slotCols = (0 until rowsPerBand).map(i =>
      min(when(col("slot") === i, col("minhash"))).as(s"m$i"))
    // persisted: both sides of the self-join read this — without it the
    // whole shingle+minhash pipeline executes twice
    val bandSigs = banded.groupBy("doc_id", "band")
      .agg(slotCols.head, slotCols.tail: _*)
      .select(col("doc_id"), col("band"),
        md5(concat((0 until rowsPerBand).map(i => col(s"m$i")): _*)
          .cast("binary")).as("sig"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    candidatesFromBandSigs(bandSigs)
  }

  /** Candidate pairs from a `(doc_id, band, sig)` relation — shared by
    * the relational path above and the native-expression path (q22),
    * so the collision rule lives in one place. */
  def candidatesFromBandSigs(bandSigs: DataFrame): DataFrame = {
    val a = bandSigs.select(col("doc_id").as("i"), col("band"), col("sig"))
    val b = bandSigs.select(col("doc_id").as("j"), col("band"), col("sig"))
    a.join(b, Seq("band", "sig")).filter(col("i") < col("j"))
      .select("i", "j").distinct()
  }

  def lshCandidatesSql(sigsRel: String): String = {
    val rowsPerBand = NumHashes / Bands
    val slots = (0 until rowsPerBand)
      .map(i => s"min(CASE WHEN h % $rowsPerBand = $i THEN minhash END)")
      .mkString(" || ")
    s"""SELECT DISTINCT a.doc_id AS i, b.doc_id AS j FROM (
       |SELECT doc_id, CAST(floor(h / $rowsPerBand) AS BIGINT) AS band, md5($slots) AS sig
       |FROM $sigsRel GROUP BY doc_id, CAST(floor(h / $rowsPerBand) AS BIGINT)) a
       |JOIN (
       |SELECT doc_id, CAST(floor(h / $rowsPerBand) AS BIGINT) AS band, md5($slots) AS sig
       |FROM $sigsRel GROUP BY doc_id, CAST(floor(h / $rowsPerBand) AS BIGINT)) b
       |ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id""".stripMargin
  }

  /** Jaccard similarity for given `(i, j)` pairs over distinct shingle
    * KEYS — integer intersection/union, so the double division is
    * bit-identical across engines. Exact when `key` holds the shingles
    * themselves; q22/q24 feed 60-bit md5-prefix keys instead, where
    * distinct shingles collide with probability ~2⁻⁶⁰ per pair, so the
    * result is exact up to that (negligible, but not zero). */
  def jaccard(pairs: DataFrame, sh: DataFrame, key: String = "shingle"): DataFrame = {
    val counts = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    // candidate pairs are few (LSH-bounded) — broadcast them so the big
    // shingle relation streams through hash joins without a shuffle
    val inter = broadcast(pairs)
      .join(sh.select(col("doc_id").as("i"), col(key)), Seq("i"))
      .join(sh.select(col("doc_id").as("j"), col(key)), Seq("j", key))
      .groupBy("i", "j").agg(count(lit(1)).as("inter"))
    // inter is the small (candidate-bounded) side; per-doc counts scale
    // with the corpus, so broadcast inter and stream counts past it
    val withNa = broadcast(inter)
      .join(counts.select(col("doc_id").as("i"), col("n").as("na")), Seq("i"))
    broadcast(withNa)
      .join(counts.select(col("doc_id").as("j"), col("n").as("nb")), Seq("j"))
      .select(col("i"), col("j"), col("inter"), col("na"), col("nb"),
        (col("inter").cast("double") /
          (col("na") + col("nb") - col("inter")).cast("double")).as("jaccard"))
  }

  /** SimHash bit votes in long form `(doc_id, b, bit)` for b in
    * [0, 64): per token, bit b of its md5 is read from the hex digit
    * at position b/4; the token's tf votes +tf/−tf; the doc's bit is
    * 1 iff the vote sum is non-negative. Long form keeps the oracle
    * dialect-portable (no ordered string_agg / bigint assembly).
    *
    * Computed from raw token OCCURRENCES `(doc_id, tok)`: the vote sum
    * Σ_tok tf·(±1) equals Σ_occurrence (±1) exactly (integer sums), so
    * the (doc, tok) tf pre-aggregation — a full extra shuffle — is
    * dropped, and the 64 per-bit votes are 64 aggregation columns over
    * one hash aggregate keyed by doc_id instead of a 64×-row explode
    * shuffled on (doc_id, b). One digest per occurrence (`hex` is a
    * shared projected column; the 64 vote expressions reuse it via
    * codegen subexpression elimination), one exchange before the final
    * sort. */
  def simhashBits(toks: DataFrame): DataFrame = {
    // loud guard (r22): this function was repurposed in r21 to take raw
    // (doc_id, tok) OCCURRENCES. The old (doc_id, tok, tf) relation
    // still type-checks but would vote once per distinct token instead
    // of tf times — silently wrong fingerprints. Fail fast instead.
    require(!toks.columns.contains("tf"),
      "simhashBits expects raw (doc_id, tok) occurrences; a tf relation " +
        "would vote once per distinct token instead of tf times — " +
        "explode the occurrences instead of aggregating them first")
    val votes = (0 until 64).map { b =>
      val pos = b / 4 + 1
      val shift = 3 - b % 4
      sum(expr(
        s"CAST(shiftright(instr('0123456789abcdef', substr(hex, $pos, 1)) - 1, $shift) AS BIGINT) % 2 * 2 - 1"))
        .as(s"v$b")
    }
    toks.withColumn("hex", md5(col("tok").cast("binary")))
      .groupBy("doc_id")
      .agg(votes.head, votes.tail: _*)
      .select(col("doc_id"),
        posexplode(array((0 until 64).map(b => col(s"v$b")): _*))
          .as(Seq("b", "vote")))
      .select(col("doc_id"), col("b").cast("long").as("b"),
        when(col("vote") >= 0, 1L).otherwise(0L).as("bit"))
  }

  def simhashBitsSql(tfRel: String): String =
    s"""SELECT doc_id, b,
       |CASE WHEN sum(tf * (CAST(floor((instr('0123456789abcdef', substr(md5(tok), CAST(floor(b / 4.0) AS INT) + 1, 1)) - 1) / power(2.0, 3 - (b % 4))) AS BIGINT) % 2 * 2 - 1)) >= 0 THEN 1 ELSE 0 END AS bit
       |FROM $tfRel, range(64) t(b)
       |GROUP BY doc_id, b""".stripMargin
}
