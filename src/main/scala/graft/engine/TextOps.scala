package graft.engine

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text normalization + tokenization operators.
  *
  * Re-expresses the reference's search-term normalization
  * (`/root/reference/amazon1.py:128-130`) and the sklearn
  * CountVectorizer tokenizer (`amazon1.py:133`, default token pattern
  * `\w\w+` = 2+ word chars) in explicit-ASCII Java regex so the DuckDB
  * oracle (RE2-like dialect) agrees (SURVEY.md §7.4.3).
  */
object TextOps {

  /** M1 — sklearn-style token pattern: runs of 2+ `[a-z0-9_]` after
    * lowercasing. */
  val TokenPattern = "[a-z0-9_]{2,}"

  /** Tokenize a text column into an array of lowercase tokens. */
  def tokens(c: Column): Column =
    regexp_extract_all(lower(c), lit(TokenPattern), lit(0))

  def tokensSql(e: String): String =
    s"regexp_extract_all(lower($e), '$TokenPattern')"

  /** P5 — lowercase + punctuation→space normalization
    * (`amazon1.py:128`): the `search_terms` derivation. Whitespace is
    * spelled out explicitly — Java's `\s` includes vertical tab, RE2's
    * does not, so a `\s` here would silently diverge from the oracle
    * on exotic whitespace. */
  def normalize(c: Column): Column =
    trim(regexp_replace(lower(c), "[^a-z0-9_ \\t\\n\\f\\r]+", " "))

  def normalizeSql(e: String): String =
    s"trim(regexp_replace(lower($e), '[^a-z0-9_ \\t\\n\\f\\r]+', ' ', 'g'))"

  /** M2 — compact English stopword list (engine constant; the reference
    * uses nltk/sklearn lists, `amazon1.py:105,133` — shipping a fixed
    * in-repo list keeps the engine dependency-free and the oracle SQL
    * renderable). */
  val StopWords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "for",
    "on", "with", "as", "at", "by", "from", "be", "this", "that", "are",
    "was", "were", "has", "have", "had", "not", "but", "its", "they",
    "them", "he", "she", "we", "you", "i", "my", "your", "our", "their",
    "will", "would", "can", "could", "do", "does", "did", "so", "if",
    "then", "than", "there", "here", "what", "when", "which", "who",
    "how", "all", "each", "no", "nor", "only", "own", "same", "some",
    "such", "too", "very")

  /** Stopword list rendered as a SQL IN-list, shared verbatim between
    * the Spark filter and the DuckDB oracle. */
  val StopWordsSql: String = StopWords.map(w => s"'$w'").mkString("(", ", ", ")")
}
