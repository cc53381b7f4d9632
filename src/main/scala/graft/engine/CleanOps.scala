package graft.engine

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Numeric-string cleaning and derived-column operators.
  *
  * Re-expresses the reference's `clean_numeric_column`
  * (`/root/reference/amazon1.py:42-59`, `big datarr.R:39-57`) and the
  * discount derivations (`amazon1.py:87-89`) as pure Catalyst
  * expression pipelines — no UDFs, fully codegen'd, pushdown-friendly.
  */
object CleanOps {

  /** P1 — clean a dirty numeric string column: cast to string, strip
    * every char outside `[0-9.]` (or `[0-9]` when decimals are not
    * allowed), take the leading valid numeric token, map empty to null,
    * cast to double. ASCII classes on purpose: Java and RE2 dialects
    * agree on them (SURVEY.md §7.4.3), and the reference's data is
    * `"₹1,099"`-shaped (`amazon1.py:54`).
    *
    * Deviation from the reference (documented): pandas `astype(float)`
    * raises on pathological multi-dot strings like `"3..5"`; this
    * engine deterministically takes the leading valid prefix (`"3."` →
    * 3.0) instead of failing the whole job — at 100 TB a single dirty
    * row must not kill the pipeline.
    */
  def cleanNumeric(c: Column, allowDecimal: Boolean): Column = {
    val stripPat = if (allowDecimal) "[^0-9.]" else "[^0-9]"
    val lead = if (allowDecimal) "^([0-9]+\\.?[0-9]*|\\.[0-9]+)" else "^([0-9]+)"
    val stripped = regexp_replace(c.cast("string"), stripPat, "")
    val token = regexp_extract(stripped, lead, 1)
    when(token === "", lit(null)).otherwise(token).cast("double")
  }

  /** SQL (DuckDB) rendering of [[cleanNumeric]] for the oracle. */
  def cleanNumericSql(e: String, allowDecimal: Boolean): String = {
    val stripPat = if (allowDecimal) "[^0-9.]" else "[^0-9]"
    val lead = if (allowDecimal) "^([0-9]+\\.?[0-9]*|\\.[0-9]+)" else "^([0-9]+)"
    s"TRY_CAST(nullif(regexp_extract(regexp_replace(CAST($e AS VARCHAR), '$stripPat', '', 'g'), '$lead', 1), '') AS DOUBLE)"
  }

  /** P3 — null-fill + clamp to [lo, hi] (`amazon1.py:89` fillna(0) +
    * clip(0, 100)). */
  def fillClamp(c: Column, fill: Double, lo: Double, hi: Double): Column =
    least(greatest(coalesce(c, lit(fill)), lit(lo)), lit(hi))

  /** Quantize a 2-decimal monetary double to exact integer cents.
    * `round(x*100)` on identical input doubles is deterministic across
    * engines, and all downstream aggregation happens in exact integer
    * space (Q scaladoc determinism contract). */
  def cents(c: Column): Column = round(c * lit(100.0)).cast("long")

  def centsSql(e: String): String = s"CAST(round($e * 100.0) AS BIGINT)"
}
