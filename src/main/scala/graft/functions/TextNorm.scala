package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Entity-name normalization primitives.
  *
  * Re-expresses the reference's regex normalization pipeline
  * (scraper_v2.py:612-734: `normalize_company_name`,
  * `extract_company_core_name`, `clean_filler_words`,
  * `remove_parentheses`, `remove_trailing_numbers`) as pure Column
  * functions built on `org.apache.spark.sql.functions` — every one is
  * codegen'd by Catalyst and safe inside WholeStageCodegen, unlike a
  * Scala UDF. All are locale-agnostic: prefixes/fillers/suffixes are
  * caller-supplied, so the Thai legal-entity vocabulary of the
  * reference is just one configuration.
  */
object TextNorm {

  /** Collapse runs of whitespace to single spaces and trim. */
  def collapseWs(c: Column): Column =
    trim(regexp_replace(c, "\\s+", " "))

  /** Remove every literal occurrence of the given prefixes/markers,
    * then collapse whitespace (scraper_v2.py:612-621). */
  def stripMarkers(c: Column, markers: Seq[String]): Column =
    collapseWs(markers.foldLeft(c)((acc, m) =>
      regexp_replace(acc, java.util.regex.Pattern.quote(m), " ")))

  /** Core-name extraction: drop configured prefixes, then keep the text
    * before the first legal-form suffix (scraper_v2.py:624-662). */
  def coreName(c: Column, prefixes: Seq[String], suffixes: Seq[String]): Column = {
    val stripped = stripMarkers(c, prefixes)
    val beforeSuffix = suffixes.foldLeft(stripped)((acc, s) =>
      split(acc, java.util.regex.Pattern.quote(s)).getItem(0))
    collapseWs(beforeSuffix)
  }

  /** Remove all parenthetical content, incl. full-width parentheses
    * (scraper_v2.py:700-714). */
  def removeParens(c: Column): Column =
    collapseWs(regexp_replace(regexp_replace(c, "\\([^)]*\\)", " "), "（[^）]*）", " "))

  /** Remove trailing standalone numbers / years and numeric parens
    * (scraper_v2.py:717-734). */
  def removeTrailingNumbers(c: Column): Column =
    collapseWs(regexp_replace(regexp_replace(c, "\\(\\d+\\)", " "), "\\s+\\d+\\s*$", ""))

  /** Remove caller-supplied filler regex patterns, case-insensitively
    * (scraper_v2.py:666-697). */
  def cleanFiller(c: Column, fillerPatterns: Seq[String]): Column =
    collapseWs(fillerPatterns.foldLeft(c)((acc, p) =>
      regexp_replace(acc, "(?i)" + p, " ")))

  /** Whitespace tokenization of a normalized name. */
  def tokens(c: Column): Column =
    filter(split(collapseWs(c), " "), t => length(t) > 0)

  /** Registration-id validation (scraper_v2.py:513 `^0\d{12}$`
    * generalized to a caller pattern). */
  def isValidId(c: Column, pattern: String): Column =
    c.rlike(pattern)

  /** Progressive word trimming: the ordered array of n-1, n-2, … 1-word
    * prefixes of the name (scraper_v2.py:855-864). Declarative — built
    * from `sequence` + `slice`, no UDF. */
  def progressiveTrims(c: Column): Column = {
    val toks = tokens(c)
    val n = size(toks)
    // i runs n-1 down to 1; empty array when the name has <2 tokens.
    val idx = when(n >= 2, sequence(n - 1, lit(1), lit(-1))).otherwise(array())
    transform(idx, i => array_join(slice(toks, lit(1), i), " "))
  }

  /** Ordered search-term variants with 1-based strategy index:
    * full name, core name, filler-cleaned, paren-free, number-free,
    * then progressive trims — deduplicated keeping first occurrence
    * (scraper_v2.py:770-866). Returns array<string>. */
  def searchTerms(
      c: Column,
      prefixes: Seq[String],
      suffixes: Seq[String],
      fillerPatterns: Seq[String]): Column = {
    val base = stripMarkers(c, prefixes)
    val core = coreName(c, prefixes, suffixes)
    val variants = concat(
      array(base, core, cleanFiller(core, fillerPatterns),
        removeParens(core), removeTrailingNumbers(core)),
      progressiveTrims(core))
    // array_distinct keeps first occurrence → preserves strategy order.
    filter(array_distinct(variants), t => length(t) > 0)
  }
}
