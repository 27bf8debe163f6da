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

  /** Break-on-first-marker strip: markers are tried in order and only
    * the FIRST one present is removed (all its occurrences), mirroring
    * the reference's `break` after the first matching partnership
    * prefix (scraper_v2.py:645-651) — "ห้างหุ้นส่วนจำกัด X" must not
    * also lose a later-listed marker. */
  def stripFirstMarker(c: Column, markers: Seq[String]): Column = {
    val replaced = markers.reverse.foldLeft(c)((fallback, m) =>
      when(c.contains(m),
        regexp_replace(c, java.util.regex.Pattern.quote(m), " "))
        .otherwise(fallback))
    collapseWs(replaced)
  }

  /** Core-name extraction (scraper_v2.py:624-662):
    *  1. if `regPrefixPattern` is set and matches, keep only its second
    *     capture group — strips `"123 0123456789012 Name …"` row/reg
    *     prefixes from search-result lines (scraper_v2.py:637-640);
    *  2. remove the first matching `firstOnlyPrefixes` marker (break
    *     semantics, scraper_v2.py:645-651) — partnership prefixes must
    *     go BEFORE the suffix split or "ห้างหุ้นส่วนจำกัด X" truncates
    *     to "ห้างหุ้นส่วน";
    *  3. strip every `prefixes` marker;
    *  4. keep the text before the first legal-form suffix. */
  def coreName(
      c: Column,
      prefixes: Seq[String],
      suffixes: Seq[String],
      regPrefixPattern: String = "",
      firstOnlyPrefixes: Seq[String] = Nil): Column = {
    val afterReg =
      if (regPrefixPattern.isEmpty) c
      else {
        val captured = regexp_extract(c, regPrefixPattern, 2)
        when(length(captured) > 0, captured).otherwise(c)
      }
    val afterFirst =
      if (firstOnlyPrefixes.isEmpty) afterReg
      else stripFirstMarker(afterReg, firstOnlyPrefixes)
    val stripped = stripMarkers(afterFirst, prefixes)
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

  /** Ordered search-term variants with 1-based strategy index,
    * mirroring the reference's 8-step priority order
    * (scraper_v2.py:770-866):
    *
    *  1. full name with the company prefix stripped;
    *  2–3. entity-form variants —
    *     partnerships (detected by `partnershipShortPrefix` in the raw
    *     name): the name without its partnership prefix (break
    *     semantics), then `shortPrefix + core` (scraper_v2.py:797-820);
    *     public companies (detected by `publicMarker` in the base):
    *     the no-space suffix variant from `noSpaceReplacements`, then
    *     the name cut before the public marker (scraper_v2.py:822-834);
    *  4. core name; 5. filler-cleaned core; 6. paren-free core;
    *  7. trailing-number-free core; 8. progressive word trims (over the
    *     paren-free core when it's non-empty, scraper_v2.py:855-864).
    *
    * Deduplicated keeping first occurrence; empties dropped. Returns
    * array<string>. */
  /** Evaluate `value` once per row and feed the result to `body` — a
    * let-binding via a single-element higher-order transform. Deep
    * Column compositions duplicate every shared subtree (there is no
    * common-subexpression elimination across a generator's child), so
    * without this, `core` below re-evaluates its regex chain ~18× per
    * row and the expansion runs ~3× slower. */
  private def bindOnce(value: Column, body: Column => Column): Column =
    element_at(transform(array(value), body), 1)

  def searchTerms(
      c: Column,
      prefixes: Seq[String],
      suffixes: Seq[String],
      fillerPatterns: Seq[String],
      partnershipPrefixes: Seq[String] = Nil,
      partnershipShortPrefix: String = "",
      publicMarker: String = "",
      noSpaceReplacements: Seq[(String, String)] = Nil): Column =
    bindOnce(stripMarkers(c, prefixes), base =>
      bindOnce(coreName(c, prefixes, suffixes,
        firstOnlyPrefixes = partnershipPrefixes), core =>
        bindOnce(removeParens(core), noParens => {
          // empty strings are filtered after the distinct, so the
          // no-branch placeholder rows vanish without disturbing order.
          val emptyPair = array(lit(""), lit(""))
          val branch =
            if (partnershipShortPrefix.isEmpty && publicMarker.isEmpty) emptyPair
            else {
              val noPrefix = stripFirstMarker(base, partnershipPrefixes)
              val partnershipPair = array(
                noPrefix, concat_ws(" ", lit(partnershipShortPrefix), noPrefix))
              val noSpace = noSpaceReplacements.foldLeft(base) { case (acc, (from, to)) =>
                regexp_replace(acc, java.util.regex.Pattern.quote(from), to)
              }
              val beforeMarker = collapseWs(
                split(split(base, java.util.regex.Pattern.quote(s"($publicMarker)")).getItem(0),
                  java.util.regex.Pattern.quote(publicMarker)).getItem(0))
              val publicPair = array(noSpace, beforeMarker)
              val isPartnership =
                if (partnershipShortPrefix.isEmpty) lit(false)
                else c.contains(partnershipShortPrefix)
              val isPublic =
                if (publicMarker.isEmpty) lit(false) else base.contains(publicMarker)
              when(isPartnership, partnershipPair)
                .when(isPublic, publicPair)
                .otherwise(emptyPair)
            }
          val trimBase = when(length(noParens) > 0, noParens).otherwise(core)
          val variants = concat(
            array(base), branch,
            array(core, cleanFiller(core, fillerPatterns),
              noParens, removeTrailingNumbers(core)),
            progressiveTrims(trimBase))
          // array_distinct keeps first occurrence → preserves strategy order.
          filter(array_distinct(variants), t => length(t) > 0)
        })))
}
