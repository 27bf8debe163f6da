package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for a training-data pipeline: language ID,
  * quality scoring, token counting, canonical fingerprinting,
  * shingling. All pure `functions._` compositions (portable to the
  * DuckDB oracle, codegen'd by Catalyst).
  */
object TextAnalysis {

  /** Lowercased, punctuation-stripped, whitespace-collapsed form. */
  def canonicalize(c: Column): Column =
    trim(regexp_replace(regexp_replace(lower(c), "[^a-z0-9 ]", " "), "\\s+", " "))

  def wsTokens(c: Column): Column =
    filter(split(trim(regexp_replace(c, "\\s+", " ")), " "), t => length(t) > 0)

  /** Whitespace token count. */
  def tokenCount(c: Column): Column = size(wsTokens(c))

  /** BPE-ish subword count: alphanumeric runs count once, every other
    * non-space character is its own token (a cheap, deterministic
    * stand-in for a real tokenizer's piece count). */
  def subwordCount(c: Column): Column =
    coalesce(regexp_count(c, lit("[A-Za-z0-9]+|[^A-Za-z0-9\\s]")), lit(0))

  /** Marker-word count for one language (whole-word matches). */
  def markerScore(c: Column, markers: Seq[String]): Column =
    coalesce(regexp_count(lower(c), lit("\\b(" + markers.mkString("|") + ")\\b")), lit(0))

  /** Language-ID marker lists (n-gram-heuristic stand-in: function
    * words are the strongest single-token signal per language). */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "nicht"),
    "en" -> Seq("the", "and", "of", "to", "is"),
    "es" -> Seq("el", "los", "las", "es", "y"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "zh" -> Seq("de", "shi", "bu", "le", "zai"))

  /** Predicted language: argmax marker score, alphabetical tie-break
    * (deterministic CASE chain — identical shape in the SQL oracle).
    * ONE flat CaseWhen via `.when()` chaining, every score referenced
    * twice (once in `greatest`, once in its arm) — free under
    * whole-stage codegen's CSE.
    *
    * This is the CODEGEN-SAFE default (r17): the r16 let-bound
    * `transform` variant ([[langIdHof]]) is a HigherOrderFunction, and
    * any projection containing one is excluded from WholeStageCodegen
    * — corpus_curate's combined langId+qualityScore Project fell back
    * to interpreted eval and regressed 1.29 → 2.78 s. Use [[langIdHof]]
    * ONLY where the surrounding projection is already interpreted
    * (carries another HOF), where the let-binding halves the regex
    * passes instead of de-optimizing the whole projection. */
  def langId(c: Column): Column = {
    val scores = langMarkers.map { case (lang, m) => lang -> markerScore(c, m) }
    val g = greatest(scores.map(_._2): _*)
    scores.tail.foldLeft(when(scores.head._2 === g, lit(scores.head._1))) {
      case (acc, (lang, sc)) => acc.when(sc === g, lit(lang))
    }
  }

  /** [[langId]] with the five marker scores LET-BOUND through a
    * single-element transform (r16): an interpreted projection has no
    * CSE, so the flat form's double score references double the five
    * regexp_count passes there. Same argmax, same alphabetical
    * tie-break, byte-identical output — but the transform is a
    * HigherOrderFunction, so ONLY use this inside projections that
    * already carry a HOF (langid featurize, langid_eval's census
    * input); anywhere else it evicts the projection from
    * WholeStageCodegen (the corpus_curate r16 regression). */
  def langIdHof(c: Column): Column = {
    val scoresArr = array(langMarkers.map { case (_, m) => markerScore(c, m) }: _*)
    element_at(transform(array(scoresArr), sc => {
      val g = array_max(sc)
      langMarkers.zipWithIndex.tail.foldLeft(
        when(element_at(sc, 1) === g, lit(langMarkers.head._1))) {
        case (acc, ((lang, _), i)) => acc.when(element_at(sc, i + 1) === g, lit(lang))
      }
    }), 1)
  }

  /** Gopher-style quality gate (word count in 30..10000, mean word
    * length in 3..10, type-token ratio ≥ 0.35, stopword presence) —
    * the single source for the flag used by both the standalone
    * `text_gopher_quality` query and the curation capstone's quality
    * stage. Null (not false) when the doc has no tokens: callers
    * decide the empty-doc policy (`coalesce(_, false)` or a filter). */
  def gopherPass(c: Column): Column = {
    val toks = wsTokens(c)
    val nWords = size(toks)
    val meanWordLen = when(nWords > 0,
      length(regexp_replace(c, "\\s", "")).cast("double") / nWords)
    val ttr = when(nWords > 0,
      size(array_distinct(toks)).cast("double") / nWords)
    val hasStop = array_contains(toks, "the") || array_contains(toks, "a")
    nWords.between(30, 10000) && meanWordLen.between(3.0, 10.0) &&
      ttr >= 0.35 && hasStop
  }

  /** Composite quality score in [0,1]: stopword share, mean word
    * length (saturating at 8), and document length (saturating at 100
    * words) — the reference-style heuristic mix. */
  def qualityScore(c: Column): Column = {
    val nWords = tokenCount(c).cast("double")
    val nChars = length(regexp_replace(c, "\\s", "")).cast("double")
    val stop = markerScore(c, Seq("the", "a", "of", "and", "to", "in")).cast("double")
    val stopRatio = when(nWords > 0, stop / nWords).otherwise(lit(0.0))
    val avgWordLen = when(nWords > 0, nChars / nWords).otherwise(lit(0.0))
    PRound.pround(least(stopRatio * 2, lit(1.0)) * 0.4 +
      least(avgWordLen / 8.0, lit(1.0)) * 0.3 +
      least(nWords / 100.0, lit(1.0)) * 0.3, 4)
  }

  /** PII scrubbing for training corpora: emails and phone-like number
    * runs replaced by typed placeholders. Patterns are deliberately
    * simple/deterministic (production systems layer NER on top; the
    * regex tier is the cheap always-on pass). */
  def redactPii(c: Column): Column = {
    val email = regexp_replace(c,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[EMAIL]")
    regexp_replace(email,
      "\\+?\\d[\\d-]{7,}\\d", "[PHONE]")
  }

  /** Canonical fingerprint: md5 of the sorted distinct token set —
    * the key-collision style fingerprint used for clustering noisy
    * duplicates. */
  def fingerprint(c: Column): Column =
    md5(array_join(array_sort(array_distinct(wsTokens(canonicalize(c)))), " "))

  /** Distinct word k-shingles of the text (native expression — see
    * [[graft.functions.expr.WordShingles]] for why not HOFs). */
  def wordShingles(c: Column, k: Int): Column = {
    import org.apache.spark.sql.GraftBridge.{column, expression}
    column(graft.functions.expr.WordShingles(expression(c), k))
  }

  /** Distinct character k-grams of the string. */
  def charGrams(c: Column, k: Int): Column = {
    val n = length(c)
    array_distinct(transform(
      when(n >= k, sequence(lit(1), n - (k - 1))).otherwise(array()),
      i => c.substr(i, lit(k))))
  }
}
