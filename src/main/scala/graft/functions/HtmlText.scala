package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Main-content extraction from raw HTML — the boilerplate-removal
  * step between a fetched crawl page and the language-ID/quality gates
  * (VERDICT r12 #2; the reference's extraction layer runs on fetched
  * pages, scraper_v2.py:1136-1230 — it scrapes STRUCTURED regions,
  * this is the unstructured-text sibling a corpus pipeline needs).
  *
  * A block-text-density heuristic (the boilerpipe/Arc90 family reduced
  * to engine-exact INTEGER rules), entirely codegen'd Column work —
  * regex + higher-order functions, no UDF, row-local (zero shuffle):
  *
  *   1. script/style subtrees are removed outright;
  *   2. the page splits into BLOCKS at block-level tag boundaries
  *      (div/p/hN/li/table/nav/header/footer/…/br);
  *   3. a block survives if its tag-stripped text is ≥
  *      [[MinBlockChars]] AND its anchor-text chars × 2 ≤ total text
  *      chars (link density ≤ ½ — both sides integers, no float edge);
  *   4. survivors join with single spaces, whitespace-squashed.
  *
  * Every regex stays in the RE2-compatible subset (no backreferences;
  * lazy quantifiers and inline (?is) flags only), so a DuckDB oracle
  * replays the extraction verbatim.
  */
object HtmlText {

  /** Minimum tag-stripped block length — short nav/footer/title
    * fragments fall below it. */
  val MinBlockChars = 25

  /** Block-level boundary tags (opening or closing, any attributes). */
  private val BlockSplit =
    "(?i)</?(?:div|p|h[1-6]|li|ul|ol|table|tr|td|th|nav|header|footer|" +
      "article|section|main|aside)(?:[^>]*)>|<br */?>"

  /** Collapse whitespace runs and trim — the canonical text form the
    * tokenizer side already uses. */
  private def squash(c: Column): Column =
    trim(regexp_replace(c, "\\s+", " "))

  private def stripTags(c: Column): Column =
    squash(regexp_replace(c, "<[^>]+>", " "))

  /** Anchor-text char count of one raw block (integer). */
  private def linkChars(b: Column): Column =
    aggregate(transform(
      regexp_extract_all(b, lit("(?is)<a[^>]*>(.*?)</a>"), lit(1)),
      a => length(squash(a))), lit(0), (acc, x) => acc + x)

  /** Raw block array of one page, script/style content removed. */
  private def blocks(html: Column): Column = {
    val noScript = regexp_replace(html, "(?is)<script[^>]*>.*?</script>", " ")
    val clean = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    split(clean, BlockSplit)
  }

  /** Surviving blocks as (t = stripped text, lc = anchor chars)
    * structs — the scored form [[mainText]] and block-census callers
    * share (each block's text is stripped ONCE). */
  def keptBlocks(html: Column): Column = {
    val scored = transform(blocks(html),
      b => struct(stripTags(b).as("t"), linkChars(b).as("lc")))
    filter(scored, s =>
      length(s.getField("t")) >= MinBlockChars &&
        s.getField("lc") * 2 <= length(s.getField("t")))
  }

  /** Extracted main text of an HTML page (possibly empty — callers
    * gate on length downstream, like any quality filter). */
  def mainText(html: Column): Column =
    squash(concat_ws(" ",
      transform(keptBlocks(html), s => s.getField("t"))))
}
