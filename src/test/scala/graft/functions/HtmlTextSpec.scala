package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Block-density main-content extraction (VERDICT r12 #2): each rule —
  * script/style removal, the short-block cut, the link-density cut —
  * is pinned on a block that ONLY that rule decides. */
class HtmlTextSpec extends SparkSpec {
  import spark.implicits._

  private def extract(html: String): String =
    Seq(html).toDF("html")
      .select(HtmlText.mainText(col("html")).as("t")).as[String].head()

  test("content survives; nav, link-farm, footer, script and style do not") {
    val body = "the quick brown fox jumps over the lazy dog repeatedly"
    val page =
      "<html><head><style>body { color: red; }</style>" +
        "<script>var longTrackingBlob = 'x'.repeat ? 'y' : 'z';</script></head>" +
        "<body><nav><a href='/'>home</a> <a href='/tags'>tags</a></nav>" +
        s"<div class='content'>$body</div>" +
        "<div><a href='/r/1'>related one</a> <a href='/r/2'>related two</a> " +
        "<a href='/r/3'>related three</a></div>" +
        "<footer><a href='/terms'>terms</a> <a href='/privacy'>privacy</a> " +
        "<a href='/contact'>contact</a> (c) example</footer></body></html>"
    assert(extract(page) == body)
  }

  test("link-density rule alone drops a LONG link farm") {
    // 38 stripped chars (>= 25, passes the length rule) but 35 anchor
    // chars: 70 > 38 → only the density rule removes it
    val farm = "<div><a href='/1'>related one</a> <a href='/2'>related two</a> " +
      "<a href='/3'>related three</a></div>"
    assert(extract(farm) == "")
  }

  test("short-block rule alone drops a link-free fragment") {
    assert(extract("<div>too short to keep</div>") == "")
    // and exactly MinBlockChars chars with no links survives
    val exact = "x" * HtmlText.MinBlockChars
    assert(extract(s"<div>$exact</div>") == exact)
  }

  test("density boundary: anchor chars exactly half the text is kept") {
    // text = 26 chars, anchor = 13 chars → 26 <= 26: kept (<= rule)
    val half = "<div><a href='/x'>aaaaaaaaaaaaa</a> bbbbbbbbbbbb</div>"
    assert(extract(half) == "aaaaaaaaaaaaa bbbbbbbbbbbb")
  }

  test("script content never leaks even when longer than MinBlockChars") {
    val page = "<div><script>var x = 'this script payload is well over " +
      "twenty five characters long';</script>real content that is " +
      "definitely long enough to keep</div>"
    assert(extract(page) ==
      "real content that is definitely long enough to keep")
  }

  test("whitespace squashes: multi-space and newline runs collapse") {
    val page = "<div>alpha    beta\n\n  gamma delta epsilon zeta eta</div>"
    assert(extract(page) == "alpha beta gamma delta epsilon zeta eta")
  }
}
