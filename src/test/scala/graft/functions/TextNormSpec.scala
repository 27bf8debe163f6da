package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextNormSpec extends SparkSpec {
  import spark.implicits._

  private def run1(c: org.apache.spark.sql.Column, input: String): String =
    Seq(input).toDF("s").select(c.as("r")).as[String].head()

  test("collapseWs collapses runs and trims") {
    assert(run1(TextNorm.collapseWs(col("s")), "  a   b \t c  ") == "a b c")
  }

  test("stripMarkers removes every marker occurrence (reference prefix strip)") {
    // Thai legal-entity vocabulary from scraper_v2.py:612-621
    val c = TextNorm.stripMarkers(col("s"), Seq("บริษัท", "ห้างหุ้นส่วนจำกัด"))
    assert(run1(c, "บริษัท สยาม จำกัด") == "สยาม จำกัด")
    assert(run1(c, "ห้างหุ้นส่วนจำกัด รุ่งเรือง") == "รุ่งเรือง")
  }

  test("coreName keeps text before the first legal-form suffix") {
    val c = TextNorm.coreName(col("s"), Seq("บริษัท"), Seq("จำกัด"))
    assert(run1(c, "บริษัท สยาม อุตสาหกรรม จำกัด (มหาชน)") == "สยาม อุตสาหกรรม")
  }

  test("removeParens handles ascii and full-width parens") {
    assert(run1(TextNorm.removeParens(col("s")), "ABC (Thailand) DEF （เอเชีย）") == "ABC DEF")
  }

  test("removeTrailingNumbers drops numeric parens and trailing years") {
    assert(run1(TextNorm.removeTrailingNumbers(col("s")), "ABC (1999) 2020") == "ABC")
    assert(run1(TextNorm.removeTrailingNumbers(col("s")), "ABC 123 DEF") == "ABC 123 DEF")
  }

  test("progressiveTrims yields n-1..1 word prefixes") {
    val r = Seq("a b c d").toDF("s")
      .select(TextNorm.progressiveTrims(col("s")).as("r")).as[Seq[String]].head()
    assert(r == Seq("a b c", "a b", "a"))
  }

  test("stripFirstMarker removes only the first matching marker (break semantics)") {
    val c = TextNorm.stripFirstMarker(col("s"),
      Seq("ห้างหุ้นส่วนจำกัด", "ห้างหุ้นส่วนสามัญนิติบุคคล", "ห้างหุ้นส่วนสามัญ"))
    assert(run1(c, "ห้างหุ้นส่วนจำกัด รุ่งเรือง") == "รุ่งเรือง")
    // a later-listed marker survives when an earlier one matched
    assert(run1(c, "ห้างหุ้นส่วนจำกัด เอ ห้างหุ้นส่วนสามัญ") == "เอ ห้างหุ้นส่วนสามัญ")
  }

  test("coreName strips a row/reg-number prefix before extraction (scraper_v2.py:637-640)") {
    val c = TextNorm.coreName(col("s"), Seq("บริษัท"), Seq("จำกัด"),
      regPrefixPattern = ThaiEntities.regPrefixPattern,
      firstOnlyPrefixes = ThaiEntities.partnershipPrefixes)
    assert(run1(c, "123 0123456789012 บริษัท สยาม จำกัด") == "สยาม")
    assert(run1(c, "บริษัท สยาม จำกัด") == "สยาม") // no prefix → unchanged path
    // partnership prefix removed whole, BEFORE the จำกัด suffix split
    assert(run1(c, "ห้างหุ้นส่วนจำกัด รุ่งเรือง") == "รุ่งเรือง")
  }

  test("searchTerms partnership branch emits steps 2-3 (scraper_v2.py:797-820)") {
    val r = Seq("ห้างหุ้นส่วนจำกัด รุ่งเรือง การช่าง").toDF("s")
      .select(ThaiEntities.searchTerms(col("s")).as("r")).as[Seq[String]].head()
    assert(r.take(3) == Seq(
      "ห้างหุ้นส่วนจำกัด รุ่งเรือง การช่าง", // 1. full (no บริษัท to strip)
      "รุ่งเรือง การช่าง",                   // 2. partnership prefix dropped
      "ห้างหุ้นส่วน รุ่งเรือง การช่าง"))      // 3. short-prefix variant
    assert(r.contains("รุ่งเรือง"))            // 8. progressive trim
  }

  test("searchTerms public-company branch emits the no-space variant (scraper_v2.py:822-834)") {
    val r = Seq("บริษัท เสริมสุข จำกัด (มหาชน)").toDF("s")
      .select(ThaiEntities.searchTerms(col("s")).as("r")).as[Seq[String]].head()
    assert(r.take(4) == Seq(
      "เสริมสุข จำกัด (มหาชน)",  // 1. full, prefix-stripped
      "เสริมสุข จำกัด(มหาชน)",   // 2. no-space suffix variant
      "เสริมสุข จำกัด",          // 3. cut before the public marker
      "เสริมสุข"))               // 4. core
  }

  test("searchTerms orders variants and dedups keeping first occurrence") {
    val c = TextNorm.searchTerms(col("s"), Seq("บริษัท"), Seq("จำกัด"), Seq("\\(ประเทศไทย\\)"))
    val r = Seq("บริษัท เอบีซี (ประเทศไทย) จำกัด").toDF("s")
      .select(c.as("r")).as[Seq[String]].head()
    // full (stripped), core, filler-cleaned, paren-free (dup of cleaned), trims
    assert(r.head == "เอบีซี (ประเทศไทย) จำกัด")
    assert(r.contains("เอบีซี (ประเทศไทย)"))
    assert(r.contains("เอบีซี"))
    assert(r.distinct == r)
  }
}
