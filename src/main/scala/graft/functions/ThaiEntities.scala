package graft.functions

import org.apache.spark.sql.Column

/** The reference's exact Thai legal-entity vocabulary, packaged so its
  * users can run the same normalization/search pipeline unchanged
  * (scraper_v2.py:612-866). `TextNorm` is locale-agnostic; this object
  * is the drop-in configuration for the DBD use case.
  */
object ThaiEntities {

  /** Company prefix (scraper_v2.py:653). */
  val companyPrefix = "บริษัท"

  /** Partnership prefixes in the reference's break order
    * (scraper_v2.py:643-647): the FIRST one present is removed and the
    * scan stops — order is part of the semantics. */
  val partnershipPrefixes: Seq[String] = Seq(
    "ห้างหุ้นส่วนจำกัด",          // limited partnership
    "ห้างหุ้นส่วนสามัญนิติบุคคล", // registered ordinary partnership
    "ห้างหุ้นส่วนสามัญ")          // ordinary partnership

  /** Short partnership marker used both to detect partnerships and to
    * build the step-3 search variant (scraper_v2.py:790, 818-820). */
  val partnershipShortPrefix = "ห้างหุ้นส่วน"

  /** Public-company marker (scraper_v2.py:822). */
  val publicMarker = "มหาชน"

  /** Step-2 no-space variants for public companies
    * (scraper_v2.py:824-827): "จำกัด (มหาชน)" → "จำกัด(มหาชน)". */
  val noSpaceReplacements: Seq[(String, String)] = Seq(
    "จำกัด (มหาชน)" -> "จำกัด(มหาชน)",
    "จำกัด  (มหาชน)" -> "จำกัด(มหาชน)")

  /** Row-number + registration-number prefix of a search-result line
    * (scraper_v2.py:637: `\d+\s+(0\d{12})\s+(.+)`); group 2 is the
    * company-name remainder. */
  val regPrefixPattern = "\\d+\\s+(0\\d{12})\\s+(.+)"

  val allPrefixes: Seq[String] = companyPrefix +: partnershipPrefixes

  /** Legal-form suffixes cut for the core name (scraper_v2.py:657-658). */
  val legalSuffixes: Seq[String] = Seq("จำกัด")

  /** Entity markers for the ingest filter (scraper_v2.py:517). */
  val entityMarkers: Seq[String] = Seq("จำกัด", "มหาชน")

  /** Registration number format (scraper_v2.py:513). */
  val regNumberPattern = "^0\\d{12}$"

  /** Filler patterns (scraper_v2.py:666-677), verbatim. */
  val fillerPatterns: Seq[String] = Seq(
    "\\(ประเทศไทย\\)", "ประเทศไทย",
    "\\(ไทยแลนด์\\)", "ไทยแลนด์",
    "\\(Thailand\\)", "Thailand",
    "\\(เอเชีย\\)", "เอเชีย",
    "\\(Asia\\)", "Asia",
    "อินเตอร์เนชั่นแนล", "อินเตอร์เนชันแนล",
    "กรุ๊ปส์", "กรุ๊ป",
    "โฮลดิ้งส์", "โฮลดิ้ง",
    "เอ็นเตอร์ไพรส์", "เอ็นเตอร์ไพรซ์",
    "คอร์ปอเรชั่น", "คอร์ปอเรชัน")

  /** The reference's normalize_company_name (scraper_v2.py:612-621). */
  def normalize(c: Column): Column =
    TextNorm.stripMarkers(c, Seq(companyPrefix,
      "ห้างหุ้นส่วนจำกัด", "ห้างหุ้นส่วนสามัญ"))

  /** The reference's extract_company_core_name (scraper_v2.py:624-662):
    * reg-prefix capture, break-on-first partnership prefix, company
    * prefix strip, suffix cut. */
  def coreName(c: Column): Column =
    TextNorm.coreName(c, Seq(companyPrefix), legalSuffixes,
      regPrefixPattern = regPrefixPattern,
      firstOnlyPrefixes = partnershipPrefixes)

  /** The reference's generate_search_terms pipeline
    * (scraper_v2.py:770-866): ordered deduped variants including the
    * partnership and public-company step-2/3 branches. */
  def searchTerms(c: Column): Column =
    TextNorm.searchTerms(c, Seq(companyPrefix), legalSuffixes, fillerPatterns,
      partnershipPrefixes = partnershipPrefixes,
      partnershipShortPrefix = partnershipShortPrefix,
      publicMarker = publicMarker,
      noSpaceReplacements = noSpaceReplacements)
}
