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

  /** Partnership prefixes, longest-first (scraper_v2.py:643-647). */
  val partnershipPrefixes: Seq[String] = Seq(
    "ห้างหุ้นส่วนสามัญนิติบุคคล", // registered ordinary partnership
    "ห้างหุ้นส่วนจำกัด",          // limited partnership
    "ห้างหุ้นส่วนสามัญ")          // ordinary partnership

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

  /** The reference's extract_company_core_name (scraper_v2.py:624-662). */
  def coreName(c: Column): Column =
    TextNorm.coreName(c, allPrefixes, legalSuffixes)

  /** The reference's generate_search_terms pipeline
    * (scraper_v2.py:770-866): ordered deduped variants. */
  def searchTerms(c: Column): Column =
    TextNorm.searchTerms(c, allPrefixes, legalSuffixes, fillerPatterns)
}
