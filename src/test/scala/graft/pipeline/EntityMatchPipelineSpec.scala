package graft.pipeline

import graft.SparkSpec
import graft.functions.ThaiEntities
import graft.sources.GraftConfig

class EntityMatchPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("end-to-end: existing > exact > similarity cascade, records + not-found") {
    val companies = Seq(
      ("บริษัท เอบีซี จำกัด", "0101010101010"),          // existing id
      ("บริษัท สยามเทรด จำกัด", null),                   // exact core match
      ("บริษัท รุ่งเรือง เทรดดิ้ง อิมพอร์ต จำกัด", null),   // fuzzy match (extra token)
      ("บริษัท ไม่มีใครรู้จัก จำกัด", null),               // no match
      ("Plain Foreign Corp", "x")                         // filtered out (no marker)
    ).toDF("company_name", "registration_number")

    val registry = Seq(
      ("0101010101010", "บริษัท เอบีซี จำกัด"),
      ("0202020202020", "บริษัท สยามเทรด จำกัด"),
      ("0303030303030", "บริษัท รุ่งเรือง เทรดดิ้ง จำกัด")
    ).toDF("reg_id", "reg_name")

    val financials = Seq(
      ("0101010101010", 2566, 100.0, 10.0),
      ("0202020202020", 2566, 200.0, 20.0),
      ("0303030303030", 2566, 300.0, 30.0),
      ("0303030303030", 2567, 330.0, 33.0)
    ).toDF("reg_id", "year", "total_revenue", "net_profit")

    val cfg = GraftConfig(regColumn = Some("registration_number"),
      similarityThreshold = 0.5)
    val r = EntityMatchPipeline.run(companies, registry, financials, cfg,
      idCol = "reg_id", registryNameCol = "reg_name", yearCol = "year",
      measureCols = Seq("total_revenue", "net_profit"),
      prefixes = ThaiEntities.allPrefixes,
      suffixes = ThaiEntities.legalSuffixes,
      fillers = ThaiEntities.fillerPatterns)

    val types = r.records.select("name", "match_type").distinct()
      .as[(String, String)].collect().toMap
    assert(types("บริษัท เอบีซี จำกัด") == "existing")
    assert(types("บริษัท สยามเทรด จำกัด") == "exact")
    assert(types("บริษัท รุ่งเรือง เทรดดิ้ง อิมพอร์ต จำกัด") == "similarity_67%")

    // search_strategy (reference CSV column, scraper_v2.py:1341):
    // existing = '', exact = 1-based index of the surfacing variant
    // (the prefix-stripped full name is contained in the registry
    // name → 1), similarity fallback = 'fallback'
    val strats = r.records.select("name", "search_strategy").distinct()
      .as[(String, String)].collect().toMap
    assert(strats("บริษัท เอบีซี จำกัด") == "")
    assert(strats("บริษัท สยามเทรด จำกัด") == "1")
    assert(strats("บริษัท รุ่งเรือง เทรดดิ้ง อิมพอร์ต จำกัด") == "fallback")

    // long-format: 2 fields x (1+1+2 matched fact rows) = 8 records
    assert(r.records.count() == 8)
    val fields = r.records.select("field").distinct().as[String].collect().toSet
    assert(fields == Set("total_revenue", "net_profit"))

    val missing = r.notFound.select("name", "reason")
      .as[(String, String)].collect().toSeq
    assert(missing == Seq(("บริษัท ไม่มีใครรู้จัก จำกัด", "No search results")))
  }

  test("error channel: Browser error + exception passthrough reasons (scraper_v2.py:1534-1545)") {
    val longName = "บริษัท " + ("ยาว" * 100) + " จำกัด" // > 255 chars
    val companies = Seq(
      (longName, "0101010101010"),       // browser form can't carry it
      ("บริษัท จำกัด", null),             // normalizes to an empty core
      ("บริษัท เอบีซี จำกัด", "0101010101010")
    ).toDF("company_name", "registration_number")
    val registry = Seq(("0101010101010", "บริษัท เอบีซี จำกัด"))
      .toDF("reg_id", "reg_name")
    val financials = Seq(("0101010101010", 2566, 1.0))
      .toDF("reg_id", "year", "total_revenue")
    val r = EntityMatchPipeline.run(companies, registry, financials,
      GraftConfig(regColumn = Some("registration_number")),
      idCol = "reg_id", registryNameCol = "reg_name", yearCol = "year",
      measureCols = Seq("total_revenue"),
      prefixes = ThaiEntities.allPrefixes,
      suffixes = ThaiEntities.legalSuffixes,
      fillers = ThaiEntities.fillerPatterns)
    val nf = r.notFound
      .select("name", "matched_id", "reason")
      .as[(String, String, String)].collect().toSet
    // the Browser-error row keeps its existing reg, like the
    // reference's [company, existing_reg or '', ...] row
    assert(nf == Set(
      (longName, "0101010101010", "Browser error"),
      ("บริษัท จำกัด", "", "Error: empty core name: 'บริษัท จำกัด'")))
    // errored companies never reach the cascade or the records
    assert(r.records.select("name").distinct().as[String].collect().toSeq ==
      Seq("บริษัท เอบีซี จำกัด"))
  }

  test("'direct' strategy: the surfacing term equals the registry name (scraper_v2.py:914)") {
    // registry stores the core-form name, so the core variant both
    // surfaces the match AND equals the registered name — the unique
    // hit that redirects straight to the detail page
    val companies = Seq(("บริษัท เอบีซี จำกัด", null.asInstanceOf[String]))
      .toDF("company_name", "registration_number")
    val registry = Seq(("0101010101010", "เอบีซี")).toDF("reg_id", "reg_name")
    val financials = Seq(("0101010101010", 2566, 1.0))
      .toDF("reg_id", "year", "total_revenue")
    val r = EntityMatchPipeline.run(companies, registry, financials,
      GraftConfig(regColumn = Some("registration_number")),
      idCol = "reg_id", registryNameCol = "reg_name", yearCol = "year",
      measureCols = Seq("total_revenue"),
      prefixes = ThaiEntities.allPrefixes,
      suffixes = ThaiEntities.legalSuffixes,
      fillers = ThaiEntities.fillerPatterns)
    val row = r.records.select("match_type", "search_strategy").distinct()
      .as[(String, String)].collect().toSeq
    assert(row == Seq(("exact", "direct")))
  }

  test("targetYears replays the reference's TARGET_YEARS filter") {
    val companies = Seq(("บริษัท เอบีซี จำกัด", "0101010101010"))
      .toDF("company_name", "registration_number")
    val registry = Seq(("0101010101010", "บริษัท เอบีซี จำกัด"))
      .toDF("reg_id", "reg_name")
    val financials = Seq(
      ("0101010101010", 2565, 1.0), ("0101010101010", 2566, 2.0),
      ("0101010101010", 2567, 3.0))
      .toDF("reg_id", "year", "total_revenue")
    def run(cfg: GraftConfig) = EntityMatchPipeline.run(
      companies, registry, financials, cfg,
      idCol = "reg_id", registryNameCol = "reg_name", yearCol = "year",
      measureCols = Seq("total_revenue"),
      prefixes = ThaiEntities.allPrefixes,
      suffixes = ThaiEntities.legalSuffixes,
      fillers = ThaiEntities.fillerPatterns)
    val base = GraftConfig(regColumn = Some("registration_number"))
    assert(run(base).records.count() == 3) // None = all years
    val filtered = run(base.copy(targetYears = Some(Seq(2565, 2567))))
    assert(filtered.records.select("year").as[Int].collect().toSet ==
      Set(2565, 2567))
  }

  test("matched entities with no financial rows land in notFound with their match info") {
    val companies = Seq(("บริษัท เอบีซี จำกัด", "0101010101010"))
      .toDF("company_name", "registration_number")
    val registry = Seq(("0101010101010", "บริษัท เอบีซี จำกัด"))
      .toDF("reg_id", "reg_name")
    val financials = Seq(("0999999999999", 2566, 1.0))
      .toDF("reg_id", "year", "total_revenue")
    val r = EntityMatchPipeline.run(companies, registry, financials,
      GraftConfig(regColumn = Some("registration_number")),
      idCol = "reg_id", registryNameCol = "reg_name", yearCol = "year",
      measureCols = Seq("total_revenue"),
      prefixes = ThaiEntities.allPrefixes,
      suffixes = ThaiEntities.legalSuffixes,
      fillers = ThaiEntities.fillerPatterns)
    assert(r.records.count() == 0)
    val nf = r.notFound
      .select("name", "matched_id", "match_type", "search_strategy", "reason")
      .as[(String, String, String, String, String)].collect().toSeq
    assert(nf == Seq(("บริษัท เอบีซี จำกัด", "0101010101010", "existing", "",
      "No revenue data")))
  }
}

class PipelineRoundTripSpec extends graft.SparkSpec {
  import spark.implicits._
  import graft.sources.{FileIngest, Sinks}

  test("records survive a CSV sink -> ingest round trip (reference output loop)") {
    val records = Seq(
      ("บริษัท เอบีซี จำกัด", "0101010101010", "exact", 2566, "total_revenue", 100.0),
      ("บริษัท เอบีซี จำกัด", "0101010101010", "exact", 2566, "net_profit", 10.0))
      .toDF("name", "matched_id", "match_type", "year", "field", "value")
    val dir = java.nio.file.Files.createTempDirectory("graft-rt").toString + "/records"
    Sinks.csv(records, dir, shards = 1)
    val back = FileIngest.csv(spark, dir)
    assert(back.count() == 2)
    assert(back.columns.toSeq ==
      Seq("name", "matched_id", "match_type", "year", "field", "value"))
    // Thai names intact through the CSV loop (UTF-8 end to end)
    assert(back.select("name").distinct().as[String].head() == "บริษัท เอบีซี จำกัด")
  }
}

/** Capstone integration: a reference user's actual artifacts — a
  * config.yaml (nested layout) and an .xlsx company workbook — drive
  * the whole engine end to end: GraftConfig.fromYaml →
  * FileIngest.auto (sheet by name) → EntityMatchPipeline.run →
  * records + not-found, with search_strategy populated.
  */
class ReferenceUserSwitchSpec extends graft.SparkSpec {
  import spark.implicits._
  import java.nio.file.{Files, Paths}
  import java.util.zip.{ZipEntry, ZipOutputStream}
  import graft.sources.{FileIngest, GraftConfig}

  test("yaml + xlsx in, records + not-found out") {
    val dir = Files.createTempDirectory("graft-e2e").toString
    // the reference's config.yaml shape, pointing at a named sheet
    Files.writeString(Paths.get(dir, "config.yaml"),
      """input:
        |  company_column: "company_name"
        |  reg_column: "reg"
        |  sheet: "Companies"
        |search:
        |  similarity_threshold: 0.5
        |""".stripMargin)
    val cfg = GraftConfig.fromFile(s"$dir/config.yaml")

    // a two-sheet workbook: a decoy first sheet + the company list
    val workbook =
      """<?xml version="1.0"?><workbook><sheets>""" +
        """<sheet name="Notes" sheetId="1" r:id="rId1"/>""" +
        """<sheet name="Companies" sheetId="2" r:id="rId2"/>""" +
        """</sheets></workbook>"""
    val rels =
      """<?xml version="1.0"?><Relationships>""" +
        """<Relationship Id="rId1" Type="w" Target="worksheets/sheet1.xml"/>""" +
        """<Relationship Id="rId2" Type="w" Target="worksheets/sheet2.xml"/>""" +
        """</Relationships>"""
    def row(r: Int, a: String, b: String) =
      s"""<row r="$r"><c r="A$r" t="inlineStr"><is><t>$a</t></is></c>""" +
        s"""<c r="B$r" t="inlineStr"><is><t>$b</t></is></c></row>"""
    val sheet1 =
      """<?xml version="1.0"?><worksheet><sheetData>""" +
        row(1, "note", "ignore me") + """</sheetData></worksheet>"""
    val sheet2 =
      """<?xml version="1.0"?><worksheet><sheetData>""" +
        row(1, "company_name", "reg") +
        row(2, "บริษัท เอบีซี จำกัด", "0101010101010") +
        row(3, "บริษัท สยามเทรด จำกัด", "") +
        row(4, "บริษัท หายสาบสูญ จำกัด", "") +
        """</sheetData></worksheet>"""
    val xlsx = s"$dir/companies.xlsx"
    val z = new ZipOutputStream(Files.newOutputStream(Paths.get(xlsx)))
    try for ((n, c) <- Seq("xl/workbook.xml" -> workbook,
        "xl/_rels/workbook.xml.rels" -> rels,
        "xl/worksheets/sheet1.xml" -> sheet1,
        "xl/worksheets/sheet2.xml" -> sheet2)) {
      z.putNextEntry(new ZipEntry(n)); z.write(c.getBytes("UTF-8")); z.closeEntry()
    } finally z.close()

    val companies = FileIngest.auto(spark, xlsx, cfg)
    assert(companies.columns.toSeq == Seq("company_name", "reg"))

    val registry = Seq(
      ("0101010101010", "บริษัท เอบีซี จำกัด"),
      ("0202020202020", "บริษัท สยามเทรด จำกัด"))
      .toDF("reg_id", "reg_name")
    val financials = Seq(
      ("0101010101010", 2566, 100.0),
      ("0202020202020", 2566, 200.0))
      .toDF("reg_id", "year", "total_revenue")

    val r = EntityMatchPipeline.run(companies, registry, financials, cfg,
      idCol = "reg_id", registryNameCol = "reg_name", yearCol = "year",
      measureCols = Seq("total_revenue"),
      prefixes = ThaiEntities.allPrefixes,
      suffixes = ThaiEntities.legalSuffixes,
      fillers = ThaiEntities.fillerPatterns,
      partnershipPrefixes = ThaiEntities.partnershipPrefixes,
      partnershipShortPrefix = ThaiEntities.partnershipShortPrefix,
      publicMarker = ThaiEntities.publicMarker,
      noSpaceReplacements = ThaiEntities.noSpaceReplacements)

    val recs = r.records
      .select("name", "match_type", "search_strategy", "value")
      .as[(String, String, String, Double)].collect().toSet
    assert(recs == Set(
      ("บริษัท เอบีซี จำกัด", "existing", "", 100.0),
      ("บริษัท สยามเทรด จำกัด", "exact", "1", 200.0)))
    val nf = r.notFound.select("name", "reason").as[(String, String)].collect().toSeq
    assert(nf == Seq(("บริษัท หายสาบสูญ จำกัด", "No search results")))
  }

  test("yaml + legacy .xls in, records + not-found out (BIFF8 leg)") {
    import graft.sources.XlsFixture
    val dir = Files.createTempDirectory("graft-e2e-xls").toString
    Files.writeString(Paths.get(dir, "config.yaml"),
      """input:
        |  company_column: "company_name"
        |  reg_column: "reg"
        |  sheet: "Companies"
        |search:
        |  similarity_threshold: 0.5
        |""".stripMargin)
    val cfg = GraftConfig.fromFile(s"$dir/config.yaml")

    // the reference user's OTHER artifact: the same company list as a
    // legacy BIFF8 workbook, decoy first sheet, Thai names in the SST
    val sst = Seq(("note", false), ("ignore me", false),
      ("company_name", false), ("reg", false),
      ("บริษัท เอบีซี จำกัด", true), ("0101010101010", false),
      ("บริษัท สยามเทรด จำกัด", true), ("บริษัท หายสาบสูญ จำกัด", true))
    val notes = Seq(XlsFixture.labelSst(0, 0, 0), XlsFixture.labelSst(0, 1, 1))
    val comps = Seq(
      XlsFixture.labelSst(0, 0, 2), XlsFixture.labelSst(0, 1, 3),
      XlsFixture.labelSst(1, 0, 4), XlsFixture.labelSst(1, 1, 5),
      XlsFixture.labelSst(2, 0, 6),
      XlsFixture.labelSst(3, 0, 7))
    val stream = XlsFixture.workbookStream(
      Seq("Notes" -> notes, "Companies" -> comps), sst)
    val xls = XlsFixture.write(Paths.get(dir), "companies.xls",
      XlsFixture.cfb(stream))

    val companies = FileIngest.auto(spark, xls, cfg)
    assert(companies.columns.toSeq == Seq("company_name", "reg"))

    val registry = Seq(
      ("0101010101010", "บริษัท เอบีซี จำกัด"),
      ("0202020202020", "บริษัท สยามเทรด จำกัด"))
      .toDF("reg_id", "reg_name")
    val financials = Seq(
      ("0101010101010", 2566, 100.0),
      ("0202020202020", 2566, 200.0))
      .toDF("reg_id", "year", "total_revenue")

    val r = EntityMatchPipeline.run(companies, registry, financials, cfg,
      idCol = "reg_id", registryNameCol = "reg_name", yearCol = "year",
      measureCols = Seq("total_revenue"),
      prefixes = ThaiEntities.allPrefixes,
      suffixes = ThaiEntities.legalSuffixes,
      fillers = ThaiEntities.fillerPatterns,
      partnershipPrefixes = ThaiEntities.partnershipPrefixes,
      partnershipShortPrefix = ThaiEntities.partnershipShortPrefix,
      publicMarker = ThaiEntities.publicMarker,
      noSpaceReplacements = ThaiEntities.noSpaceReplacements)

    val recs = r.records
      .select("name", "match_type", "search_strategy", "value")
      .as[(String, String, String, Double)].collect().toSet
    assert(recs == Set(
      ("บริษัท เอบีซี จำกัด", "existing", "", 100.0),
      ("บริษัท สยามเทรด จำกัด", "exact", "1", 200.0)))
    val nf = r.notFound.select("name", "reason").as[(String, String)].collect().toSeq
    assert(nf == Seq(("บริษัท หายสาบสูญ จำกัด", "No search results")))
  }
}
