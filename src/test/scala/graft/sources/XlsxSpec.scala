package graft.sources

import java.nio.file.{Files, Paths}
import java.util.zip.{ZipEntry, ZipOutputStream}

import graft.SparkSpec

class XlsxSpec extends SparkSpec {
  import spark.implicits._

  /** Hand-built minimal workbook: shared strings (incl. a rich-text
    * run), an inline string with an escaped entity, a number, and a
    * sparse row with a missing cell. */
  private def writeWorkbook(dir: String, name: String): String = {
    val shared =
      """<?xml version="1.0"?><sst><si><t>company_name</t></si>""" +
        """<si><t>reg</t></si><si><r><t>Acme </t></r><r><t>Ltd</t></r></si></sst>"""
    val sheet =
      """<?xml version="1.0"?><worksheet><sheetData>""" +
        """<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>""" +
        """<row r="2"><c r="A2" t="s"><v>2</v></c><c r="B2"><v>123.5</v></c></row>""" +
        """<row r="3"><c r="A3" t="inlineStr"><is><t>Beta &amp; Co</t></is></c></row>""" +
        """<row r="4"><c r="B4"><v>7</v></c></row>""" +
        """</sheetData></worksheet>"""
    val path = s"$dir/$name"
    val z = new ZipOutputStream(Files.newOutputStream(Paths.get(path)))
    try {
      for ((n, content) <- Seq("xl/sharedStrings.xml" -> shared,
          "xl/worksheets/sheet1.xml" -> sheet)) {
        z.putNextEntry(new ZipEntry(n))
        z.write(content.getBytes("UTF-8"))
        z.closeEntry()
      }
    } finally z.close()
    path
  }

  test("rows parses shared strings, rich-text runs, inline strings, numbers, sparse cells") {
    val dir = Files.createTempDirectory("graft-xlsx").toString
    val path = writeWorkbook(dir, "companies.xlsx")
    val rows = Xlsx.rows(spark, path)
      .select("row_idx", "cells").as[(Int, Seq[String])].collect().sortBy(_._1)
    assert(rows.toSeq == Seq(
      (0, Seq("company_name", "reg")),
      (1, Seq("Acme Ltd", "123.5")),
      (2, Seq("Beta & Co")),
      (3, Seq("", "7")))) // missing A4 materialized as empty
  }

  test("table promotes the header row and pads short rows") {
    val dir = Files.createTempDirectory("graft-xlsx2").toString
    writeWorkbook(dir, "companies.xlsx")
    val t = Xlsx.table(spark, s"$dir/companies.xlsx")
    assert(t.columns.toSeq == Seq("company_name", "reg"))
    val got = t.as[(String, String)].collect().toSet
    assert(got == Set(("Acme Ltd", "123.5"), ("Beta & Co", ""), ("", "7")))
  }

  /** Two-sheet workbook with workbook.xml + rels indirection; the
    * rels deliberately map rId2 to a NON-obvious filename (data2.xml)
    * so a name lookup that guesses sheetN.xml paths would fail. */
  private def writeTwoSheetWorkbook(dir: String, name: String): String = {
    val workbook =
      """<?xml version="1.0"?><workbook><sheets>""" +
        """<sheet name="Summary" sheetId="1" r:id="rId1"/>""" +
        """<sheet name="Comp &amp; List" sheetId="2" r:id="rId2"/>""" +
        """</sheets></workbook>"""
    val rels =
      """<?xml version="1.0"?><Relationships>""" +
        """<Relationship Id="rId1" Type="w" Target="worksheets/sheet1.xml"/>""" +
        """<Relationship Id="rId2" Type="w" Target="worksheets/data2.xml"/>""" +
        """</Relationships>"""
    val sheet1 =
      """<?xml version="1.0"?><worksheet><sheetData>""" +
        """<row r="1"><c r="A1" t="inlineStr"><is><t>summary</t></is></c></row>""" +
        """</sheetData></worksheet>"""
    val sheet2 =
      """<?xml version="1.0"?><worksheet><sheetData>""" +
        """<row r="1"><c r="A1" t="inlineStr"><is><t>company_name</t></is></c></row>""" +
        """<row r="2"><c r="A2" t="inlineStr"><is><t>Acme Ltd</t></is></c></row>""" +
        """</sheetData></worksheet>"""
    val path = s"$dir/$name"
    val z = new ZipOutputStream(Files.newOutputStream(Paths.get(path)))
    try {
      for ((n, content) <- Seq(
          "xl/worksheets/sheet1.xml" -> sheet1,
          "xl/worksheets/data2.xml" -> sheet2,
          "xl/workbook.xml" -> workbook,
          "xl/_rels/workbook.xml.rels" -> rels)) {
        z.putNextEntry(new ZipEntry(n))
        z.write(content.getBytes("UTF-8"))
        z.closeEntry()
      }
    } finally z.close()
    path
  }

  test("sheet selection by NAME resolves via workbook.xml + rels, incl. escaped names") {
    val dir = Files.createTempDirectory("graft-xlsx3").toString
    val path = writeTwoSheetWorkbook(dir, "multi.xlsx")
    val t = Xlsx.table(spark, path, sheetName = "Comp & List")
    assert(t.columns.toSeq == Seq("company_name"))
    assert(t.as[String].collect().toSeq == Seq("Acme Ltd"))
    // index addressing still works and hits the OTHER sheet
    val first = Xlsx.rows(spark, path, sheet = 1)
      .select("cells").as[Seq[String]].collect()
    assert(first.toSeq == Seq(Seq("summary")))
  }

  test("sheets lists the workbook inventory; unknown names throw with the inventory") {
    val dir = Files.createTempDirectory("graft-xlsx4").toString
    val path = writeTwoSheetWorkbook(dir, "multi.xlsx")
    val inv = Xlsx.sheets(spark, path)
      .select("sheet_idx", "sheet_name").as[(Int, String)].collect().toSeq.sorted
    assert(inv == Seq((1, "Summary"), (2, "Comp & List")).sorted)
    val e = intercept[org.apache.spark.SparkException](
      Xlsx.rows(spark, path, sheetName = "Nope").collect())
    assert(e.getMessage.contains("Summary") || e.getCause.getMessage.contains("Summary"))
  }

  test("colIndex decodes multi-letter references") {
    assert(Xlsx.colIndex("A1") == 0)
    assert(Xlsx.colIndex("Z9") == 25)
    assert(Xlsx.colIndex("AA10") == 26)
    assert(Xlsx.colIndex("AB3") == 27)
  }
}

class IngestIntegrationSpec extends SparkSpec {
  import spark.implicits._

  test("the reference ingestion path runs off a workbook: xlsx -> entities") {
    val dir = java.nio.file.Files.createTempDirectory("graft-xlsx-ing").toString
    val shared =
      """<?xml version="1.0"?><sst><si><t>company_name</t></si><si><t>reg</t></si>""" +
        """<si><t>บริษัท สยาม จำกัด</t></si><si><t>ร้านไม่จด</t></si></sst>"""
    val sheet =
      """<?xml version="1.0"?><worksheet><sheetData>""" +
        """<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>""" +
        """<row r="2"><c r="A2" t="s"><v>2</v></c><c r="B2" t="inlineStr"><is><t>0123456789012</t></is></c></row>""" +
        """<row r="3"><c r="A3" t="s"><v>2</v></c></row>""" +
        """<row r="4"><c r="A4" t="s"><v>3</v></c></row>""" +
        """</sheetData></worksheet>"""
    val path = s"$dir/companies.xlsx"
    val z = new java.util.zip.ZipOutputStream(java.nio.file.Files.newOutputStream(java.nio.file.Paths.get(path)))
    try {
      for ((n, content) <- Seq("xl/sharedStrings.xml" -> shared, "xl/worksheets/sheet1.xml" -> sheet)) {
        z.putNextEntry(new java.util.zip.ZipEntry(n)); z.write(content.getBytes("UTF-8")); z.closeEntry()
      }
    } finally z.close()
    val table = Xlsx.table(spark, path)
    val ingested = FileIngest.entities(table, "company_name", Some("reg"),
      graft.functions.ThaiEntities.entityMarkers,
      graft.functions.ThaiEntities.regNumberPattern)
      .as[(String, Option[String])].collect().toMap
    // duplicate "บริษัท สยาม จำกัด" rows collapse, keeping the reg id;
    // the non-entity row ("ร้านไม่จด", no จำกัด/มหาชน marker) is filtered
    assert(ingested == Map("บริษัท สยาม จำกัด" -> Some("0123456789012")))
  }

  test("jsonLines reads one record per line") {
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "in.jsonl"),
      """{"company_name":"Acme Ltd","reg":"0123456789012"}
        |{"company_name":"Beta Ltd"}
        |""".stripMargin)
    val df = FileIngest.jsonLines(spark, s"$dir/in.jsonl")
    assert(df.count() == 2)
    assert(df.columns.toSet == Set("company_name", "reg"))
  }
}

class RobustnessSpec extends SparkSpec {

  test("Xlsx.table without rows raises a clear error") {
    val dir = java.nio.file.Files.createTempDirectory("graft-xlsx-bad").toString
    val path = s"$dir/empty.xlsx"
    val z = new java.util.zip.ZipOutputStream(
      java.nio.file.Files.newOutputStream(java.nio.file.Paths.get(path)))
    try {
      z.putNextEntry(new java.util.zip.ZipEntry("xl/worksheets/sheet1.xml"))
      z.write("""<?xml version="1.0"?><worksheet><sheetData/></worksheet>"""
        .getBytes("UTF-8"))
      z.closeEntry()
    } finally z.close()
    val e = intercept[IllegalArgumentException](Xlsx.table(spark, path))
    assert(e.getMessage.contains("no rows"))
  }

  test("FileIngest.auto dispatches by extension; non-OLE2 .xls fails with the magic hint") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-auto").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "c.csv"),
      "company_name,reg\nAcme Ltd,0123456789012\n")
    val csv = FileIngest.auto(spark, s"$dir/c.csv", GraftConfig())
    assert(csv.columns.toSeq == Seq("company_name", "reg") && csv.count() == 1)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "t.txt"),
      "Acme Ltd\n\nBeta Co\n")
    val txt = FileIngest.auto(spark, s"$dir/t.txt", GraftConfig())
    assert(txt.columns.toSeq == Seq("company_name") && txt.count() == 2)
    // .xls now dispatches to the Xls BIFF8 reader (XlsSpec covers real
    // workbooks); junk bytes must still fail actionably — the CFB
    // magic check throws inside the read task, so the driver sees it
    // wrapped in a SparkException chain
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "old.xls"), Array[Byte](1))
    val e = intercept[Exception](
      FileIngest.auto(spark, s"$dir/old.xls", GraftConfig()).collect())
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("bad magic")), s"got: ${messages(e)}")
  }

  test("GraftConfig parses max_token_freq and keeps the capped default") {
    assert(GraftConfig.fromJson("{}").maxTokenFreq.contains(100000L))
    assert(GraftConfig.fromJson("""{"max_token_freq": 500}""").maxTokenFreq.contains(500L))
    assert(GraftConfig.fromJson("""{"max_token_freq": null}""").maxTokenFreq.isEmpty)
  }

  test("minhashLsh rejects band configs that would drop components") {
    import spark.implicits._
    val df = Seq((1L, "a b c d")).toDF("id", "text")
    val e = intercept[IllegalArgumentException](
      graft.operators.Dedup.minhashLsh(df, "id", "text", numHashes = 6, rowsPerBand = 4))
    assert(e.getMessage.contains("divide evenly"))
  }
}
