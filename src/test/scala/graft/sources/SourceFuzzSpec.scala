package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.FuzzHarness

/** Seeded hostile-input sweeps over the binary SOURCE parsers (PDF,
  * Snappy, Avro, WARC, xls CFB, xlsx zip): the loud-failure contract
  * under truncation / bit flips / garbage, per FuzzHarness. */
class SourceFuzzSpec extends AnyFunSuite {

  test("PDF extract survives the hostile sweep (classic + xref-stream)") {
    val classic = Pdf.build(Seq("BT (alpha) Tj 0 -14 Td (beta) Tj ET",
      "BT [ (a) -50 (b) ] TJ ET"), deflate = true)
    FuzzHarness.assertClean(
      FuzzHarness.fuzz("pdf", classic, Pdf.extract, seed = 1611))
    val modern = Pdf.buildXref(Seq("BT (gamma) Tj ET"), deflate = true)
    FuzzHarness.assertClean(
      FuzzHarness.fuzz("pdf-xrefstm", modern, Pdf.extract, seed = 1612))
    val chained = Pdf.build(Seq("BT (delta chained) Tj ET"),
      filter = "a85flate")
    FuzzHarness.assertClean(
      FuzzHarness.fuzz("pdf-a85", chained, Pdf.extract, seed = 1624))
  }

  test("PDF with remapped fonts survives the hostile sweep") {
    val pdf = Pdf.buildWithFonts(
      "BT /F1 12 Tf (ab 12) Tj T* /F2 12 Tf (cd 34) Tj ET",
      Seq(97 -> "a", 98 -> "b", 32 -> "space", 49 -> "one", 50 -> "two"),
      "1 beginbfrange\n<61> <7a> <0041>\nendbfrange")
    FuzzHarness.assertClean(
      FuzzHarness.fuzz("pdf-fonts", pdf, Pdf.extract, seed = 1613))
  }

  test("Snappy uncompress survives the hostile sweep") {
    val raw = ("the quick brown fox jumps over the lazy dog, " * 20)
      .getBytes("US-ASCII")
    FuzzHarness.assertClean(FuzzHarness.fuzz("snappy",
      Snappy.compress(raw), Snappy.uncompress, seed = 1614))
  }

  test("Avro container parse survives the hostile sweep (all codecs)") {
    val schema = """{"type":"record","name":"r","fields":[
      {"name":"a","type":"long"},{"name":"b","type":"string"}]}"""
    val rows = (0 until 8).map(i =>
      Array[Any](i.toLong, s"row-$i-payload")).toSeq
    for ((codec, seed) <- Seq("null" -> 1615, "deflate" -> 1616,
        "snappy" -> 1617)) {
      FuzzHarness.assertClean(FuzzHarness.fuzz(s"avro-$codec",
        Avro.encodeWithCodec(schema, rows, codec),
        Avro.parseContainer, seed = seed))
    }
  }

  test("WARC parse survives the hostile sweep (plain + gzip)") {
    def rec(tpe: String, payload: Array[Byte]): Array[Byte] =
      (s"WARC/1.0\r\nWARC-Type: $tpe\r\n" +
        "WARC-Record-ID: <urn:x:1>\r\n" +
        "WARC-Date: 2024-01-01T00:00:00Z\r\n" +
        s"Content-Length: ${payload.length}\r\n\r\n").getBytes("UTF-8") ++
        payload ++ "\r\n\r\n".getBytes("UTF-8")
    val plain = rec("warcinfo", "software: graft\r\n".getBytes("UTF-8")) ++
      rec("conversion", "extracted text body".getBytes("UTF-8"))
    FuzzHarness.assertClean(
      FuzzHarness.fuzz("warc", plain, Warc.parseRecords, seed = 1618))
    val gz = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(plain); g.close()
      bos.toByteArray
    }
    FuzzHarness.assertClean(
      FuzzHarness.fuzz("warc-gz", gz, Warc.parseRecords, seed = 1619))
  }

  test("xls CFB parse survives the hostile sweep") {
    val stream = XlsFixture.workbookStream(
      Seq("Data" -> Seq(XlsFixture.labelSst(0, 0, 0),
        XlsFixture.number(1, 0, 2.5),
        XlsFixture.rkCell(1, 1, 0x00000002))),
      Seq(("hdr", false)))
    FuzzHarness.assertClean(FuzzHarness.fuzz("xls",
      XlsFixture.cfb(stream), b => Xls.parseWorkbook(b, Left(1)),
      seed = 1620))
  }

  test("xlsx zip parse survives the hostile sweep") {
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    val shared = """<sst><si><t>name</t></si><si><t>acme</t></si></sst>"""
    val sheet = """<worksheet><sheetData>""" +
      """<row r="1"><c r="A1" t="s"><v>0</v></c></row>""" +
      """<row r="2"><c r="A2" t="s"><v>1</v></c><c r="B2"><v>7</v></c></row>""" +
      """</sheetData></worksheet>"""
    for ((n, content) <- Seq("xl/sharedStrings.xml" -> shared,
        "xl/worksheets/sheet1.xml" -> sheet)) {
      z.putNextEntry(new java.util.zip.ZipEntry(n))
      z.write(content.getBytes("UTF-8"))
      z.closeEntry()
    }
    z.close()
    FuzzHarness.assertClean(FuzzHarness.fuzz("xlsx",
      bos.toByteArray, b => Xlsx.parseWorkbook(b, Left(1)), seed = 1621))
  }
}
