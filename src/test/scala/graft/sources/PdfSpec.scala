package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PdfSpec extends AnyFunSuite {

  private def onePage(content: String, deflate: Boolean = false): String = {
    val pages = Pdf.extract(Pdf.build(Seq(content), deflate))
    assert(pages.length == 1)
    pages.head.text
  }

  test("Tj/TJ/quote/Td text assembly round-trips, raw and FlateDecode") {
    val content = "BT /F1 12 Tf 50 700 Td (Hello world) Tj " +
      "0 -14 Td (second line) Tj [ (ker) -250 (ned) ] TJ T* (third) ' ET"
    for (deflate <- Seq(false, true)) {
      assert(onePage(content, deflate) ==
        "Hello world\nsecond linekerned\nthird", s"deflate=$deflate")
    }
  }

  test("literal-string escapes and hex strings decode exactly") {
    assert(onePage("""BT (par \(x\) back \\ nl \n oct \101) Tj ET""") ==
      "par (x) back \\ nl \n oct A")
    // hex string: "Hi!" = 48 69 21, odd-digit padding exercised via 5 0
    assert(onePage("BT <486921> Tj <50> Tj ET") == "Hi!P")
    // nested balanced parens need no escape
    assert(onePage("BT (a (nested) b) Tj ET") == "a (nested) b")
  }

  test("multi-page page-tree walk keeps page order; empty page allowed") {
    val pages = Pdf.extract(Pdf.build(Seq(
      "BT (page one) Tj ET", "", "BT (page three) Tj ET")))
    assert(pages.map(_.page) == Seq(1, 2, 3))
    assert(pages.map(_.text) == Seq("page one", "", "page three"))
  }

  test("incremental update: /Prev chain resolves, newest xref wins") {
    // build, then append an update that REPLACES the content object
    // (object 5) and chains to the original xref via /Prev
    val base = Pdf.build(Seq("BT (old text) Tj ET"))
    val origXref = new String(base, "ISO-8859-1")
    val xrefAt = origXref.lastIndexOf("startxref")
    val origOff = origXref.substring(xrefAt + 9).trim.takeWhile(_.isDigit)
    val upd = new java.io.ByteArrayOutputStream()
    upd.write(base)
    val newObjAt = upd.size()
    val body = "BT (new text) Tj ET"
    upd.write((s"5 0 obj\n<< /Length ${body.length} >>\nstream\n$body" +
      "\nendstream\nendobj\n").getBytes("ISO-8859-1"))
    val newXrefAt = upd.size()
    upd.write((s"xref\n5 1\n" + f"$newObjAt%010d ${0}%05d n \n" +
      s"trailer\n<< /Size 6 /Root 1 0 R /Prev $origOff >>\n" +
      s"startxref\n$newXrefAt\n%%EOF\n").getBytes("ISO-8859-1"))
    val pages = Pdf.extract(upd.toByteArray)
    assert(pages.head.text == "new text")
  }

  test("contract violations fail loudly, naming the offender") {
    val ok = Pdf.build(Seq("BT (x) Tj ET"))
    def msgOf(b: Array[Byte]): String =
      intercept[IllegalArgumentException](Pdf.extract(b)).getMessage
    assert(msgOf(ok.drop(4)).contains("%PDF"))
    assert(msgOf(ok.dropRight(30)).contains("startxref"))
    // encrypted: trailer gains /Encrypt
    val s = new String(ok, "ISO-8859-1")
    val enc = s.replace("/Root 1 0 R", "/Root 1 0 R /Encrypt 9 0 R")
    // splice breaks the startxref offset by 0 bytes (same-length edit
    // not possible here) — rebuild the tail instead
    assert(enc.length != s.length)
    val encBytes = (s.substring(0, s.lastIndexOf("trailer")) +
      "trailer\n<< /Size 6 /Root 1 0 R /Encrypt 9 0 R >>\n" +
      s"startxref\n${s.lastIndexOf("xref\n0")}\n%%EOF\n")
      .getBytes("ISO-8859-1")
    assert(msgOf(encBytes).contains("encrypted"))
    // unsupported filter: the patch sits INSIDE object 5's dict, after
    // every xref-relevant offset (objects 1..5 all start before it and
    // the xref table re-read happens from the ORIGINAL trailer tail,
    // which still parses because the insertion only shifts the trailer
    // — so rebuild the tail with the original xref offset instead
    val insertAt = s.indexOf(" >>\nstream")
    val origXrefOff = s.lastIndexOf("xref\n0")
    val bad = (s.substring(0, insertAt) + " /Filter /JBIG2Decode" +
      s.substring(insertAt, origXrefOff)).getBytes("ISO-8859-1") ++
      (s.substring(origXrefOff).replaceFirst(
        "startxref\n\\d+",
        s"startxref\n${origXrefOff + 21}")).getBytes("ISO-8859-1")
    assert(msgOf(bad).contains("JBIG2Decode"))
    // cross-reference stream: startxref pointing at an object header
    val objAt = s.indexOf("5 0 obj")
    val xrefStream = (s.substring(0, s.lastIndexOf("startxref")) +
      s"startxref\n$objAt\n%%EOF\n").getBytes("ISO-8859-1")
    assert(msgOf(xrefStream).contains("cross-reference stream"))
  }

  test("escape() round-trips through a literal string") {
    val nasty = "a(b)c\\d\ne"
    assert(onePage(s"BT (${Pdf.escape(nasty)}) Tj ET") == nasty)
  }

  // ------------------------- round 16: xref streams / ObjStm / fonts

  test("xref-stream PDF: ObjStm lookup + predictor rows round-trip") {
    // buildXref puts catalog/pages/font/page dicts in one /ObjStm
    // (type-2 entries) and the xref in a /Type /XRef stream with
    // /W [1 4 2], explicit /Index and PNG predictor 12 — extraction
    // equal to the classic container proves every new leg at once
    val contents = Seq("BT (xs one) Tj 0 -14 Td (more) Tj ET",
      "", "BT [ (a) -50 (b) ] TJ (tail) ' ET")
    for (deflate <- Seq(false, true)) {
      val classic = Pdf.extract(Pdf.build(contents, deflate))
      val modern = Pdf.extract(Pdf.buildXref(contents, deflate))
      assert(modern == classic, s"deflate=$deflate")
      assert(modern.map(_.text) == Seq("xs one\nmore", "", "ab\ntail"))
    }
  }

  test("free xref entry shadows an older in-use entry (no resurrection)") {
    // incremental update marks the content object FREE: the newer 'f'
    // entry must win over the original 'n' entry, failing loudly
    // instead of resurrecting the deleted object
    val base = Pdf.build(Seq("BT (doomed) Tj ET"))
    val s = new String(base, "ISO-8859-1")
    val origOff = s.substring(s.lastIndexOf("startxref") + 9)
      .trim.takeWhile(_.isDigit)
    val upd = new java.io.ByteArrayOutputStream()
    upd.write(base)
    val newXrefAt = upd.size()
    upd.write((s"xref\n5 1\n" + f"${0}%010d ${1}%05d f \n" +
      s"trailer\n<< /Size 6 /Root 1 0 R /Prev $origOff >>\n" +
      s"startxref\n$newXrefAt\n%%EOF\n").getBytes("ISO-8859-1"))
    val e = intercept[IllegalArgumentException](Pdf.extract(upd.toByteArray))
    assert(e.getMessage.contains("free"))
  }

  test("cyclic xref /Prev chain fails loudly instead of looping") {
    val base = Pdf.build(Seq("BT (x) Tj ET"))
    val upd = new java.io.ByteArrayOutputStream()
    upd.write(base)
    val newXrefAt = upd.size()
    // the appended xref's trailer /Prev points at ITSELF
    upd.write((s"xref\n0 0\ntrailer\n" +
      s"<< /Size 6 /Root 1 0 R /Prev $newXrefAt >>\n" +
      s"startxref\n$newXrefAt\n%%EOF\n").getBytes("ISO-8859-1"))
    val e = intercept[IllegalArgumentException](Pdf.extract(upd.toByteArray))
    assert(e.getMessage.contains("cyclic xref /Prev chain"))
  }

  test("cyclic page tree fails loudly instead of overflowing") {
    // /Kids [ 4 0 R ] → [ 2 0 R ]: the Pages node points at itself;
    // same-length splice keeps every xref offset valid
    val base = new String(Pdf.build(Seq("BT (x) Tj ET")), "ISO-8859-1")
    assert(base.contains("/Kids [ 4 0 R ]"))
    val cyc = base.replace("/Kids [ 4 0 R ]", "/Kids [ 2 0 R ]")
      .getBytes("ISO-8859-1")
    val e = intercept[IllegalArgumentException](Pdf.extract(cyc))
    assert(e.getMessage.contains("cyclic page tree"))
  }

  test("TIFF predictor 2 fails loudly by name") {
    val modern = new String(Pdf.buildXref(Seq("BT (x) Tj ET")),
      "ISO-8859-1")
    // same-length splice: /Predictor 12 → /Predictor 02
    val bad = modern.replace("/Predictor 12", "/Predictor 02")
      .getBytes("ISO-8859-1")
    val e = intercept[IllegalArgumentException](Pdf.extract(bad))
    assert(e.getMessage.contains("TIFF predictor 2"))
  }

  test("ASCIIHex / ASCII85 filters and the a85+flate chain round-trip") {
    val content = "BT (chain me \\(now\\)) Tj 0 -14 Td (line two) Tj ET"
    val expect = "chain me (now)\nline two"
    for (f <- Seq("ahex", "a85", "a85flate")) {
      assert(Pdf.extract(Pdf.build(Seq(content), filter = f))
        .head.text == expect, s"filter=$f")
      assert(Pdf.extract(Pdf.buildXref(Seq(content), filter = f))
        .head.text == expect, s"xref filter=$f")
    }
    // the 'z' four-zero shorthand: raw zeros through pure a85
    val zs = "BT (a    b) Tj ET"
    assert(Pdf.extract(Pdf.build(Seq(zs), filter = "a85")).head.text ==
      "a    b")
    // terminator violations fail loudly
    val ok = new String(Pdf.build(Seq(content), filter = "ahex"),
      "ISO-8859-1")
    val noTerm = ok.replaceFirst(">\nendstream", "g\nendstream")
      .getBytes("ISO-8859-1")
    val e = intercept[IllegalArgumentException](Pdf.extract(noTerm))
    assert(e.getMessage.contains("ASCIIHex"))
  }

  test("/Differences font remaps byte codes through AGL glyph names") {
    val target = "meet agent 007 at noon"
    val shifted = target.map(c => (c + 1).toChar)
    val diffs = target.distinct.map(c => (c + 1, Pdf.glyphName(c)))
    val pdf = Pdf.buildWithFonts(
      s"BT /F1 12 Tf (${Pdf.escape(shifted)}) Tj ET", diffs, "")
    assert(Pdf.extract(pdf).head.text == target)
  }

  test("/ToUnicode CMap remaps via bfchar and bfrange (UTF-16BE)") {
    val cmap =
      """2 beginbfrange
        |<61> <7a> <0041>
        |<30> <39> <0030>
        |endbfrange
        |1 beginbfchar
        |<20> <0020>
        |endbfchar""".stripMargin
    val pdf = Pdf.buildWithFonts(
      "BT /F2 12 Tf (abz 019) Tj ET", Seq.empty, cmap)
    assert(Pdf.extract(pdf).head.text == "ABZ 019")
  }

  test("unknown glyph name and unknown Tf font fail loudly") {
    val pdf = Pdf.buildWithFonts("BT /F1 12 Tf (a) Tj ET",
      Seq(97 -> "notaglyphname"), "")
    val e = intercept[IllegalArgumentException](Pdf.extract(pdf))
    assert(e.getMessage.contains("notaglyphname"))
    val pdf2 = Pdf.buildWithFonts("BT /F9 12 Tf (a) Tj ET",
      Seq(97 -> "b"), "")
    val e2 = intercept[IllegalArgumentException](Pdf.extract(pdf2))
    assert(e2.getMessage.contains("/F9"))
  }
}

/** Pdf.read / Pdf.readStream — the distributed and continuous ingest
  * surfaces (SparkSpec: needs a session). */
class PdfReadSpec extends graft.SparkSpec {
  import spark.implicits._

  private def pdfOf(texts: String*): Array[Byte] =
    Pdf.build(texts.map(t => s"BT (${Pdf.escape(t)}) Tj ET"),
      deflate = texts.length % 2 == 0)

  test("read: every file under the glob becomes (path, page, text) rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft-pdf").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "a.pdf"),
      pdfOf("alpha one", "alpha two"))
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "b.pdf"),
      pdfOf("beta"))
    val got = Pdf.read(spark, s"$dir/*.pdf")
      .select(col("page"), col("text")).as[(Int, String)]
      .collect().toSet
    assert(got == Set((1, "alpha one"), (2, "alpha two"), (1, "beta")))
  }

  test("readStream: files extract as they land (stream ≡ batch read)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-pdf-s").toString
    val q = Pdf.readStream(spark, s"$dir/*.pdf")
      .writeStream.format("memory").queryName("pdfstream")
      .outputMode("append").start()
    try {
      java.nio.file.Files.write(java.nio.file.Paths.get(dir, "one.pdf"),
        pdfOf("first doc"))
      q.processAllAvailable()
      java.nio.file.Files.write(java.nio.file.Paths.get(dir, "two.pdf"),
        pdfOf("second doc", "second doc page two"))
      q.processAllAvailable()
      val streamed = spark.table("pdfstream")
        .select(col("page"), col("text")).as[(Int, String)].collect().toSet
      val batch = Pdf.read(spark, s"$dir/*.pdf")
        .select(col("page"), col("text")).as[(Int, String)].collect().toSet
      assert(streamed == batch)
      assert(streamed == Set((1, "first doc"), (1, "second doc"),
        (2, "second doc page two")))
    } finally q.stop()
  }
}
