package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.file.{Files, Path}

import graft.SparkSpec

/** Synthesized OLE2/BIFF8 fixtures (no Excel, no external libs): a
  * little-endian byte builder assembles the workbook stream record by
  * record and wraps it in a hand-built CFB container — once with the
  * stream padded past the 4096-byte mini cutoff (regular FAT chain)
  * and once tiny (ministream + miniFAT path). */
object XlsFixture {

  private class B {
    val out = new ByteArrayOutputStream()
    def u8(v: Int): B = { out.write(v & 0xFF); this }
    def u16(v: Int): B = { u8(v); u8(v >> 8); this }
    def i32(v: Int): B = { u16(v); u16(v >> 16); this }
    def f64(v: Double): B = {
      val bits = java.lang.Double.doubleToLongBits(v)
      i32((bits & 0xFFFFFFFFL).toInt); i32((bits >>> 32).toInt)
    }
    def ascii(s: String): B = { out.write(s.getBytes("ISO-8859-1")); this }
    def utf16(s: String): B = { out.write(s.getBytes("UTF-16LE")); this }
    def raw(b: Array[Byte]): B = { out.write(b); this }
    def pad(n: Int): B = { out.write(new Array[Byte](n)); this }
    def bytes: Array[Byte] = out.toByteArray
  }

  private def rec(id: Int, payload: Array[Byte]): Array[Byte] =
    new B().u16(id).u16(payload.length).raw(payload).bytes

  private def bof(dt: Int): Array[Byte] =
    rec(0x0809, new B().u16(0x0600).u16(dt).u16(0).u16(0).i32(0).i32(0).bytes)

  private val eof = rec(0x000A, Array.empty)

  /** ShortXLUnicodeString (BOUNDSHEET name), compressed. */
  private def shortStr(s: String): Array[Byte] =
    new B().u8(s.length).u8(0).ascii(s).bytes

  /** SST entry; `wide=true` exercises the fHighByte UTF-16 path. */
  private def sstStr(s: String, wide: Boolean): Array[Byte] =
    if (wide) new B().u16(s.length).u8(1).utf16(s).bytes
    else new B().u16(s.length).u8(0).ascii(s).bytes

  def labelSst(row: Int, col: Int, isst: Int): Array[Byte] =
    rec(0x00FD, new B().u16(row).u16(col).u16(0).i32(isst).bytes)
  def number(row: Int, col: Int, v: Double): Array[Byte] =
    rec(0x0203, new B().u16(row).u16(col).u16(0).f64(v).bytes)
  def rkCell(row: Int, col: Int, rk: Int): Array[Byte] =
    rec(0x027E, new B().u16(row).u16(col).u16(0).i32(rk).bytes)
  def mulRk(row: Int, colFirst: Int, rks: Seq[Int]): Array[Byte] = {
    val b = new B().u16(row).u16(colFirst)
    rks.foreach(rk => b.u16(0).i32(rk))
    b.u16(colFirst + rks.size - 1)
    rec(0x00BD, b.bytes)
  }
  def boolErr(row: Int, col: Int, v: Boolean): Array[Byte] =
    rec(0x0205, new B().u16(row).u16(col).u16(0).u8(if (v) 1 else 0).u8(0).bytes)

  /** FORMULA with a cached NUMERIC result (empty rgce — readers use
    * the cached value). */
  def formulaNum(row: Int, col: Int, v: Double): Array[Byte] =
    rec(0x0006, new B().u16(row).u16(col).u16(0).f64(v)
      .u16(0).i32(0).u16(0).bytes)

  /** FORMULA whose cached result is a STRING (the 0xFFFF-tagged
    * trailer) — readers without STRING-record support skip it. */
  def formulaStr(row: Int, col: Int): Array[Byte] =
    rec(0x0006, new B().u16(row).u16(col).u16(0)
      .u8(0).u8(0).i32(0).u16(0xFFFF)  // string-result tag
      .u16(0).i32(0).u16(0).bytes)

  /** Workbook stream: globals (BOF, BOUNDSHEETs, SST, EOF) + sheet
    * substreams. Two-pass: BOUNDSHEET offsets depend only on fixed
    * record widths, so a measuring pass then a real pass suffice. */
  def workbookStream(sheets: Seq[(String, Seq[Array[Byte]])],
                     sst: Seq[(String, Boolean)]): Array[Byte] = {
    def globals(positions: Seq[Int]): Array[Byte] = {
      val b = new B().raw(bof(0x0005))
      sheets.zip(positions).foreach { case ((nm, _), pos) =>
        b.raw(rec(0x0085, new B().i32(pos).u8(0).u8(0).raw(shortStr(nm)).bytes))
      }
      val sb = new B().i32(sst.length).i32(sst.length)
      sst.foreach { case (s, wide) => sb.raw(sstStr(s, wide)) }
      b.raw(rec(0x00FC, sb.bytes)).raw(eof).bytes
    }
    val sheetBytes = sheets.map { case (_, cells) =>
      new B().raw(bof(0x0010)).raw(cells.reduceOption(_ ++ _).getOrElse(Array.empty))
        .raw(eof).bytes
    }
    val gSize = globals(sheets.map(_ => 0)).length
    val positions = sheetBytes.scanLeft(gSize)(_ + _.length).init
    new B().raw(globals(positions)).raw(sheetBytes.reduce(_ ++ _)).bytes
  }

  /** Workbook stream whose SST spans CONTINUE records: the first
    * payload chunk goes in the SST record (after its 8-byte header),
    * each further chunk in its own CONTINUE — chunks may split a
    * string inside its character data (the continuation must then
    * start with its own grbit byte, per [MS-XLS]). */
  def workbookStreamSplitSst(sheets: Seq[(String, Seq[Array[Byte]])],
                             total: Int,
                             sstChunks: Seq[Array[Byte]]): Array[Byte] = {
    def globals(positions: Seq[Int]): Array[Byte] = {
      val b = new B().raw(bof(0x0005))
      sheets.zip(positions).foreach { case ((nm, _), pos) =>
        b.raw(rec(0x0085, new B().i32(pos).u8(0).u8(0).raw(shortStr(nm)).bytes))
      }
      b.raw(rec(0x00FC, new B().i32(total).i32(total).raw(sstChunks.head).bytes))
      sstChunks.tail.foreach(p => b.raw(rec(0x003C, p)))
      b.raw(eof).bytes
    }
    val sheetBytes = sheets.map { case (_, cells) =>
      new B().raw(bof(0x0010)).raw(cells.reduceOption(_ ++ _).getOrElse(Array.empty))
        .raw(eof).bytes
    }
    val gSize = globals(sheets.map(_ => 0)).length
    val positions = sheetBytes.scanLeft(gSize)(_ + _.length).init
    new B().raw(globals(positions)).raw(sheetBytes.reduce(_ ++ _)).bytes
  }

  /** Raw SST-entry fragments for the split fixtures. */
  def sstEntry(s: String, wide: Boolean): Array[Byte] = sstStr(s, wide)
  def bHeader(cch: Int, flags: Int): Array[Byte] =
    new B().u16(cch).u8(flags).bytes
  def bAscii(s: String): Array[Byte] = new B().ascii(s).bytes
  def bGrbitUtf16(s: String): Array[Byte] = new B().u8(1).utf16(s).bytes
  def bGrbitAscii(s: String): Array[Byte] = new B().u8(0).ascii(s).bytes

  private val EndOfChain = 0xFFFFFFFE
  private val FreeSect = 0xFFFFFFFF
  private val FatSect = 0xFFFFFFFD

  private def dirEntry(name: String, objType: Int, child: Int,
                       start: Int, size: Int): Array[Byte] = {
    val b = new B()
    val nm = name.getBytes("UTF-16LE")
    b.raw(nm).pad(64 - nm.length)
    b.u16(nm.length + 2).u8(objType).u8(1)
    b.i32(-1).i32(-1).i32(child)      // left/right sibling, child
    b.pad(16 + 4 + 8 + 8)              // CLSID, state bits, 2 timestamps -> start @116
    b.i32(start).i32(size).i32(0)
    b.bytes
  }

  /** Wrap `stream` as the `Workbook` entry of a minimal CFB file.
    * size >= 4096 → regular FAT chain; below → ministream+miniFAT. */
  def cfb(stream: Array[Byte]): Array[Byte] = {
    val mini = stream.length < 4096
    def sectors(data: Array[Byte], size: Int): Int = (data.length + size - 1) / size

    val nWb = if (mini) 0 else sectors(stream, 512)
    val miniPadded = if (mini) {
      val n = sectors(stream, 64)
      java.util.Arrays.copyOf(stream, n * 64)
    } else Array.empty[Byte]
    val nMiniStream = if (mini) sectors(miniPadded, 512) else 0
    // sector map: 0=FAT, 1=directory, [2=miniFAT, 3..=ministream] or [2..=workbook]
    val fat = new B()
    fat.i32(FatSect)       // sector 0: the FAT itself
    fat.i32(EndOfChain)    // sector 1: directory (single sector)
    if (mini) {
      fat.i32(EndOfChain)  // sector 2: miniFAT (single sector)
      for (i <- 0 until nMiniStream) // 3..: ministream chain
        fat.i32(if (i == nMiniStream - 1) EndOfChain else 3 + i + 1)
    } else {
      for (i <- 0 until nWb)          // 2..: workbook chain
        fat.i32(if (i == nWb - 1) EndOfChain else 2 + i + 1)
    }
    while (fat.out.size() < 512) fat.i32(FreeSect)

    val dir = new B()
    val rootStart = if (mini) 3 else EndOfChain
    dir.raw(dirEntry("Root Entry", 5, 1, rootStart, miniPadded.length))
    dir.raw(dirEntry("Workbook", 2, -1, if (mini) 0 else 2, stream.length))
    dir.pad(2 * 128)

    val miniFat = new B()
    if (mini) {
      val nMini = sectors(stream, 64)
      for (i <- 0 until nMini)
        miniFat.i32(if (i == nMini - 1) EndOfChain else i + 1)
      while (miniFat.out.size() < 512) miniFat.i32(FreeSect)
    }

    val h = new B()
    h.raw(Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1).map(_.toByte))
    h.pad(16)                           // CLSID
    h.u16(0x003E).u16(0x0003)           // minor/major version
    h.u16(0xFFFE)                       // little-endian marker
    h.u16(9).u16(6)                     // sector / minisector shift
    h.pad(6).i32(0)                     // reserved, dir sector count (v3)
    h.i32(1)                            // FAT sector count
    h.i32(1)                            // first directory sector
    h.i32(0)                            // transaction signature
    h.i32(4096)                         // mini cutoff
    h.i32(if (mini) 2 else EndOfChain)  // first miniFAT sector
    h.i32(if (mini) 1 else 0)           // miniFAT sector count
    h.i32(EndOfChain).i32(0)            // DIFAT chain: none beyond header
    h.i32(0)                            // DIFAT[0] -> FAT sector 0
    for (_ <- 1 until 109) h.i32(FreeSect)

    val body = new B()
    body.raw(h.bytes)
    body.raw(fat.bytes)
    body.raw(dir.bytes)
    if (mini) {
      body.raw(miniFat.bytes)
      body.raw(java.util.Arrays.copyOf(miniPadded, nMiniStream * 512))
    } else {
      body.raw(java.util.Arrays.copyOf(stream, nWb * 512))
    }
    body.bytes
  }

  def write(dir: Path, name: String, bytes: Array[Byte]): String = {
    val f = dir.resolve(name)
    Files.write(f, bytes)
    f.toString
  }
}

class XlsSpec extends SparkSpec {
  import XlsFixture._
  import spark.implicits._

  private val tmp = Files.createTempDirectory("xls-spec")

  // sheet 1: header row + two data rows exercising every cell record
  private val sst = Seq(("name", false), ("qty", false), ("price", false),
    ("widget", false), ("ไทย-กิจการ", true), ("zz-formula", false))
  private val sheet1 = Seq(
    labelSst(0, 0, 0), labelSst(0, 1, 1), labelSst(0, 2, 2),
    labelSst(1, 0, 3), rkCell(1, 1, (123 << 2) | 2), number(1, 2, 2.5),
    labelSst(2, 0, 4), mulRk(2, 1, Seq((777 << 2) | 2, (123 << 2) | 3)),
    // numeric-result formula is read via its cached value; a
    // string-result formula (0xFFFF trailer) is skipped
    labelSst(3, 0, 5), formulaNum(3, 1, 42.5), formulaStr(3, 2))
  private val sheet2 = Seq(
    labelSst(0, 0, 0), boolErr(1, 0, v = true))

  private val stream =
    workbookStream(Seq("Data" -> sheet1, "Flags" -> sheet2), sst)

  test("regular-FAT fixture: table() promotes the header and renders every cell type") {
    // pad past the 4096 mini cutoff with zero bytes AFTER the
    // workbook records (unknown record id 0 / len 0 — skipped)
    val padded = java.util.Arrays.copyOf(stream, 5000)
    val path = write(tmp, "big.xls", XlsFixture.cfb(padded))
    val rows = Xls.table(spark, path).orderBy($"name")
      .as[(String, String, String)].collect().toSeq
    assert(rows == Seq(("widget", "123", "2.5"), ("zz-formula", "42.5", ""),
      ("ไทย-กิจการ", "777", "1.23")))
  }

  test("ministream fixture: small workbook reads through the miniFAT path") {
    assert(stream.length < 4096, "fixture must exercise the ministream")
    val path = write(tmp, "small.xls", XlsFixture.cfb(stream))
    val rows = Xls.rows(spark, path)
      .select($"row_idx", $"cells").as[(Int, Seq[String])].collect().toSeq
      .sortBy(_._1)
    assert(rows == Seq(
      (0, Seq("name", "qty", "price")),
      (1, Seq("widget", "123", "2.5")),
      (2, Seq("ไทย-กิจการ", "777", "1.23")),
      (3, Seq("zz-formula", "42.5"))))
  }

  test("sheet inventory and by-name selection; missing name lists the sheets") {
    val path = write(tmp, "sheets.xls", XlsFixture.cfb(stream))
    val inv = Xls.sheets(spark, path).select($"sheet_idx", $"sheet_name")
      .as[(Int, String)].collect().toSeq.sortBy(_._1)
    assert(inv == Seq((1, "Data"), (2, "Flags")))
    val flags = Xls.rows(spark, path, "Flags")
      .select($"cells").as[Seq[String]].collect().toSeq
    assert(flags == Seq(Seq("name"), Seq("TRUE")))
    val err = intercept[org.apache.spark.SparkException] {
      Xls.rows(spark, path, "Nope").collect()
    }
    assert(err.getMessage.contains("Data") ||
      Option(err.getCause).exists(_.getMessage.contains("Data")))
  }

  test("FileIngest.auto dispatches .xls (by extension, with cfg.sheet)") {
    val path = write(tmp, "auto.xls", XlsFixture.cfb(stream))
    val df = FileIngest.auto(spark, path, GraftConfig(sheet = Some("Data")))
    assert(df.columns.toSeq == Seq("name", "qty", "price"))
    assert(df.count() == 3)
  }

  test("bad magic and BIFF5 fail with actionable messages") {
    val e1 = intercept[IllegalArgumentException] {
      Xls.parseWorkbook("PK not ole".getBytes("ISO-8859-1"), Left(1))
    }
    assert(e1.getMessage.contains("bad magic"))
  }

  test("SST spanning CONTINUE at string boundaries parses all strings") {
    // strings 0-1 in the SST record, 2-3 and 4-5 in two CONTINUEs
    val chunks = Seq(
      sstEntry("name", wide = false) ++ sstEntry("qty", wide = false),
      sstEntry("price", wide = false) ++ sstEntry("widget", wide = false),
      sstEntry("ไทย-กิจการ", wide = true) ++ sstEntry("zz-formula", wide = false))
    val st = workbookStreamSplitSst(Seq("Data" -> sheet1, "Flags" -> sheet2),
      total = 6, sstChunks = chunks)
    val rows = Xls.parseWorkbook(cfb(st), Left(1)).sortBy(_._1)
    assert(rows.head._2 == Seq("name", "qty", "price"))
    assert(rows(2)._2 == Seq("ไทย-กิจการ", "777", "1.23"))
  }

  test("SST string split INSIDE character data re-reads the grbit (width switch)") {
    // string 0 "abcไทย" (6 chars): header + compressed "abc" end the
    // SST record; the CONTINUE starts with grbit=1 and UTF-16 "ไทย" —
    // the compressed→wide switch [MS-XLS] allows at a split point.
    // string 1 splits wide→compressed the same way.
    val cells = Seq(labelSst(0, 0, 0), labelSst(0, 1, 1))
    val chunks = Seq(
      bHeader(6, 0) ++ bAscii("abc"),
      bGrbitUtf16("ไทย") ++ bHeader(4, 1) ++ bGrbitUtf16("ก2").drop(1),
      bGrbitAscii("34"))
    val st = workbookStreamSplitSst(Seq("Mix" -> cells), total = 2, sstChunks = chunks)
    val rows = Xls.parseWorkbook(cfb(st), Left(1))
    assert(rows == Seq((0, Seq("abcไทย", "ก234"))))
  }

  test("SST truncated mid-chain fails with the actionable message") {
    val chunks = Seq(bHeader(6, 0) ++ bAscii("abc")) // 3 chars missing, no CONTINUE
    val st = workbookStreamSplitSst(
      Seq("Mix" -> Seq(labelSst(0, 0, 0))), total = 1, sstChunks = chunks)
    val e = intercept[IllegalArgumentException] { Xls.parseWorkbook(cfb(st), Left(1)) }
    assert(e.getMessage.contains("SST truncated"), e.getMessage)
  }

  test("decodeRk covers int, div100 and 30-bit double encodings") {
    assert(Xls.decodeRk((123 << 2) | 2) == 123.0)
    assert(Xls.decodeRk((123 << 2) | 3) == 1.23)
    val bits = java.lang.Double.doubleToLongBits(2.5)
    val rk = ((bits >>> 32) & 0xFFFFFFFCL).toInt
    assert(Xls.decodeRk(rk) == 2.5)
    assert(Xls.decodeRk(((-5) << 2) | 2) == -5.0)
  }
}
