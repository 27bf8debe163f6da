package graft.sources

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed legacy `.xls` (OLE2/BIFF8) ingestion with zero external
  * dependencies — the reader the round-3/4 fail-fast hint promised,
  * covering the reference's `.xls` branch (scraper_v2.py:528, pandas/
  * xlrd). Same execution shape as [[Xlsx]]: Spark's `binaryFile`
  * source distributes whole workbooks to executors; one workbook never
  * splits (the OLE2 container is not splittable); parallelism comes
  * from the number of files. Legacy spreadsheets are dim-scale inputs
  * by contract — nobody ships 100 TB of `.xls`.
  *
  * Two layers, both parsed from first principles off the public
  * [MS-CFB]/[MS-XLS] layouts:
  *
  *  1. **CFB container** — 512-byte header (DIFAT head), FAT built
  *     from DIFAT-listed sectors, directory chain, stream extraction.
  *     Streams smaller than the mini cutoff (4096) live in the ROOT
  *     entry's ministream addressed by the miniFAT — both paths are
  *     implemented (tiny real-world workbooks do use the ministream).
  *  2. **BIFF8 records** — workbook-globals substream (BOUNDSHEET
  *     sheet directory, SST shared strings) + per-sheet substreams
  *     (LABELSST / NUMBER / RK / MULRK / LABEL / BOOLERR cells).
  *
  * Not supported (throws with a clear message rather than
  * mis-parsing): BIFF5 (`Book` stream only), encrypted workbooks
  * (FILEPASS). SST tables spanning CONTINUE records ARE supported,
  * including strings split inside their character data (the
  * continuation re-declares its encoding with a fresh grbit byte, per
  * [MS-XLS]). Formula cells yield their cached numeric result when
  * BIFF stores one inline; string formula results are skipped.
  */
object Xls {

  // ---------------------------------------------------------------- CFB

  private val CfbMagic = Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1)
    .map(_.toByte)
  private val EndOfChain = 0xFFFFFFFE
  private val FreeSect = 0xFFFFFFFF

  private def u8(b: Array[Byte], o: Int): Int = b(o) & 0xFF
  private def u16(b: Array[Byte], o: Int): Int = u8(b, o) | (u8(b, o + 1) << 8)
  private def i32(b: Array[Byte], o: Int): Int =
    u16(b, o) | (u16(b, o + 2) << 16)

  /** Extracted CFB streams: name → bytes (top-level entries only —
    * a BIFF workbook has no nested storages worth walking). */
  private[sources] def cfbStreams(bytes: Array[Byte]): Map[String, Array[Byte]] = {
    require(bytes.length >= 512 && CfbMagic.indices.forall(i => bytes(i) == CfbMagic(i)),
      "not an OLE2 compound file (bad magic) — is this really a .xls?")
    val sectorShift = u16(bytes, 30)
    val sectorSize = 1 << sectorShift
    val miniShift = u16(bytes, 32)
    val miniSize = 1 << miniShift
    val firstDirSector = i32(bytes, 48)
    val miniCutoff = i32(bytes, 56)
    val firstMiniFat = i32(bytes, 60)
    val firstDifat = i32(bytes, 68)
    val nDifat = i32(bytes, 72)

    def sector(i: Int): Array[Byte] = {
      val off = (i + 1) * sectorSize
      java.util.Arrays.copyOfRange(bytes, off, math.min(off + sectorSize, bytes.length))
    }

    // DIFAT: 109 header entries + chained DIFAT sectors (last int of
    // each chains to the next)
    val difat = mutable.ArrayBuffer.empty[Int]
    for (i <- 0 until 109) difat += i32(bytes, 76 + 4 * i)
    var ds = firstDifat
    var guard = 0
    while (ds != EndOfChain && ds != FreeSect && guard <= nDifat + 1) {
      val s = sector(ds)
      for (i <- 0 until sectorSize / 4 - 1) difat += i32(s, 4 * i)
      ds = i32(s, sectorSize - 4)
      guard += 1
    }

    val fat = difat.iterator.filter(s => s != FreeSect && s != EndOfChain)
      .flatMap(s => (0 until sectorSize / 4).map(i => i32(sector(s), 4 * i)))
      .toArray

    def chain(start: Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      var s = start
      var guard = 0
      while (s != EndOfChain && s != FreeSect && guard < fat.length + 1) {
        out.write(sector(s))
        s = if (s >= 0 && s < fat.length) fat(s)
            else throw new IllegalArgumentException(s"FAT chain walks off the map at sector $s")
        guard += 1
      }
      out.toByteArray
    }

    // directory entries: 128 bytes each across the directory chain
    val dir = chain(firstDirSector)
    case class Entry(name: String, objType: Int, start: Int, size: Long)
    val entries = (0 until dir.length / 128).map { i =>
      val o = i * 128
      val nameLen = u16(dir, o + 64) // bytes incl. terminator
      val name = if (nameLen >= 2)
        new String(dir, o, nameLen - 2, java.nio.charset.StandardCharsets.UTF_16LE)
      else ""
      Entry(name, u8(dir, o + 66), i32(dir, o + 116),
        i32(dir, o + 120).toLong & 0xFFFFFFFFL)
    }

    val root = entries.find(_.objType == 5).getOrElse(
      throw new IllegalArgumentException("compound file has no root entry"))

    // ministream: the root entry's stream (regular sectors), addressed
    // in 64-byte minisectors via the miniFAT chain
    lazy val miniStream = chain(root.start)
    lazy val miniFat: Array[Int] = {
      val out = mutable.ArrayBuffer.empty[Int]
      var s = firstMiniFat
      var guard = 0
      while (s != EndOfChain && s != FreeSect && guard < fat.length + 1) {
        val sec = sector(s)
        for (i <- 0 until sectorSize / 4) out += i32(sec, 4 * i)
        s = fat(s)
        guard += 1
      }
      out.toArray
    }

    def miniChain(start: Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      var s = start
      var guard = 0
      while (s != EndOfChain && s != FreeSect && guard < miniFat.length + 1) {
        val off = s * miniSize
        out.write(java.util.Arrays.copyOfRange(miniStream, off,
          math.min(off + miniSize, miniStream.length)))
        s = if (s >= 0 && s < miniFat.length) miniFat(s)
            else throw new IllegalArgumentException(s"miniFAT chain walks off the map at $s")
        guard += 1
      }
      out.toByteArray
    }

    entries.filter(e => e.objType == 2 && e.name.nonEmpty).map { e =>
      val raw = if (e.size < miniCutoff) miniChain(e.start) else chain(e.start)
      e.name -> java.util.Arrays.copyOfRange(raw, 0, math.min(e.size, raw.length.toLong).toInt)
    }.toMap
  }

  // --------------------------------------------------------------- BIFF8

  private val RecBOF = 0x0809
  private val RecEOF = 0x000A
  private val RecBOUNDSHEET = 0x0085
  private val RecSST = 0x00FC
  private val RecLABELSST = 0x00FD
  private val RecNUMBER = 0x0203
  private val RecRK = 0x027E
  private val RecMULRK = 0x00BD
  private val RecLABEL = 0x0204
  private val RecBOOLERR = 0x0205
  private val RecFORMULA = 0x0006
  private val RecFILEPASS = 0x002F
  private val RecCONTINUE = 0x003C

  /** BIFF doubles render the way the xlsx XML path stores them:
    * integral values without a decimal point. */
  private def renderNum(d: Double): String =
    if (d == math.rint(d) && math.abs(d) < 1e15) d.toLong.toString else d.toString

  /** RK: 30-bit packed number. bit0 = ÷100, bit1 = int (else the high
    * 30 bits of an IEEE double). */
  private[sources] def decodeRk(rk: Int): Double = {
    val base = if ((rk & 2) != 0) (rk >> 2).toDouble
    else java.lang.Double.longBitsToDouble((rk.toLong & 0xFFFFFFFCL) << 32)
    if ((rk & 1) != 0) base / 100.0 else base
  }

  /** XLUnicodeRichExtendedString at `o`: returns (text, bytesRead). */
  private def readUnicode(b: Array[Byte], o: Int, shortLen: Boolean): (String, Int) = {
    var p = o
    val cch = if (shortLen) { val v = u8(b, p); p += 1; v }
              else { val v = u16(b, p); p += 2; v }
    val flags = u8(b, p); p += 1
    val high = (flags & 1) != 0
    val rich = (flags & 8) != 0
    val ext = (flags & 4) != 0
    val cRun = if (rich) { val v = u16(b, p); p += 2; v } else 0
    val cbExt = if (ext) { val v = i32(b, p); p += 4; v } else 0
    val text =
      if (high) {
        val s = new String(b, p, cch * 2, java.nio.charset.StandardCharsets.UTF_16LE)
        p += cch * 2; s
      } else {
        val s = new String(b, p, cch, java.nio.charset.StandardCharsets.ISO_8859_1)
        p += cch; s
      }
    p += cRun * 4 + cbExt
    (text, p - o)
  }

  /** Records of one substream starting at `off`: (id, payload offset,
    * payload length), ending after the matching EOF. */
  private def records(b: Array[Byte], off: Int): Iterator[(Int, Int, Int)] =
    new Iterator[(Int, Int, Int)] {
      private var p = off
      private var done = false
      def hasNext: Boolean = !done && p + 4 <= b.length
      def next(): (Int, Int, Int) = {
        val id = u16(b, p); val len = u16(b, p + 2)
        // a truncated final record must fail with the reader's
        // actionable message, not an ArrayIndexOutOfBounds from a
        // downstream payload parser
        require(p + 4 + len <= b.length,
          f"truncated BIFF record 0x$id%04x at offset $p: declared payload " +
            s"$len bytes, stream has ${b.length - p - 4} left")
        val r = (id, p + 4, len)
        p += 4 + len
        if (id == RecEOF) done = true
        r
      }
    }

  private case class Globals(sheets: Seq[(String, Int)], sst: Vector[String])

  private def parseGlobals(wb: Array[Byte]): Globals = {
    require(u16(wb, 0) == RecBOF, "workbook stream does not start with BOF")
    require(u16(wb, 4) == 0x0600,
      s"unsupported BIFF version 0x${u16(wb, 4).toHexString} — only BIFF8 (Excel 97+); convert to .xlsx")
    val sheets = mutable.ArrayBuffer.empty[(String, Int)]
    var sst = Vector.empty[String]
    val sstSegs = mutable.ArrayBuffer.empty[(Int, Int)]
    var sstUnique = -1
    var inSst = false
    for ((id, o, len) <- records(wb, 0)) id match {
      case RecFILEPASS =>
        throw new IllegalArgumentException("encrypted .xls (FILEPASS) is not supported")
      case RecBOUNDSHEET =>
        val pos = i32(wb, o)
        val (name, _) = readUnicode(wb, o + 6, shortLen = true)
        sheets += name -> pos
      case RecSST =>
        sstUnique = i32(wb, o + 4)
        sstSegs += ((o + 8, len - 8))
        inSst = true
      case RecCONTINUE if inSst =>
        sstSegs += ((o, len))
      case _ =>
        inSst = false
    }
    if (sstUnique >= 0) sst = parseSst(wb, sstSegs.toIndexedSeq, sstUnique)
    Globals(sheets.toSeq, sst)
  }

  /** SST string table across the SST record and its CONTINUE records.
    *
    * [MS-XLS] split rules: a string may end exactly at a record
    * boundary (the next string's header starts the CONTINUE), or split
    * INSIDE its character data — in which case the continuation
    * re-declares the encoding with a fresh grbit byte (compressed /
    * UTF-16 can switch per segment). Rich-run and ext bytes continue
    * raw. Header fields are read byte-wise so a straddling header
    * cannot mis-parse. */
  private def parseSst(wb: Array[Byte],
                       segs: IndexedSeq[(Int, Int)], unique: Int): Vector[String] = {
    var si = 0
    var p = segs.head._1
    def segEnd: Int = segs(si)._1 + segs(si)._2
    def atEnd: Boolean = p >= segEnd
    def nextSeg(): Unit = {
      si += 1
      if (si >= segs.length)
        throw new IllegalArgumentException(
          s"SST truncated: $unique strings declared but the SST/CONTINUE chain ended")
      p = segs(si)._1
    }
    def rdByte(): Int = {
      if (atEnd) nextSeg()
      val v = u8(wb, p); p += 1; v
    }
    def rdU16(): Int = rdByte() | (rdByte() << 8)
    def rdI32(): Int = rdU16() | (rdU16() << 16)
    val out = Vector.newBuilder[String]
    var k = 0
    while (k < unique) {
      val cch = rdU16()
      val flags = rdByte()
      var high = (flags & 1) != 0
      val rich = (flags & 8) != 0
      val ext = (flags & 4) != 0
      val cRun = if (rich) rdU16() else 0
      val cbExt = if (ext) rdI32() else 0
      val sb = new java.lang.StringBuilder(cch)
      var read = 0
      while (read < cch) {
        if (atEnd) {
          // character-data continuation re-reads the encoding byte —
          // via rdByte() so a zero-length CONTINUE segment is skipped
          // instead of reading past it into the next record header
          high = (rdByte() & 1) != 0
        }
        val w = if (high) 2 else 1
        val take = math.min(cch - read, (segEnd - p) / w)
        if (take <= 0)
          throw new IllegalArgumentException(
            s"SST: split inside a UTF-16 code unit at offset $p — malformed workbook")
        sb.append(
          if (high) new String(wb, p, take * 2, java.nio.charset.StandardCharsets.UTF_16LE)
          else new String(wb, p, take, java.nio.charset.StandardCharsets.ISO_8859_1))
        p += take * w
        read += take
      }
      var skip = cRun * 4 + cbExt
      while (skip > 0) {
        if (atEnd) nextSeg()
        val t = math.min(skip, segEnd - p)
        p += t; skip -= t
      }
      out += sb.toString
      k += 1
    }
    out.result()
  }

  /** Cells of the sheet substream at `off` → (row, col, rendered). */
  private def parseSheet(wb: Array[Byte], off: Int, sst: Vector[String]): Seq[(Int, Int, String)] = {
    require(u16(wb, off) == RecBOF, s"sheet substream at $off does not start with BOF")
    val cells = mutable.ArrayBuffer.empty[(Int, Int, String)]
    for ((id, o, len) <- records(wb, off)) id match {
      case RecLABELSST =>
        val idx = i32(wb, o + 6)
        cells += ((u16(wb, o), u16(wb, o + 2),
          if (idx >= 0 && idx < sst.length) sst(idx) else ""))
      case RecNUMBER =>
        val bits = (i32(wb, o + 6).toLong & 0xFFFFFFFFL) |
          (i32(wb, o + 10).toLong << 32)
        cells += ((u16(wb, o), u16(wb, o + 2),
          renderNum(java.lang.Double.longBitsToDouble(bits))))
      case RecRK =>
        cells += ((u16(wb, o), u16(wb, o + 2), renderNum(decodeRk(i32(wb, o + 6)))))
      case RecMULRK =>
        val row = u16(wb, o)
        val colFirst = u16(wb, o + 2)
        val n = (len - 6) / 6
        for (i <- 0 until n)
          cells += ((row, colFirst + i, renderNum(decodeRk(i32(wb, o + 4 + 6 * i + 2)))))
      case RecLABEL =>
        cells += ((u16(wb, o), u16(wb, o + 2),
          readUnicode(wb, o + 6, shortLen = false)._1))
      case RecBOOLERR =>
        val isErr = u8(wb, o + 7) != 0
        val v = if (isErr) "" else if (u8(wb, o + 6) != 0) "TRUE" else "FALSE"
        cells += ((u16(wb, o), u16(wb, o + 2), v))
      case RecFORMULA =>
        // cached result: a full IEEE double unless the trailer
        // 0xFFFF tags a string/bool/err result (those need the
        // following STRING record — skipped, like xlsx formulas)
        if (u16(wb, o + 12) != 0xFFFF) {
          val bits = (i32(wb, o + 6).toLong & 0xFFFFFFFFL) |
            (i32(wb, o + 10).toLong << 32)
          cells += ((u16(wb, o), u16(wb, o + 2),
            renderNum(java.lang.Double.longBitsToDouble(bits))))
        }
      case _ => ()
    }
    cells.toSeq
  }

  /** The `Workbook` stream (BIFF8); `Book` alone means BIFF5. */
  private def workbookStream(bytes: Array[Byte]): Array[Byte] = {
    val streams = cfbStreams(bytes)
    streams.getOrElse("Workbook", streams.get("Book") match {
      case Some(_) => throw new IllegalArgumentException(
        "BIFF5 workbook ('Book' stream) is not supported — only BIFF8 (Excel 97+); convert to .xlsx")
      case None => throw new IllegalArgumentException(
        s"no Workbook stream; compound file holds: ${streams.keys.mkString(", ")}")
    })
  }

  /** Parse one workbook's bytes → (row_idx, cells), positional row
    * indexing and dense rows exactly like [[Xlsx.parseWorkbook]]. */
  /** Hostile-input gate (round 16, FuzzSpec): the CFB sector walk and
    * BIFF record reads on corrupted bytes surface as the loud
    * contract failure, never a JVM artifact. */
  private def loudly[T](body: => T): T =
    try body catch {
      case e: NumberFormatException => throw new IllegalArgumentException(
        s"XLS: malformed number (${e.getMessage})")
      case e: IllegalArgumentException => throw e
      case e @ (_: IndexOutOfBoundsException | _: NegativeArraySizeException |
          _: java.io.IOException | _: NoSuchElementException |
          _: UnsupportedOperationException) =>
        throw new IllegalArgumentException(s"XLS: malformed/truncated " +
          s"workbook (${e.getClass.getSimpleName}: ${e.getMessage})")
    }

  private[sources] def parseWorkbook(
      bytes: Array[Byte], sheetSel: Either[Int, String]): Seq[(Int, Seq[String])] = loudly {
    val wb = workbookStream(bytes)
    val g = parseGlobals(wb)
    val off = sheetSel match {
      case Left(i) =>
        if (i < 1 || i > g.sheets.length) throw new IllegalArgumentException(
          s"sheet index $i out of range 1..${g.sheets.length}")
        g.sheets(i - 1)._2
      case Right(nm) => g.sheets.collectFirst { case (`nm`, pos) => pos }.getOrElse(
        throw new IllegalArgumentException(
          s"no sheet named '$nm'; workbook has: ${g.sheets.map(_._1).mkString(", ")}"))
    }
    parseSheet(wb, off, g.sst)
      .groupBy(_._1).toSeq.sortBy(_._1).zipWithIndex
      .map { case ((_, cs), idx) =>
        val byCol = cs.map(c => c._2 -> c._3).toMap
        val width = byCol.keys.max + 1
        (idx, (0 until width).map(i => byCol.getOrElse(i, "")))
      }
  }

  private[sources] def parseSheetNames(bytes: Array[Byte]): Seq[String] =
    loudly(parseGlobals(workbookStream(bytes)).sheets.map(_._1))

  // ---------------------------------------------------------------- API

  /** Raw distributed read: one output row per sheet row —
    * (path, row_idx, cells array<string>), mirroring [[Xlsx.rows]]. */
  def rows(spark: SparkSession, path: String, sheet: Int = 1): DataFrame =
    rowsSel(spark, path, Left(sheet))

  /** Raw read of a sheet selected BY NAME. */
  def rows(spark: SparkSession, path: String, sheetName: String): DataFrame =
    rowsSel(spark, path, Right(sheetName))

  private def rowsSel(spark: SparkSession, path: String,
                      sheetSel: Either[Int, String]): DataFrame = {
    import spark.implicits._
    val s = sheetSel
    spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, bytes) =>
        parseWorkbook(bytes, s).map { case (i, cells) => (p, i, cells) }
      }
      .toDF("path", "row_idx", "cells")
  }

  /** Sheet inventory: (path, sheet_idx, sheet_name) in workbook order. */
  def sheets(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, bytes) =>
        parseSheetNames(bytes).zipWithIndex.map { case (nm, i) => (p, i + 1, nm) }
      }
      .toDF("path", "sheet_idx", "sheet_name")
  }

  /** Header-promoted table (same contract as [[Xlsx.table]]). */
  def table(spark: SparkSession, path: String, sheet: Int = 1): DataFrame =
    Xlsx.tableOf(rows(spark, path, sheet), path)

  /** Header-promoted table of a NAMED sheet. */
  def table(spark: SparkSession, path: String, sheetName: String): DataFrame =
    Xlsx.tableOf(rows(spark, path, sheetName), path)
}
