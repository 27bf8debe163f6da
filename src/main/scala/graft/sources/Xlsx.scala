package graft.sources

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed `.xlsx` ingestion with zero external dependencies,
  * covering the reference's Excel input path (scraper_v2.py:523-556).
  *
  * An xlsx file is a zip of XML parts; Spark's built-in `binaryFile`
  * source distributes whole files to executors, where each workbook is
  * parsed with `java.util.zip` + the same regex-extraction idiom as
  * [[HtmlTable]]. Supported cell shapes: shared strings (`t="s"`),
  * inline strings (`t="inlineStr"`), formula-free numbers/plain
  * values — everything a company-list export actually contains.
  * Sparse rows are materialized by cell reference, so missing cells
  * become empty strings, like the reference's pandas read.
  *
  * One workbook never splits across tasks (a zip isn't splittable);
  * parallelism comes from the number of files, which is how
  * spreadsheet inputs arrive in practice (many small exports). For
  * 100 TB-scale fact data nobody ships xlsx — this is the dim-input
  * path, matching the reference's usage.
  */
object Xlsx {

  private val EntityMap = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&apos;" -> "'", "&amp;" -> "&")

  private def unescape(s: String): String =
    EntityMap.foldLeft(s) { case (acc, (e, c)) => acc.replace(e, c) }

  /** "A"→0, "AB"→27 … */
  private[sources] def colIndex(ref: String): Int =
    ref.takeWhile(_.isLetter).foldLeft(0)((acc, ch) => acc * 26 + (ch - 'A' + 1)) - 1

  private val SiRe = "(?s)<si>(.*?)</si>".r
  private val TRe = "(?s)<t[^>]*>(.*?)</t>".r
  private val RowRe = "(?s)<row[^>]*>(.*?)</row>".r
  private val CellRe = "(?s)<c ([^>]*?)(?:/>|>(.*?)</c>)".r
  private val RefRe = """r="([A-Z]+)\d*"""".r
  private val TypeRe = """t="([a-zA-Z]+)"""".r
  private val VRe = "(?s)<v>(.*?)</v>".r
  private val SheetTagRe = "<sheet [^>]*?/?>".r
  private val NameAttrRe = """name="([^"]*)"""".r
  private val RidAttrRe = """r:id="([^"]*)"""".r
  private val RelTagRe = "<Relationship [^>]*?/>".r
  private val IdAttrRe = """Id="([^"]*)"""".r
  private val TargetAttrRe = """Target="([^"]*)"""".r

  /** One sequential pass over the zip, decompressing ONLY the entries
    * `wanted` accepts — a 20-sheet workbook where one sheet is
    * requested must not buffer every sheet's XML (entry order inside
    * an xlsx is arbitrary, so name→path resolution takes a metadata
    * pass first, then a second pass extracts just the target). */
  private def zipEntries(bytes: Array[Byte],
                         wanted: String => Boolean): Map[String, String] = {
    val parts = mutable.Map.empty[String, String]
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    try {
      var entry = zin.getNextEntry
      while (entry != null) {
        val nm = entry.getName
        if (wanted(nm)) {
          val out = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](8192)
          var n = zin.read(buf)
          while (n >= 0) { out.write(buf, 0, n); n = zin.read(buf) }
          parts(nm) = out.toString("UTF-8")
        }
        entry = zin.getNextEntry
      }
    } finally zin.close()
    parts.toMap
  }

  private val MetaEntries = Set(
    "xl/sharedStrings.xml", "xl/workbook.xml", "xl/_rels/workbook.xml.rels")

  /** Workbook sheet names in workbook order (xl/workbook.xml
    * <sheet name=.../> tags — the reference selects sheets by name,
    * scraper_v2.py:528). */
  private[sources] def parseSheetNames(bytes: Array[Byte]): Seq[String] =
    loudly(SheetTagRe.findAllIn(
        zipEntries(bytes, _ == "xl/workbook.xml").getOrElse("xl/workbook.xml", ""))
      .map(tag => NameAttrRe.findFirstMatchIn(tag).map(m => unescape(m.group(1))).getOrElse(""))
      .toSeq)

  /** Resolve a sheet NAME to its worksheet part path:
    * workbook.xml name→r:id, workbook.xml.rels Id→Target. */
  private def sheetPathByName(parts: Map[String, String], name: String): String = {
    val wb = parts.getOrElse("xl/workbook.xml",
      throw new IllegalArgumentException("workbook has no xl/workbook.xml"))
    val tags = SheetTagRe.findAllIn(wb).toSeq
    val rid = tags.collectFirst {
      case tag if NameAttrRe.findFirstMatchIn(tag).exists(m => unescape(m.group(1)) == name) =>
        RidAttrRe.findFirstMatchIn(tag).map(_.group(1))
          .getOrElse(throw new IllegalArgumentException(s"sheet '$name' has no r:id"))
    }.getOrElse {
      val avail = tags.flatMap(t => NameAttrRe.findFirstMatchIn(t).map(m => unescape(m.group(1))))
      throw new IllegalArgumentException(
        s"no sheet named '$name'; workbook has: ${avail.mkString(", ")}")
    }
    val rels = parts.getOrElse("xl/_rels/workbook.xml.rels", "")
    val target = RelTagRe.findAllIn(rels).collectFirst {
      case tag if IdAttrRe.findFirstMatchIn(tag).exists(_.group(1) == rid) =>
        TargetAttrRe.findFirstMatchIn(tag).map(m => unescape(m.group(1)))
          .getOrElse(throw new IllegalArgumentException(s"relationship $rid has no Target"))
    }.getOrElse(throw new IllegalArgumentException(s"no relationship for sheet '$name' ($rid)"))
    if (target.startsWith("/")) target.stripPrefix("/") else s"xl/$target"
  }

  /** Hostile-input gate (round 16, FuzzSpec): zip corruption (CRC,
    * entry sizes, deflate errors) and index reads on corrupted bytes
    * surface as the loud contract failure, never a JVM artifact. */
  private def loudly[T](body: => T): T =
    try body catch {
      case e: NumberFormatException => throw new IllegalArgumentException(
        s"XLSX: malformed number (${e.getMessage})")
      case e: IllegalArgumentException => throw e
      case e @ (_: IndexOutOfBoundsException | _: NegativeArraySizeException |
          _: java.io.IOException | _: NoSuchElementException |
          _: UnsupportedOperationException) =>
        throw new IllegalArgumentException(s"XLSX: malformed/truncated " +
          s"workbook (${e.getClass.getSimpleName}: ${e.getMessage})")
    }

  /** Parse one workbook's bytes → (row_idx, cells).
    * `sheetSel`: Left(1-based index) or Right(sheet name). */
  private[sources] def parseWorkbook(
      bytes: Array[Byte], sheetSel: Either[Int, String]): Seq[(Int, Seq[String])] = loudly {
    val meta = zipEntries(bytes, MetaEntries.contains)
    val sheetPath = sheetSel match {
      case Left(i) => s"xl/worksheets/sheet$i.xml"
      case Right(nm) => sheetPathByName(meta, nm)
    }
    val sheetXml = zipEntries(bytes, _ == sheetPath).getOrElse(sheetPath, "")
    val sharedXml = meta.getOrElse("xl/sharedStrings.xml", "")
    // an <si> may hold several rich-text runs — concatenate its <t>s
    val shared = SiRe.findAllMatchIn(sharedXml).map(si =>
      TRe.findAllMatchIn(si.group(1)).map(t => unescape(t.group(1))).mkString).toVector
    RowRe.findAllMatchIn(sheetXml).zipWithIndex.map { case (row, idx) =>
      val cells = mutable.SortedMap.empty[Int, String]
      for (c <- CellRe.findAllMatchIn(row.group(1))) {
        val attrs = c.group(1)
        val body = Option(c.group(2)).getOrElse("")
        val ci = RefRe.findFirstMatchIn(attrs).map(m => colIndex(m.group(1)))
          .getOrElse(if (cells.isEmpty) 0 else cells.lastKey + 1)
        val tpe = TypeRe.findFirstMatchIn(attrs).map(_.group(1)).getOrElse("n")
        val v = tpe match {
          case "s" =>
            VRe.findFirstMatchIn(body).map(m => shared(m.group(1).trim.toInt)).getOrElse("")
          case "inlineStr" =>
            TRe.findFirstMatchIn(body).map(m => unescape(m.group(1))).getOrElse("")
          case _ =>
            VRe.findFirstMatchIn(body).map(m => unescape(m.group(1))).getOrElse("")
        }
        cells(ci) = v
      }
      val width = if (cells.isEmpty) 0 else cells.lastKey + 1
      (idx, (0 until width).map(i => cells.getOrElse(i, "")))
    }.toSeq
  }

  /** Raw distributed read: one output row per sheet row —
    * (path, row_idx, cells array<string>). */
  def rows(spark: SparkSession, path: String, sheet: Int = 1): DataFrame =
    rowsSel(spark, path, Left(sheet))

  /** Raw read of a sheet selected BY NAME (the reference's `-s Sheet1`,
    * scraper_v2.py:528); throws with the available names if absent. */
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

  /** Sheet inventory: one row per (path, sheet_idx, sheet_name), in
    * workbook order — the discovery step before [[rows]] by name. */
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

  /** Header-promoted table: row 0 of the (lexicographically first)
    * file names the columns; every later row becomes a string-typed
    * record. The header fetch is a driver-side head of ONE row —
    * spreadsheet inputs are dim-scale by contract (see class doc). */
  def table(spark: SparkSession, path: String, sheet: Int = 1): DataFrame =
    tableOf(rows(spark, path, sheet), path)

  /** Header-promoted table of a NAMED sheet. */
  def table(spark: SparkSession, path: String, sheetName: String): DataFrame =
    tableOf(rows(spark, path, sheetName), path)

  private[sources] def tableOf(all: DataFrame, path: String): DataFrame = {
    val header = all.filter(col("row_idx") === 0)
      .orderBy(col("path")).select(col("cells")).limit(1)
      .collect().headOption.map(_.getSeq[String](0))
      .getOrElse(throw new IllegalArgumentException(s"no rows in $path"))
    all.filter(col("row_idx") > 0)
      // get() (not getItem) tolerates short rows under ANSI mode
      .select(header.zipWithIndex.map { case (name, i) =>
        coalesce(get(col("cells"), lit(i)), lit("")).as(name)
      }: _*)
  }
}
