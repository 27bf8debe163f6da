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

  /** Parse one workbook's bytes → (row_idx, cells) for `sheet`. */
  private[sources] def parseWorkbook(bytes: Array[Byte], sheet: Int): Seq[(Int, Seq[String])] = {
    var sharedXml = ""
    var sheetXml = ""
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    try {
      var entry = zin.getNextEntry
      while (entry != null) {
        if (entry.getName == "xl/sharedStrings.xml" ||
            entry.getName == s"xl/worksheets/sheet$sheet.xml") {
          val out = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](8192)
          var n = zin.read(buf)
          while (n >= 0) { out.write(buf, 0, n); n = zin.read(buf) }
          val xml = out.toString("UTF-8")
          if (entry.getName.endsWith("sharedStrings.xml")) sharedXml = xml
          else sheetXml = xml
        }
        entry = zin.getNextEntry
      }
    } finally zin.close()
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
  def rows(spark: SparkSession, path: String, sheet: Int = 1): DataFrame = {
    import spark.implicits._
    val s = sheet
    spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, bytes) =>
        parseWorkbook(bytes, s).map { case (i, cells) => (p, i, cells) }
      }
      .toDF("path", "row_idx", "cells")
  }

  /** Header-promoted table: row 0 of the (lexicographically first)
    * file names the columns; every later row becomes a string-typed
    * record. The header fetch is a driver-side head of ONE row —
    * spreadsheet inputs are dim-scale by contract (see class doc). */
  def table(spark: SparkSession, path: String, sheet: Int = 1): DataFrame = {
    val all = rows(spark, path, sheet)
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
