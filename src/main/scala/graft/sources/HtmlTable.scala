package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed HTML-table extraction — the engine-side analog of the
  * reference's DOM scraping (`extract_table_data`,
  * scraper_v2.py:1136-1230): given a column of fetched page HTML,
  * pull `<tr>`/`<td|th>` structure into typed rows. Fetching itself
  * is an ingestion concern (pages land in a lake table via whatever
  * fetch tier); parsing is where the data-parallel work is, and it
  * runs as codegen'd regex expressions — no per-row driver work, no
  * UDF.
  */
object HtmlTable {

  private val rowPat = "(?si)<tr[^>]*>(.*?)</tr>"
  private val cellPat = "(?si)<t[dh][^>]*>(.*?)</t[dh]>"

  /** Inner HTML of each `<tr>`. */
  def rows(html: Column): Column =
    regexp_extract_all(html, lit(rowPat), lit(1))

  /** Trimmed, tag-stripped text of each cell in a row's inner HTML. */
  def cells(rowHtml: Column): Column =
    transform(regexp_extract_all(rowHtml, lit(cellPat), lit(1)),
      c => trim(regexp_replace(c, "<[^>]*>", "")))

  /** One output row per table row: (input cols…, row_idx, cells).
    * `row_idx` is 0-based document order; header rows are row 0 by
    * HTML convention — filter or use as labels downstream. */
  def extractRows(df: DataFrame, htmlCol: String): DataFrame =
    df.select(col("*"), posexplode(rows(col(htmlCol))).as(Seq("row_idx", "__row")))
      .withColumn("cells", cells(col("__row")))
      .drop("__row")

  /** Field-map extraction like the reference's field whitelists
    * (scraper_v2.py:1186-1196): keep rows whose first cell matches one
    * of `fields`, emitting (field, values…) — value columns are the
    * remaining cells parsed with [[graft.operators.Reshape.cleanNumeric]]. */
  def extractFields(df: DataFrame, htmlCol: String, fields: Seq[String]): DataFrame = {
    extractRows(df, htmlCol)
      .withColumn("field", col("cells").getItem(0))
      .filter(col("field").isin(fields: _*))
      .withColumn("values", transform(slice(col("cells"), 2, 1000),
        c => graft.operators.Reshape.cleanNumeric(c)))
      .drop("cells")
  }
}
