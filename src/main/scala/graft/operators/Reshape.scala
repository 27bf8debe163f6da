package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Wide↔long reshaping, mirroring the reference's table extraction.
  *
  * The reference reads a wide year-columned financial table and emits
  * long-format `(field, year, value)` records
  * (`extract_table_data`, scraper_v2.py:1136-1230; output assembly at
  * 1520-1532). `melt` is the wide→long direction; `pivotOn` is the
  * long→wide inverse. Both are single-pass, shuffle-free projections
  * (pivot aggregates are map-side combinable conditional sums — no
  * pivot-values discovery job, which would be a driver-side extra
  * pass at 100 TB).
  */
object Reshape {

  /** Wide→long: one output row per (id row × measure column). */
  def melt(df: DataFrame, ids: Seq[String], measures: Seq[String],
           fieldCol: String = "field", valueCol: String = "value"): DataFrame =
    df.unpivot(ids.map(col).toArray, measures.map(col).toArray, fieldCol, valueCol)

  /** Long→wide with an explicit pivot domain: emits one conditional
    * aggregate per (pivot value × measure) — names `prefix_value`. */
  def pivotOn(df: DataFrame, groupCols: Seq[String], pivotCol: String,
              pivotValues: Seq[Any], valueAgg: Column => Column,
              valueCol: String, prefix: String): DataFrame = {
    val aggs = pivotValues.map { v =>
      valueAgg(when(col(pivotCol) === lit(v), col(valueCol))).as(s"$prefix$v")
    }
    df.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Numeric-string cleaning (scraper_v2.py:1217-1228): placeholder
    * values (`-`, empty, `0.00`) become null, currency/grouping
    * symbols are stripped, the remainder is try-cast to double —
    * unparseable values become null, matching the reference's
    * `except ValueError: continue` (scraper_v2.py:1227), not an error
    * (Spark 4 ANSI cast would throw). */
  def cleanNumeric(c: Column, placeholders: Seq[String] = Seq("-", "", "0.00")): Column = {
    val cleaned = regexp_replace(trim(c), "[$,]", "")
    when(trim(c).isin(placeholders: _*), lit(null)).otherwise(cleaned.try_cast("double"))
  }
}
