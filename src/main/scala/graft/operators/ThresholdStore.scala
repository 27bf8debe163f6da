package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.PRound

/** Store-served per-group percentile thresholds — the production
  * topology for winsorize / outlier-gate / MAD-band cuts (VERDICT r11
  * #5): the exact percentile aggregation is census-bounded but still
  * a full pass over the fact table, and the cuts only change when the
  * data does — so build them AT MOST ONCE per dataset generation into
  * the content-keyed [[graft.sources.DatasetCache]] (the
  * ann_ivfpq_stored / decontaminate_bloom_stored pattern) and serve
  * every downstream run by reading the tiny cuts frame back and
  * broadcast-joining it. A nightly refresh is "delete the marker or
  * let the content key change"; the serve path carries ZERO percentile
  * aggregates (plan-gated).
  *
  * The artifact name must encode the cut GEOMETRY (percentiles +
  * rounding), not just a label — the content key only tracks the input
  * files, so a geometry change must force a rebuild (the ADVICE r11
  * bloom-store lesson).
  */
object ThresholdStore {

  /** Exact per-group percentile cuts, each rounded to `dp` decimals so
    * every engine clips at the identical boundary. `ps` = (output
    * column, percentile) pairs. */
  def groupedCuts(df: DataFrame, groupCols: Seq[String], valueCol: String,
                  ps: Seq[(String, Double)], dp: Int): DataFrame = {
    val aggs: Seq[Column] = ps.map { case (name, p) =>
      PRound.pround(expr(s"percentile($valueCol, $p)"), dp).as(name)
    }
    df.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** [[groupedCuts]] built once into the store and read back. `deps`
    * are the content-key inputs (e.g. "events.parquet"); the artifact
    * name embeds the geometry automatically. */
  def storedCuts(spark: SparkSession, sfDir: String, deps: Seq[String],
                 label: String, df: DataFrame, groupCols: Seq[String],
                 valueCol: String, ps: Seq[(String, Double)],
                 dp: Int): DataFrame = {
    val geom = ps.map { case (n, p) => s"${n}_$p" }.mkString("_")
    val store = graft.sources.DatasetCache.getOrBuild(
        sfDir, deps, s"${label}_${geom}_${dp}dp") { path =>
      groupedCuts(df, groupCols, valueCol, ps, dp)
        .write.mode("overwrite").parquet(path)
    }
    spark.read.parquet(store)
  }
}
