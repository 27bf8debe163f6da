package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — assigning documents to fixed-budget context
  * windows ("bins") for LLM training, the step between a curated
  * corpus and a token stream. The packing rule is offset-based: docs
  * are laid out in a deterministic order and a doc belongs to the bin
  * where its START offset falls (bin = floor(start / budget)), i.e.
  * contiguous greedy packing where a doc straddling a boundary stays
  * with the bin it started in.
  *
  * Scale shape: one window (cumulative sum) per partition key — pack
  * WITHIN a stratum (language, source shard), never globally: a global
  * ordering would serialize 100 TB through one task. The within-
  * stratum window sorts only each stratum's rows, the same bound as
  * any per-key running total. Deterministic given (partition cols,
  * order col), so an external engine replays bin ids exactly.
  */
object Packing {

  /** Adds `bin`: the 0-based context-window index of each row within
    * its stratum. `sizeCol` is the row's token (or byte) count. */
  def packByBudget(df: DataFrame, partCols: Seq[String], orderCol: String,
                   sizeCol: String, budget: Long, binCol: String = "bin"): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(!df.columns.contains("__graft_start"),
      "input must not contain the reserved column __graft_start")
    require(!df.columns.contains(binCol),
      s"input already has a '$binCol' column — pass a different binCol " +
        "(withColumn would silently overwrite it)")
    val w = Window.partitionBy(partCols.map(col): _*).orderBy(col(orderCol))
    val start: Column = coalesce(
      sum(col(sizeCol)).over(w) - col(sizeCol), lit(0L))
    // integer `div`, not Column `/` (double): offsets at corpus scale
    // approach 2^53 where double division would mis-bucket
    df.withColumn("__graft_start", start.cast("long"))
      .withColumn(binCol, expr(s"__graft_start div ${budget}L"))
      .drop("__graft_start")
  }

  /** Bin-level summary: rows, total size, and fill ratio per
    * (stratum, bin) — the packing-efficiency stats a data loader
    * reads. */
  def binStats(df: DataFrame, partCols: Seq[String], orderCol: String,
               sizeCol: String, budget: Long): DataFrame =
    packByBudget(df, partCols, orderCol, sizeCol, budget)
      .groupBy((partCols :+ "bin").map(col): _*)
      .agg(count(lit(1)).as("n_docs"),
        sum(col(sizeCol)).as("total_size"),
        (sum(col(sizeCol)).cast("double") / budget).as("fill_ratio"))
}
