package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed prefix sum over a GLOBAL total order.
  *
  * The naive form — `sum(x) over (order by k)` with no partition — is
  * the classic scale-killer: Spark moves EVERYTHING to one task (the
  * "No Partition Defined for Window operation" warning). The two-phase
  * shape here is the textbook distributed scan:
  *
  *  1. range-partition on the sort key (a distributed sort — every
  *     partition holds a contiguous key range, tasks stay parallel);
  *  2. per-partition running sums via a window PARTITIONED BY the
  *     physical partition id (each task scans only its own range);
  *  3. per-partition totals (≤ `spark.sql.shuffle.partitions` rows)
  *     prefix-summed on the driver-sized frame and broadcast back as
  *     offsets.
  *
  * The result is value-identical to the single-task window for any
  * total order (callers must pass a UNIQUE sort key — ties across a
  * partition boundary would otherwise make the per-row prefix
  * ambiguous). The input frame is `Materialize.cut` internally so the
  * partition ids the offsets were computed from are the partition ids
  * the main pass sees (and the ranged sort runs once, not once per
  * consumer); the cut follows the repo-wide lifecycle — released by
  * the runner's cache clear between queries.
  *
  * Scale shape: one range exchange (the distributed sort, inside the
  * cut), one hash exchange on the partition id (the checkpoint erases
  * partitioning metadata, so the window re-clusters — rows barely
  * move, but the exchange is real), and one tiny offsets aggregation
  * whose own prefix scan runs single-partition over ≤
  * `spark.sql.shuffle.partitions` ROWS — partition-count-sized, never
  * data-sized (that is the one SinglePartition stage in the plan, and
  * it is the point: the naive global window puts the whole DATASET
  * there). Skewed key ranges are the range sampler's problem.
  */
object Cumsum {

  /** `df` with an extra `out` column = running sum of `value` over the
    * global order given by `sortCols` (must be a total order — include
    * a unique tiebreaker). `value` should already be an exact type
    * (long / DECIMAL) if the caller needs order-independent sums. */
  def globalRunning(df: DataFrame, sortCols: Seq[Column], value: Column,
                    out: String): DataFrame = {
    require(sortCols.nonEmpty, "globalRunning needs at least one sort column")
    val ranged = Materialize.cut(
      df.repartitionByRange(sortCols: _*)
        .withColumn("__pid", spark_partition_id()))
    val offW = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = ranged.groupBy(col("__pid"))
      .agg(sum(value).as("__psum"))
      .select(col("__pid"),
        coalesce(sum(col("__psum")).over(offW), lit(0) * col("__psum"))
          .as("__off"))
    val inW = Window.partitionBy(col("__pid")).orderBy(sortCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranged.join(broadcast(offs), Seq("__pid"))
      .withColumn(out, sum(value).over(inW) + col("__off"))
      .drop("__pid")
  }
}
