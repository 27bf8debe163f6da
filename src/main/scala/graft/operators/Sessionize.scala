package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.PRound

/** Gap-based sessionization (batch form).
  *
  * Classic two-window plan: mark rows whose gap from the previous
  * event (per key) exceeds the timeout, then running-sum the markers
  * to get session ordinals. One shuffle on the key, sorted once; both
  * windows share the same partitioning so Catalyst plans a single
  * Exchange+Sort. The streaming twin (arbitrary-state
  * flatMapGroupsWithState) lives in [[graft.streaming.StreamOps]].
  */
object Sessionize {

  /** Adds `session_id` (1-based per key, by time) to `df`. */
  def assign(df: DataFrame, keyCol: String, tsCol: String, gapSeconds: Long): DataFrame = {
    val byKey = Window.partitionBy(col(keyCol)).orderBy(col(tsCol))
    val gapUs = gapSeconds * 1000000L
    df.withColumn("__prev", lag(col(tsCol), 1).over(byKey))
      .withColumn("__new", when(col("__prev").isNull ||
        unix_micros(col(tsCol)) - unix_micros(col("__prev")) > gapUs, 1).otherwise(0))
      .withColumn("session_id",
        sum(col("__new")).over(byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__prev", "__new")
  }

  /** One row per session: bounds plus event count/value rollup. */
  def sessions(df: DataFrame, keyCol: String, tsCol: String,
               valueCol: String, gapSeconds: Long): DataFrame =
    assign(df, keyCol, tsCol, gapSeconds)
      .groupBy(col(keyCol), col("session_id"))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"),
        PRound.pround(sum(col(valueCol)), 2).as("total_value"))
}
