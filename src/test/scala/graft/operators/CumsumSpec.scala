package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pins Cumsum.globalRunning's contract: value-identical to the
  * single-task global window for any total order, under any input
  * partitioning, with no single-partition stage in the plan. */
class CumsumSpec extends SparkSpec {
  import spark.implicits._

  private def reference(rows: Seq[(Long, Long)]): Map[Long, Long] = {
    val w = Window.orderBy(col("v").desc, col("k"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rows.toDF("k", "v").withColumn("cum", sum(col("v")).over(w))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
  }

  private def twoPhase(rows: Seq[(Long, Long)], parts: Int): Map[Long, Long] = {
    val df = rows.toDF("k", "v").repartition(parts)
    Cumsum.globalRunning(df, Seq(col("v").desc, col("k")), col("v"), "cum")
      .select(col("k"), col("cum")).as[(Long, Long)].collect().toMap
  }

  test("two-phase cumsum equals the single-task window, any partitioning") {
    // ties in v (the 40s and 10s) are broken by k — a total order, so
    // the prefix at every row is unambiguous
    val rows = (1L to 97L).map(k => k -> (k * 7919L % 50L))
    val ref = reference(rows)
    assert(twoPhase(rows, 1) == ref)
    assert(twoPhase(rows, 4) == ref)
    assert(twoPhase(rows, 13) == ref)
  }

  test("data window is pid-partitioned; only the tiny offsets frame collapses") {
    val df = (1L to 50L).toDF("k").withColumn("v", col("k") % 7L)
    val p = Cumsum.globalRunning(df, Seq(col("v").desc, col("k")),
      col("v"), "cum").queryExecution.executedPlan.toString
    // the DATA-sized window runs per partition id — parallel tasks
    assert(p.contains("windowspecdefinition(__pid"), s"\n$p")
    // exactly one SinglePartition stage, and it sits directly above
    // the pid-keyed totals aggregate (≤ shuffle-partitions rows) —
    // the naive formulation would put the whole dataset there
    assert("Exchange SinglePartition".r.findAllIn(p).size == 1, s"\n$p")
    assert(
      "Exchange SinglePartition[^\\n]*\\n[^\\n]*HashAggregate\\(keys=\\[__pid"
        .r.findFirstIn(p).isDefined, s"\n$p")
  }

  test("DECIMAL values stay exact through offsets + per-partition sums") {
    // abc_parts' type: the offset addition and the window sum must not
    // change scale/precision semantics vs the single-task window
    val rows = (1L to 61L).map(k => (k, BigDecimal(k * 37 % 13) + BigDecimal("0.4100")))
    val df = rows.toDF("k", "v")
      .select(col("k"), col("v").cast("decimal(18,4)").as("v"))
      .repartition(5)
    val w = Window.orderBy(col("v").desc, col("k"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ref = df.withColumn("cum", sum(col("v")).over(w))
      .select(col("k"), col("cum").cast("string"))
      .as[(Long, String)].collect().toMap
    val got = Cumsum.globalRunning(df, Seq(col("v").desc, col("k")),
        col("v"), "cum")
      .select(col("k"), col("cum").cast("string"))
      .as[(Long, String)].collect().toMap
    assert(got == ref)
  }

  test("empty input yields an empty frame, not a crash") {
    val df = Seq.empty[(Long, Long)].toDF("k", "v")
    assert(Cumsum.globalRunning(df, Seq(col("k")), col("v"), "cum")
      .count() == 0)
  }
}
