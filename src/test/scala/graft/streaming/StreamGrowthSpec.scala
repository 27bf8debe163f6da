package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Streaming growth-accounting deltas must SUM to the batch
  * `growth_accounting` table over everything seen so far, after every
  * trigger — including the re-classification retractions a LATE
  * earlier week forces (successor flips retained/resurrected, the
  * user's "new" cell moves, churn cells appear/retract). The batch
  * side runs the EventsQ query shape verbatim (lag/lead windows +
  * horizon-cut churn) so the twin is checked against the engine; the
  * horizon cut is applied at assembly, from the max ACTIVE week the
  * ledger itself shows. */
class StreamGrowthSpec extends graft.SparkSpec {
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
  import spark.implicits._

  private def ts(day: Long) =
    new Timestamp(1704067200000L + day * 86400000L + 43200000L)

  private def ev(id: Long, day: Long, user: Long) =
    StreamOps.Event(id, ts(day), user, "view", 1.0)

  /** The batch growth_accounting shape (EventsQ) on an in-memory set:
    * (wk, cls) → count, churn rows horizon-cut. */
  private def batchCells(evs: Seq[StreamOps.Event]): Map[(Timestamp, String), Long] = {
    val week = expr("INTERVAL 7 DAY")
    val uw = evs.toDS().toDF()
      .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
      .distinct()
    val ord = Window.partitionBy(col("user_id")).orderBy(col("wk"))
    val lab = uw
      .withColumn("prev", lag(col("wk"), 1).over(ord))
      .withColumn("nxt", lead(col("wk"), 1).over(ord))
    val active = lab.select(col("wk"),
      when(col("prev").isNull, lit("new"))
        .when(col("prev") + week === col("wk"), lit("retained"))
        .otherwise(lit("resurrected")).as("cls"))
    val horizon = uw.agg(max(col("wk")).as("hz"))
    val churn = lab
      .filter(col("nxt").isNull || col("nxt") > col("wk") + week)
      .select((col("wk") + week).as("wk"), lit("churned").as("cls"))
      .crossJoin(broadcast(horizon))
      .filter(col("wk") <= col("hz"))
      .select(col("wk"), col("cls"))
    active.unionByName(churn).groupBy(col("wk"), col("cls"))
      .agg(count(lit(1)).as("n"))
      .as[(Timestamp, String, Long)].collect()
      .map { case (w, c, n) => (w, c) -> n }.toMap
  }

  /** Assemble the ledger: sum deltas per cell, drop zeros, cut churn
    * rows past the max active week (the consumer-side horizon). */
  private def assembled(table: String): Map[(Timestamp, String), Long] = {
    val cells = spark.table(table)
      .groupBy(col("wk"), col("cls")).agg(sum(col("d")).as("n"))
      .filter(col("n") =!= 0)
      .as[(Timestamp, String, Long)].collect()
    val horizon = cells.collect { case (w, c, _) if c != "churned" => w.getTime }
      .maxOption.getOrElse(Long.MinValue)
    cells.filter { case (w, c, _) => c != "churned" || w.getTime <= horizon }
      .map { case (w, c, n) => (w, c) -> n }.toMap
  }

  test("sum of deltas ≡ batch growth accounting per trigger, incl. late-week reclassification") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamOps.Event]
    val q = StreamOps.growthStream(mem.toDS())
      .writeStream.format("memory").queryName("growth")
      .outputMode("append").start()
    // t1: user 1 weeks 0,2 (gap → churn@1, resurrected@2);
    //     user 2 week 1 (new; churn@2 beyond... within horizon 2)
    val t1 = Seq(ev(1, 0, 1), ev(2, 15, 1), ev(3, 8, 2))
    // t2: user 3 enters week 3 — horizon moves, user 1's tail churn
    //     (week 3) becomes visible at assembly
    val t2 = Seq(ev(4, 22, 3))
    // t3: LATE gap-fill — user 1 week 1: week 2 flips resurrected →
    //     retained, churn@1 and churn@2... recompute: weeks {0,1,2}
    //     contiguous, so churn cells at 1 and 2 retract; also user 2's
    //     "new" at week 1 is unaffected (different user)
    val t3 = Seq(ev(5, 9, 1))
    try {
      var prefix = Seq.empty[StreamOps.Event]
      for (t <- Seq(t1, t2, t3)) {
        mem.addData(t: _*); q.processAllAvailable()
        prefix ++= t
        assert(assembled("growth") == batchCells(prefix),
          s"after ${prefix.size} events:\n got ${assembled("growth")}\n exp ${batchCells(prefix)}")
      }
      // the late gap-fill genuinely retracted cells
      assert(spark.table("growth").filter(col("d") === -1).count() > 0)
    } finally q.stop()
  }

  test("duplicate weeks emit nothing; first sight emits new + tail churn") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamOps.Event]
    val q = StreamOps.growthStream(mem.toDS())
      .writeStream.format("memory").queryName("growthdup")
      .outputMode("append").start()
    try {
      mem.addData(ev(10, 0, 7), ev(11, 1, 7)); q.processAllAvailable()
      // one active week → cells: (wk0, new) + (wk1, churned)
      assert(spark.table("growthdup").count() == 2)
      mem.addData(ev(12, 2, 7)); q.processAllAvailable()
      assert(spark.table("growthdup").count() == 2) // same week, silent
    } finally q.stop()
  }
}
