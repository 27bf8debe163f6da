package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.functions._

/** Streaming retention deltas must SUM to the batch events_retention
  * matrix over everything seen so far, after every trigger — the
  * running-ledger stream ≡ batch contract, including the re-basing
  * retraction when a late event predates a user's cohort week. The
  * batch side is computed with Spark's own date_trunc("week"), so the
  * twin's epoch-ms Monday truncation is checked against the engine,
  * not against itself. */
class StreamRetentionSpec extends graft.SparkSpec {
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
  import spark.implicits._

  // days relative to 2024-01-01 (a Monday), at noon — week boundaries
  // land cleanly and the Monday alignment is non-trivial
  private def ts(day: Long) =
    new Timestamp(1704067200000L + day * 86400000L + 43200000L)

  private def ev(id: Long, day: Long, user: Long) =
    StreamOps.Event(id, ts(day), user, "view", 1.0)

  /** The batch events_retention shape (EventsQ) on an in-memory set. */
  private def batchMatrix(evs: Seq[StreamOps.Event]): Map[(Timestamp, Long), Long] = {
    val base = evs.toDS().toDF()
      .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
    val first = base.groupBy(col("user_id")).agg(min(col("wk")).as("cohort"))
    base.distinct().join(first, Seq("user_id"))
      .select(col("cohort"),
        floor((col("wk").cast("long") - col("cohort").cast("long")) /
          lit(604800L)).as("week_offset"))
      .groupBy(col("cohort"), col("week_offset"))
      .agg(count(lit(1)).as("n_users"))
      .as[(Timestamp, Long, Long)].collect()
      .map { case (c, o, n) => (c, o) -> n }.toMap
  }

  private def summed(table: String): Map[(Timestamp, Long), Long] =
    spark.table(table)
      .groupBy(col("cohort"), col("week_offset"))
      .agg(sum(col("delta")).as("n"))
      .filter(col("n") =!= 0)
      .as[(Timestamp, Long, Long)].collect()
      .map { case (c, o, n) => (c, o) -> n }.toMap

  test("sum of deltas ≡ batch matrix per trigger prefix, incl. cohort re-base") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamOps.Event]
    val q = StreamOps.retentionStream(mem.toDS())
      .writeStream.format("memory").queryName("retstream")
      .outputMode("append").start()
    // t1: user 1 active weeks 0 and 2; user 2 active week 1
    val t1 = Seq(ev(1, 0, 1), ev(2, 15, 1), ev(3, 8, 2))
    // t2: user 1 re-surfaces in week 1 (gap fill, no re-base);
    //     user 3 appears in week 0
    val t2 = Seq(ev(4, 9, 1), ev(5, 2, 3))
    // t3: LATE event for user 2 in week 0 — EARLIER than their
    // current cohort (week 1): the re-base retraction case
    val t3 = Seq(ev(6, 1, 2))
    try {
      mem.addData(t1: _*)
      q.processAllAvailable()
      assert(summed("retstream") == batchMatrix(t1))
      mem.addData(t2: _*)
      q.processAllAvailable()
      assert(summed("retstream") == batchMatrix(t1 ++ t2))
      mem.addData(t3: _*)
      q.processAllAvailable()
      assert(summed("retstream") == batchMatrix(t1 ++ t2 ++ t3))
      // the re-base actually retracted something (raw ledger has a -1)
      assert(spark.table("retstream").filter(col("delta") === -1).count() > 0)
    } finally q.stop()
  }

  test("duplicate weeks within and across triggers emit nothing new") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamOps.Event]
    val q = StreamOps.retentionStream(mem.toDS())
      .writeStream.format("memory").queryName("retdup")
      .outputMode("append").start()
    val t1 = Seq(ev(10, 0, 7), ev(11, 1, 7)) // same week twice in-trigger
    val t2 = Seq(ev(12, 2, 7))               // same week again next trigger
    try {
      mem.addData(t1: _*)
      q.processAllAvailable()
      assert(spark.table("retdup").count() == 1) // one (cohort, 0, +1)
      mem.addData(t2: _*)
      q.processAllAvailable()
      assert(spark.table("retdup").count() == 1) // still just the one delta
      assert(summed("retdup") == batchMatrix(t1 ++ t2))
    } finally q.stop()
  }
}
