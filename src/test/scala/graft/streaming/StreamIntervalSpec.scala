package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.streaming.StreamOps.{ActiveDay, Interval}

/** Pins the streaming interval sweep to the batch +1/−1 formulation:
  * over any prefix closed by the advancing start horizon, (day, net,
  * n_active) must equal the batch endpoint-delta aggregation +
  * cumulative window on the same intervals. */
class StreamIntervalSpec extends SparkSpec {
  import spark.implicits._

  private def batchSweep(ivs: Seq[Interval]): Seq[(Int, Long, Long)] = {
    val deltas = ivs.toDF()
      .select(explode(array(
        struct(col("start_day").as("d"), lit(1L).as("delta")),
        struct(col("end_day").as("d"), lit(-1L).as("delta")))).as("e"))
      .select(col("e.d").as("d"), col("e.delta").as("delta"))
      .groupBy(col("d")).agg(sum(col("delta")).as("net"))
    val w = Window.orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    deltas.withColumn("n_active", sum(col("net")).over(w))
      .orderBy(col("d")).as[(Int, Long, Long)].collect().toSeq
  }

  // intervals in non-decreasing start order (the feed contract);
  // overlaps, a same-day start/end pair, and a gap between days
  private val batch1 = Seq(
    Interval(1, 10, 13), Interval(2, 10, 11), Interval(3, 12, 20))
  private val batch2 = Seq(
    Interval(4, 14, 15), Interval(5, 14, 14), Interval(6, 18, 22))
  private val sentinel = Seq(Interval(99, 1000, 1000))

  test("stream sweep equals the batch endpoint formulation once flushed") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Interval]
    var emitted = Vector.empty[ActiveDay]
    val q = StreamOps.intervalActiveStream(mem.toDS()).writeStream
      .outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[ActiveDay], _: Long) =>
        emitted ++= df.collect()
      }
      .start()
    try {
      mem.addData(batch1: _*)
      q.processAllAvailable()
      // only days below the horizon (max start = 12) may be out
      assert(emitted.forall(_.day < 12), s"emitted past horizon: $emitted")
      // emissions so far are a PREFIX of the final answer
      val partial = emitted.map(a => (a.day, a.net, a.n_active))
      mem.addData(batch2: _*)
      q.processAllAvailable()
      mem.addData(sentinel: _*)
      q.processAllAvailable()
      val got = emitted.map(a => (a.day, a.net, a.n_active))
      assert(got.take(partial.size) == partial, "later triggers must not rewrite history")
      // drop the sentinel's own zero-net day if present, then compare
      val expected = batchSweep(batch1 ++ batch2)
      assert(got.filter(_._1 < 1000) == expected,
        s"\nstream: $got\nbatch:  $expected")
      // append order is day order
      assert(got.map(_._1) == got.map(_._1).sorted)
    } finally q.stop()
  }

  test("state holds only the open horizon") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Interval]
    var emitted = Vector.empty[ActiveDay]
    val q = StreamOps.intervalActiveStream(mem.toDS()).writeStream
      .outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[ActiveDay], _: Long) =>
        emitted ++= df.collect()
      }
      .start()
    try {
      // a long stream of short intervals: every horizon advance
      // flushes — emissions track input size, not state growth
      (0 until 50).foreach { i => mem.addData(Interval(i, i, i + 2)) }
      q.processAllAvailable()
      assert(emitted.size >= 48, s"only ${emitted.size} days emitted")
      assert(emitted.map(_.day) == emitted.map(_.day).sorted)
    } finally q.stop()
  }
}
