package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.streaming.StreamOps.Event

/** The native HLL aggregate under Structured Streaming: its 64-byte
  * register buffer must serialize into the streaming state store and
  * keep merging across micro-batches — after any trigger, each
  * window's latest emission equals the batch aggregate over the
  * prefix. This is the windowed approx-distinct a 100 TB event
  * pipeline runs continuously (distinct users per hour), on the
  * oracle-checkable estimator instead of approx_count_distinct's
  * opaque sketch.
  */
class StreamHllSpec extends SparkSpec {
  import spark.implicits._

  import org.apache.spark.sql.GraftBridge.{column, expression}

  private def hllEst(c: Column): Column =
    column(graft.functions.expr.HllEst(expression(c)).toAggregateExpression())

  private def ev(id: Long, sec: Long, user: Long) =
    Event(id, new Timestamp(sec * 1000), user, "view", 1.0)

  private def agg(df: DataFrame): DataFrame =
    df.groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(hllEst(col("user_id").cast("string")).as("nd"))
      .select(col("w.start").as("ws"), col("nd"))

  test("windowed hll_est: stream equals batch after every trigger") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    var latest = Map.empty[Timestamp, Double]
    val q = agg(mem.toDS().toDF()).writeStream
      .outputMode("update")
      .foreachBatch { (df: DataFrame, _: Long) =>
        df.collect().foreach(r =>
          latest = latest.updated(r.getTimestamp(0), r.getDouble(1)))
      }
      .start()
    val batches = Seq(
      Seq(ev(1, 10, 1), ev(2, 60, 2), ev(3, 3700, 1)),          // two windows
      Seq(ev(4, 120, 3), ev(5, 3800, 9), ev(6, 130, 2)),        // both updated
      Seq(ev(7, 200, 14), ev(8, 3900, 9)))                      // dup user in w2
    try {
      var prefix = Seq.empty[Event]
      batches.foreach { b =>
        mem.addData(b: _*); q.processAllAvailable()
        prefix ++= b
        val batch = agg(prefix.toDF())
          .as[(Timestamp, Double)].collect().toMap
        assert(latest == batch, s"after ${prefix.size} events")
      }
    } finally q.stop()
    // small-range sanity: window 1 saw users {1,2,3,14} → ~4
    val w1 = latest(new Timestamp(0L))
    assert(math.abs(w1 - 4.0) < 1.0, s"window-1 estimate $w1")
  }
}
