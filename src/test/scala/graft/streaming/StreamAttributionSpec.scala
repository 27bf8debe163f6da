package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.streaming.StreamOps.{AttrOut, Event}

/** Pins attributionStream to its batch twin: after any trigger
  * prefix, the latest emission per purchase equals the
  * attribution_last window over that prefix — including a late touch
  * arriving in a LATER trigger that re-credits an earlier purchase
  * (the Update-mode upsert), equal-timestamp ties resolved by
  * event_id exactly like the batch (ts, event_id) window order, and
  * touch eviction past the lookback horizon keeping the single
  * latest touch (the only one a future purchase can credit).
  */
class StreamAttributionSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000)
  private def touch(id: Long, user: Long, sec: Long, ch: String) =
    Event(id, ts(sec), user, ch, 0.0)
  private def purchase(id: Long, user: Long, sec: Long, v: Double = 1.0) =
    Event(id, ts(sec), user, "purchase", v)

  /** Per-purchase channel via the batch attribution_last window. */
  private def batchAttr(events: Seq[Event]): Map[Long, Option[String]] = {
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    events.toDF()
      .withColumn("channel",
        last(when($"event_type" =!= "purchase", $"event_type"),
          ignoreNulls = true).over(w))
      .filter($"event_type" === "purchase")
      .select($"event_id", $"channel").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getString(1)))).toMap
  }

  private def runStream(batches: Seq[Seq[Event]],
                        lookbackMs: Long): Map[Long, Option[String]] = {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    var latest = Map.empty[Long, Option[String]]
    val q = StreamOps.attributionStream(mem.toDS(), lookbackMs).writeStream
      .outputMode("update")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[AttrOut], _: Long) =>
        df.collect().foreach(o => latest = latest.updated(o.event_id, o.channel))
      }
      .start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    latest
  }

  test("stream equals the batch attribution window after every prefix") {
    val b1 = Seq(touch(100, 1, 10, "view"), touch(101, 1, 20, "click"),
      purchase(1, 1, 30), purchase(2, 2, 5)) // user 2: no touch yet
    val b2 = Seq(touch(102, 2, 3, "email"), purchase(3, 1, 25))
    for (n <- 1 to 2) {
      val prefix = Seq(b1, b2).take(n)
      assert(runStream(prefix, lookbackMs = 1000000000L) ==
        batchAttr(prefix.flatten), s"prefix $n")
    }
  }

  test("a late touch re-credits an earlier purchase (upsert)") {
    val b1 = Seq(touch(100, 1, 10, "view"), purchase(1, 1, 50))
    val b2 = Seq(touch(101, 1, 40, "click")) // later touch, still before
    val got = runStream(Seq(b1, b2), lookbackMs = 1000000000L)
    assert(got == Map(1L -> Some("click")))
    assert(got == batchAttr(b1 ++ b2))
  }

  test("equal-timestamp ties resolve by event_id like the batch window") {
    // touch id 99 < purchase id 100 at the same second: the batch
    // (ts, event_id) order places it BEFORE the purchase → credited;
    // touch id 101 at the same second lands after → not credited
    val b = Seq(touch(99, 1, 30, "view"), purchase(100, 1, 30),
      touch(101, 1, 30, "click"))
    val got = runStream(Seq(b), lookbackMs = 1000000000L)
    assert(got == Map(100L -> Some("view")))
    assert(got == batchAttr(b))
  }

  test("touch eviction keeps the latest sub-horizon touch") {
    val b1 = Seq(touch(100, 1, 0, "view"), touch(101, 1, 5, "click"))
    val b2 = Seq(touch(102, 1, 100, "view")) // advances maxTs, evicts t<90
    val b3 = Seq(purchase(1, 1, 99), purchase(2, 1, 101))
    val all = b1 ++ b2 ++ b3
    val got = runStream(Seq(b1, b2, b3), lookbackMs = 10000L)
    assert(got == batchAttr(all))
    assert(got == Map(1L -> Some("click"), 2L -> Some("view")))
  }
}
