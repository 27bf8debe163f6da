package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.operators.AsOf
import graft.streaming.StreamOps.{AsOfOut, Event}

/** Pins the streaming NEAREST as-of join to its batch twin: after any
  * prefix of triggers, the latest emission per purchase equals
  * AsOf.joinNearest over that prefix — including a late FORWARD view
  * improving an already-matched purchase (the reach-ahead case that
  * makes nearest finality strictly harder than backward as-of), the
  * strict-distance tie (equal distance → the earlier view), and
  * eviction keeping not-yet-final purchases alive.
  */
class StreamAsOfNearestSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000)
  private def view(id: Long, user: Long, sec: Long, v: Double) =
    Event(id, ts(sec), user, "view", v)
  private def purchase(id: Long, user: Long, sec: Long) =
    Event(id, ts(sec), user, "purchase", 0.0)

  private def batchNearest(events: Seq[Event]): Map[Long, Option[Long]] = {
    val df = events.toDF()
    val p = df.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts")
    val v = df.filter($"event_type" === "view")
      .select($"user_id", $"ts", $"event_id".as("view_event_id"),
        $"value".as("view_value"))
    AsOf.joinNearest(p, v, Seq("user_id"), "ts", "ts",
        Seq("view_event_id", "view_value"))
      .select($"event_id", $"view_event_id").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
  }

  private def runStream(batches: Seq[Seq[Event]],
                        lookbackMs: Long): Map[Long, Option[Long]] = {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    var latest = Map.empty[Long, Option[Long]]
    val q = StreamOps.asofNearestStream(mem.toDS(), lookbackMs).writeStream
      .outputMode("update")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[AsOfOut], _: Long) =>
        df.collect().foreach(o => latest = latest.updated(o.event_id, o.view_event_id))
      }
      .start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    latest
  }

  test("stream equals batch joinNearest after every prefix") {
    // purchase 1: backward view at 10 (d=40) vs forward at 60 (d=10)
    // → forward wins; purchase 2: only a forward view exists
    val b1 = Seq(view(100, 1, 10, 1.0), purchase(1, 1, 50), view(101, 1, 60, 2.0),
      purchase(2, 2, 5), view(102, 2, 30, 3.0))
    val b2 = Seq(view(103, 1, 55, 4.0), purchase(3, 2, 31))
    for (n <- 1 to 2) {
      val prefix = Seq(b1, b2).take(n)
      assert(runStream(prefix, lookbackMs = 1000000000L) ==
        batchNearest(prefix.flatten), s"prefix $n")
    }
  }

  test("equal distance ties to the earlier view, like the batch pick") {
    // views at 40 and 60, purchase at 50: both d=10 → backward (100)
    val b = Seq(view(100, 1, 40, 1.0), view(101, 1, 60, 2.0), purchase(1, 1, 50))
    val got = runStream(Seq(b), lookbackMs = 1000000000L)
    assert(got == Map(1L -> Some(100L)))
    assert(got == batchNearest(b))
  }

  test("a late closer FORWARD view upserts an already-matched purchase") {
    val b1 = Seq(view(100, 1, 10, 1.0), purchase(1, 1, 50)) // matched backward d=40
    val b2 = Seq(view(101, 1, 55, 2.0)) // forward d=5 — closer
    val got = runStream(Seq(b1, b2), lookbackMs = 1000000000L)
    assert(got == Map(1L -> Some(101L)))
    assert(got == batchNearest(b1 ++ b2))
  }

  test("a sub-horizon purchase with a distant match stays pending until final") {
    // lookback 10 s. Purchase 1 at t=5 matches the view at t=0 (d=5);
    // once the horizon reaches 90 it is final (5 < 90-5) and evicted.
    // Purchase 2 at t=95 sits above the horizon, stays pending, and
    // must upsert from the t=100 match (d=5) to the closer late view
    // at t=97 (d=2).
    val b1 = Seq(view(100, 1, 0, 1.0), purchase(1, 1, 5),
      view(101, 1, 60, 2.0), purchase(2, 1, 95))
    val b2 = Seq(view(102, 1, 100, 3.0)) // advances horizon to 90
    val b3 = Seq(view(103, 1, 97, 4.0))  // closer to purchase 2 (d=2)
    val all = b1 ++ b2 ++ b3
    val got = runStream(Seq(b1, b2, b3), lookbackMs = 10000L)
    assert(got == batchNearest(all))
    assert(got(2L) == Some(103L))
  }

  test("matchless purchase gets its first match from a much later view") {
    val b1 = Seq(purchase(1, 1, 5))
    val b2 = Seq(view(100, 1, 300, 1.0)) // first view ever, far forward
    val got = runStream(Seq(b1, b2), lookbackMs = 10000L)
    assert(got == Map(1L -> Some(100L)))
    assert(got == batchNearest(b1 ++ b2))
  }
}
