package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.operators.AsOf
import graft.streaming.StreamOps.{AsOfOut, Event}

/** Pins the streaming as-of join to its batch twin: after any prefix
  * of triggers, the latest emission per purchase equals
  * AsOf.join over that prefix — including a late view arriving in a
  * LATER trigger that improves an earlier purchase's match (the
  * Update-mode upsert), and right-state eviction past the lookback
  * horizon keeping the latest sub-horizon view.
  */
class StreamAsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000)
  private def view(id: Long, user: Long, sec: Long, v: Double) =
    Event(id, ts(sec), user, "view", v)
  private def purchase(id: Long, user: Long, sec: Long) =
    Event(id, ts(sec), user, "purchase", 0.0)

  private def batchAsOf(events: Seq[Event]): Map[Long, Option[Long]] = {
    val df = events.toDF()
    val p = df.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts")
    val v = df.filter($"event_type" === "view")
      .select($"user_id", $"ts", $"event_id".as("view_event_id"),
        $"value".as("view_value"))
    AsOf.join(p, v, Seq("user_id"), "ts", "ts",
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
    val q = StreamOps.asofStream(mem.toDS(), lookbackMs).writeStream
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

  test("stream equals batch AsOf.join after every prefix") {
    val b1 = Seq(view(100, 1, 10, 1.0), purchase(1, 1, 50),
      view(101, 2, 5, 2.0), purchase(2, 2, 4)) // purchase 2 precedes its view
    val b2 = Seq(view(102, 1, 45, 3.0), purchase(3, 2, 6))
    for (n <- 1 to 2) {
      val prefix = Seq(b1, b2).take(n)
      assert(runStream(prefix, lookbackMs = 1000000000L) ==
        batchAsOf(prefix.flatten), s"prefix $n")
    }
  }

  test("a late view in a later trigger upserts an earlier purchase's match") {
    val b1 = Seq(view(100, 1, 10, 1.0), purchase(1, 1, 50))
    val b2 = Seq(view(101, 1, 40, 2.0)) // late but closer to the purchase
    val got = runStream(Seq(b1, b2), lookbackMs = 1000000000L)
    assert(got == Map(1L -> Some(101L)))
    assert(got == batchAsOf(b1 ++ b2))
  }

  test("right eviction keeps the latest sub-horizon view (backward reach survives)") {
    // lookback 10 s; views at t=0/5 fall below the horizon once t=100
    // arrives — the latest (t=5) must survive eviction to match the
    // final purchase, like the batch join over the full log
    val b1 = Seq(view(100, 1, 0, 1.0), view(101, 1, 5, 2.0))
    val b2 = Seq(view(102, 1, 100, 3.0)) // advances maxTs, evicts t<90
    val b3 = Seq(purchase(1, 1, 99), purchase(2, 1, 101))
    val all = b1 ++ b2 ++ b3
    val got = runStream(Seq(b1, b2, b3), lookbackMs = 10000L)
    assert(got == batchAsOf(all))
    assert(got == Map(1L -> Some(101L), 2L -> Some(102L)))
  }

  test("only new or changed lefts emit per trigger (delta output volume)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val emitted = scala.collection.mutable.ArrayBuffer[(Long, Option[Long])]()
    val q = StreamOps.asofStream(mem.toDS(), 1000000000L).writeStream
      .outputMode("update")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[AsOfOut], _: Long) =>
        df.collect().foreach(o => emitted += (o.event_id -> o.view_event_id))
      }
      .start()
    try {
      mem.addData(view(100, 1, 10, 1.0), purchase(1, 1, 50), purchase(2, 1, 20))
      q.processAllAvailable()
      // both purchases emit once on arrival
      assert(emitted.toSet == Set(1L -> Some(100L), 2L -> Some(100L))
        && emitted.size == 2)
      // improves ONLY purchase 1 (ts 40 > purchase 2's ts 20)
      mem.addData(view(101, 1, 40, 2.0)); q.processAllAvailable()
      assert(emitted.size == 3 && emitted.last == (1L -> Some(101L)))
      // changes NEITHER match (ts 5 is older than both current views)
      mem.addData(view(102, 1, 5, 0.5)); q.processAllAvailable()
      assert(emitted.size == 3, s"unchanged lefts must not re-emit: $emitted")
    } finally q.stop()
  }

  test("a purchase with no view at-or-before it emits a null match") {
    val got = runStream(Seq(Seq(purchase(1, 1, 10), view(100, 1, 20, 1.0))),
      lookbackMs = 1000000000L)
    assert(got == Map(1L -> None))
  }
}
