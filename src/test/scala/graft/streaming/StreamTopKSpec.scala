package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.TopK
import graft.streaming.StreamOps.Event

/** Pins the streaming top-k to its batch twin: after every trigger,
  * the latest emission per key must equal TopK.perKey over the full
  * prefix of the stream seen so far. */
class StreamTopKSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Long) = new Timestamp(min * 60000)

  private val batch1 = Seq(
    Event(1, ts(1), 1, "click", 5.0),
    Event(2, ts(2), 1, "click", 9.0),
    Event(3, ts(3), 2, "click", 7.0),
    Event(4, ts(4), 2, "view", 4.0),
    Event(5, ts(5), 3, "view", 4.0)) // tie with id 4 → id asc wins
  private val batch2 = Seq(
    Event(6, ts(6), 1, "click", 8.0),  // displaces id 1 from click top-3? no: k=3, displaces 5.0
    Event(7, ts(7), 3, "click", 1.0),  // below the click top-3 — no change
    Event(8, ts(8), 2, "view", 6.0))   // new view leader

  private def batchTopK(events: Seq[Event], k: Int): Set[(String, Int, Long, Double)] =
    TopK.perKey(events.toDF(), Seq("event_type"), "value", "event_id", k)
      .select(col("event_type"), col("event_id"), col("value"))
      .as[(String, Long, Double)].collect()
      .groupBy(_._1).toSeq
      .flatMap { case (et, rows) =>
        rows.sortBy { case (_, id, v) => (-v, id) }.zipWithIndex
          .map { case ((_, id, v), i) => (et, i + 1, id, v) }.toSeq
      }.toSet

  test("stream top-k equals batch TopK.perKey after every trigger") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    // latest ranking per key, upserted by (event_type, rk) — the
    // Update-mode consumption contract
    var latest = Map.empty[String, Seq[(String, Int, Long, Double)]]
    val q = StreamOps.topKStream(mem.toDS(), k = 3).writeStream
      .outputMode("update")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[StreamOps.Ranked], _: Long) =>
        df.collect().groupBy(_.event_type).foreach { case (et, rows) =>
          latest = latest.updated(et,
            rows.sortBy(_.rk).map(r => (r.event_type, r.rk, r.event_id, r.value)).toSeq)
        }
      }
      .start()
    try {
      mem.addData(batch1: _*)
      q.processAllAvailable()
      assert(latest.values.flatten.toSet == batchTopK(batch1, 3),
        s"after trigger 1: $latest")
      mem.addData(batch2: _*)
      q.processAllAvailable()
      assert(latest.values.flatten.toSet == batchTopK(batch1 ++ batch2, 3),
        s"after trigger 2: $latest")
      // state stayed bounded: every key emitted at most k rows
      assert(latest.values.forall(_.size <= 3))
    } finally q.stop()
  }

  test("a below-threshold arrival does not disturb the ranking") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    var emitted = Vector.empty[StreamOps.Ranked]
    val q = StreamOps.topKStream(mem.toDS(), k = 2).writeStream
      .outputMode("update")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[StreamOps.Ranked], _: Long) =>
        emitted ++= df.collect()
      }
      .start()
    try {
      mem.addData(Event(1, ts(1), 1, "click", 9.0), Event(2, ts(2), 1, "click", 8.0))
      q.processAllAvailable()
      mem.addData(Event(3, ts(3), 1, "click", 1.0)) // below top-2
      q.processAllAvailable()
      val last = emitted.takeRight(2).map(r => (r.rk, r.event_id)).toSet
      assert(last == Set((1, 1L), (2, 2L)), s"emitted: $emitted")
    } finally q.stop()
  }
}
