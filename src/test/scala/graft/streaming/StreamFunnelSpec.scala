package graft.streaming

import java.sql.Timestamp

/** funnelStream must equal a naive batch recomputation of the ordered
  * funnel after EVERY trigger, under out-of-order delivery — incl.
  * the trap a naive 3-timestamp state falls into: a late EARLIER view
  * that makes a previously-ineligible click count. */
class StreamFunnelSpec extends graft.SparkSpec {
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
  import spark.implicits._
  import StreamOps.{Event, UserFunnel}

  private def ev(id: Long, min: Long, user: Long, typ: String) =
    Event(id, new Timestamp(min * 60000L), user, typ, 1.0)

  /** Naive full recomputation of (t1, t2, t3) per user. */
  private def batchFunnel(events: Seq[Event]): Map[Long, (Option[Long], Option[Long], Option[Long])] =
    events.groupBy(_.user_id).map { case (u, es) =>
      val ts = (t: String) => es.filter(_.event_type == t).map(_.ts.getTime)
      val t1 = ts("view").minOption
      val t2 = t1.flatMap(a => ts("click").filter(_ > a).minOption)
      val t3 = t2.flatMap(b => ts("purchase").filter(_ > b).minOption)
      u -> (t1, t2, t3)
    }

  test("stream funnel equals batch after every trigger, out-of-order included") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = StreamOps.funnelStream(mem.toDS())
      .writeStream.format("memory").queryName("sfunnel")
      .outputMode("update").start()

    def current(): Map[Long, (Option[Long], Option[Long], Option[Long])] =
      spark.table("sfunnel").as[UserFunnel].collect()
        .groupBy(_.user_id).map { case (u, rows) =>
          // Update mode appends a row per trigger — latest wins; rows
          // within one batch are per-user unique
          val last = rows.last
          u -> (last.t1.map(_.getTime), last.t2.map(_.getTime),
            last.t3.map(_.getTime))
        }

    // trigger 1: click BEFORE any view — no funnel progress beyond 0
    val b1 = Seq(ev(1, 10, 1, "click"), ev(2, 30, 1, "view"),
      ev(3, 5, 2, "view"), ev(4, 9, 2, "purchase"))
    // trigger 2: the late EARLIER view (t=2) makes user 1's click at
    // t=10 eligible; user 2's click at 7 slots between view and the
    // already-seen purchase at 9 → full funnel
    val b2 = Seq(ev(5, 2, 1, "view"), ev(6, 7, 2, "click"))
    // trigger 3: an even earlier click does NOT beat the recorded t2
    // for user 1 (still > t1 required), and a later view changes nothing
    val b3 = Seq(ev(7, 1, 1, "click"), ev(8, 50, 2, "view"))

    try {
      var seen = Seq.empty[Event]
      for (batch <- Seq(b1, b2, b3)) {
        mem.addData(batch: _*)
        q.processAllAvailable()
        seen ++= batch
        val expected = batchFunnel(seen)
        val got = current()
        assert(got == expected, s"\ngot $got\nexpected $expected")
      }
      // end state: user 1 reached step 2 via the late view
      // (t1=2, t2=10), user 2 completed the funnel (5 < 7 < 9)
      val fin = current()
      assert(fin(1L) == (Some(2 * 60000L), Some(10 * 60000L), None))
      assert(fin(2L) == (Some(5 * 60000L), Some(7 * 60000L), Some(9 * 60000L)))
    } finally q.stop()
  }
}
