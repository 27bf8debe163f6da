package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.operators.Merge
import graft.streaming.StreamOps.{Change, KeyState}

/** Pins the streaming CDC apply to its batch twin: after any prefix,
  * the latest non-tombstone emission per key equals Merge.cdcApply of
  * the prefix log over an empty snapshot — including out-of-order
  * delivery across micro-batches. */
class StreamCdcSpec extends SparkSpec {
  import spark.implicits._

  private def batchState(log: Seq[Change]): Map[Long, String] = {
    val empty = Seq.empty[(Long, String)].toDF("k", "v")
    Merge.cdcApply(empty, log.toDF(), Seq("k"), "seq", "op")
      .as[(Long, String)].collect().toMap
  }

  private def runStream(batches: Seq[Seq[Change]]): Map[Long, KeyState] = {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Change]
    var latest = Map.empty[Long, KeyState]
    val q = StreamOps.cdcApplyStream(mem.toDS()).writeStream
      .outputMode("update")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[KeyState], _: Long) =>
        df.collect().foreach(s => latest = latest.updated(s.k, s))
      }
      .start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    latest
  }

  private def live(m: Map[Long, KeyState]): Map[Long, String] =
    m.collect { case (k, s) if !s.deleted => k -> s.v }

  test("stream state equals batch cdcApply after every prefix") {
    val b1 = Seq(Change(1, "a", 1, "I"), Change(2, "b", 1, "I"),
      Change(1, "a2", 2, "U"))
    val b2 = Seq(Change(2, "", 2, "D"), Change(3, "c", 1, "I"),
      Change(2, "b2", 3, "I")) // delete then re-insert, same batch
    val got = runStream(Seq(b1, b2))
    assert(live(got) == batchState(b1 ++ b2))
    assert(live(got) == Map(1L -> "a2", 2L -> "b2", 3L -> "c"))
  }

  test("out-of-order redelivery across batches converges to the batch answer") {
    val all = Seq(Change(1, "v1", 1, "I"), Change(1, "v3", 3, "U"),
      Change(1, "v2", 2, "U"))
    // v2 arrives AFTER v3 (a later trigger) and must be ignored
    val got = runStream(Seq(Seq(all(0), all(1)), Seq(all(2))))
    assert(live(got) == batchState(all))
    assert(live(got) == Map(1L -> "v3"))
  }

  test("a tombstone is emitted for deletes and drops from the live view") {
    val got = runStream(Seq(Seq(Change(1, "a", 1, "I")),
      Seq(Change(1, "", 2, "D"))))
    assert(got(1L).deleted)
    assert(live(got).isEmpty)
    assert(batchState(Seq(Change(1, "a", 1, "I"), Change(1, "", 2, "D"))).isEmpty)
  }
}
