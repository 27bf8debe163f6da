package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.functions.PRound

/** Streaming time-weighted contributions must equal the batch
  * interval_weighted_avg contribution column over everything seen so
  * far, after every trigger — multiset equality of the 6-dp-rounded
  * (type, wv, dw) rows, the strongest stream ≡ batch form (no sums to
  * hide a swap). */
class StreamTimeWeightedSpec extends graft.SparkSpec {
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000)

  private def batchContribs(evs: Seq[StreamOps.Event]): Seq[(String, Double, Double)] = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    evs.toDS().toDF()
      .select(col("user_id"), col("event_type"), col("event_id"),
        col("value"), unix_micros(col("ts")).as("us"))
      .withColumn("dur_s",
        (lead(col("us"), 1).over(w) - col("us")).cast("double") / 1e6)
      .filter(col("dur_s").isNotNull)
      .select(col("event_type"),
        PRound.pround(col("value") * col("dur_s"), 6).as("wv"),
        PRound.pround(col("dur_s"), 6).as("dw"))
      .as[(String, Double, Double)].collect().toSeq
  }

  test("stream contributions ≡ batch per trigger prefix (multiset)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamOps.Event]
    val q = StreamOps.timeWeightedStream(mem.toDS())
      .writeStream.format("memory").queryName("twstream")
      .outputMode("append").start()
    val t1 = Seq(
      StreamOps.Event(1L, ts(100), 1L, "view", 2.0),
      StreamOps.Event(2L, ts(160), 1L, "click", 4.0),
      StreamOps.Event(3L, ts(100), 2L, "view", 1.0))
    val t2 = Seq(
      StreamOps.Event(4L, ts(220), 1L, "purchase", 9.0), // closes click
      StreamOps.Event(5L, ts(400), 2L, "view", 3.0))     // closes user-2 view
    def streamed(): Seq[(String, Double, Double)] =
      spark.table("twstream").as[(String, Double, Double)].collect().toSeq
    try {
      mem.addData(t1: _*)
      q.processAllAvailable()
      assert(streamed().sorted == batchContribs(t1).sorted)
      assert(streamed().nonEmpty)
      mem.addData(t2: _*)
      q.processAllAvailable()
      assert(streamed().sorted == batchContribs(t1 ++ t2).sorted)
      // the open (last) interval per user is correctly NOT emitted
      assert(streamed().size == 3)
    } finally q.stop()
  }

  test("equal-timestamp events process in event_id order, like the batch sort") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamOps.Event]
    val q = StreamOps.timeWeightedStream(mem.toDS())
      .writeStream.format("memory").queryName("twties")
      .outputMode("append").start()
    val evs = Seq(
      StreamOps.Event(11L, ts(100), 7L, "a", 1.0),
      StreamOps.Event(12L, ts(100), 7L, "b", 2.0), // zero-length interval
      StreamOps.Event(13L, ts(150), 7L, "c", 3.0))
    try {
      mem.addData(evs: _*)
      q.processAllAvailable()
      val got = spark.table("twties").as[(String, Double, Double)]
        .collect().toSeq.sorted
      assert(got == batchContribs(evs).sorted)
      assert(got.contains(("a", 0.0, 0.0))) // the tie's zero-length interval
    } finally q.stop()
  }

  test("equal-ts event arriving a trigger LATE with a smaller id is dropped") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamOps.Event]
    val q = StreamOps.timeWeightedStream(mem.toDS())
      .writeStream.format("memory").queryName("twlate")
      .outputMode("append").start()
    try {
      mem.addData(StreamOps.Event(12L, ts(100), 9L, "b", 2.0))
      q.processAllAvailable()
      // id=11 at the same ts sorts BEFORE the open interval under the
      // batch (us, event_id) order — accepting it would diverge from
      // the batch attribution, so the contract drops it
      mem.addData(StreamOps.Event(11L, ts(100), 9L, "a", 1.0),
        StreamOps.Event(13L, ts(150), 9L, "c", 3.0))
      q.processAllAvailable()
      val got = spark.table("twlate").as[(String, Double, Double)]
        .collect().toSeq.sorted
      assert(got == Seq(("b", 100.0, 50.0)).map(t => (t._1, t._2, t._3)))
    } finally q.stop()
  }
}
