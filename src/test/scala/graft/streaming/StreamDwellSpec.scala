package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.functions.PRound

/** Streaming dwell gaps must equal the batch events_dwell gap column
  * over everything seen so far, after every trigger — multiset
  * equality of the (type, gap_s) rows (VERDICT r10 #6: the
  * watermark-free single-open-interval twin), and the aggregated
  * per-type profile (n, p50, p95) must match the batch query's shape
  * computed over the same gaps. */
class StreamDwellSpec extends graft.SparkSpec {
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000)

  private def batchGaps(evs: Seq[StreamOps.Event]): Seq[(String, Double)] = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    evs.toDS().toDF()
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("us"))
      .withColumn("gap_s",
        (lead(col("us"), 1).over(w) - col("us")).cast("double") / 1e6)
      .filter(col("gap_s").isNotNull)
      .select(col("event_type"), col("gap_s"))
      .as[(String, Double)].collect().toSeq
  }

  test("stream gaps ≡ batch per trigger prefix; open intervals not emitted") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamOps.Event]
    val q = StreamOps.dwellStream(mem.toDS())
      .writeStream.format("memory").queryName("dwellstream")
      .outputMode("append").start()
    val t1 = Seq(
      StreamOps.Event(1L, ts(100), 1L, "view", 0.0),
      StreamOps.Event(2L, ts(160), 1L, "click", 0.0),
      StreamOps.Event(3L, ts(100), 2L, "view", 0.0))
    val t2 = Seq(
      StreamOps.Event(4L, ts(220), 1L, "purchase", 0.0), // closes click
      StreamOps.Event(5L, ts(400), 2L, "view", 0.0))     // closes user-2 view
    def streamed(): Seq[(String, Double)] =
      spark.table("dwellstream").as[(String, Double)].collect().toSeq
    try {
      mem.addData(t1: _*)
      q.processAllAvailable()
      assert(streamed().sorted == batchGaps(t1).sorted)
      assert(streamed() == Seq(("view", 60.0))) // user-1 view→click
      mem.addData(t2: _*)
      q.processAllAvailable()
      assert(streamed().sorted == batchGaps(t1 ++ t2).sorted)
      assert(streamed().size == 3) // the last event per user stays open
    } finally q.stop()
  }

  test("aggregated gaps reproduce the batch dwell profile (n, p50, p95)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamOps.Event]
    val q = StreamOps.dwellStream(mem.toDS())
      .writeStream.format("memory").queryName("dwellprof")
      .outputMode("append").start()
    val evs = Seq(
      StreamOps.Event(1L, ts(0), 1L, "view", 0.0),
      StreamOps.Event(2L, ts(10), 1L, "view", 0.0),
      StreamOps.Event(3L, ts(40), 1L, "view", 0.0),
      StreamOps.Event(4L, ts(0), 2L, "view", 0.0),
      StreamOps.Event(5L, ts(100), 2L, "view", 0.0))
    try {
      mem.addData(evs: _*)
      q.processAllAvailable()
      def profile(df: org.apache.spark.sql.DataFrame) = df
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          PRound.pround(expr("percentile(gap_s, 0.5)"), 3).as("p50_s"),
          PRound.pround(expr("percentile(gap_s, 0.95)"), 3).as("p95_s"))
        .as[(String, Long, Double, Double)].collect().toSet
      val got = profile(spark.table("dwellprof"))
      val want = profile(batchGaps(evs).toDF("event_type", "gap_s"))
      assert(got == want)
      // gaps: user1 10,30; user2 100 → p50 = 30, p95 = 30+0.9·70 = 93
      assert(got == Set(("view", 3L, 30.0, 93.0)))
    } finally q.stop()
  }

  test("equal-ts event arriving a trigger late with a smaller id is dropped") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamOps.Event]
    val q = StreamOps.dwellStream(mem.toDS())
      .writeStream.format("memory").queryName("dwelllate")
      .outputMode("append").start()
    try {
      mem.addData(StreamOps.Event(12L, ts(100), 9L, "b", 0.0))
      q.processAllAvailable()
      mem.addData(StreamOps.Event(11L, ts(100), 9L, "a", 0.0),
        StreamOps.Event(13L, ts(150), 9L, "c", 0.0))
      q.processAllAvailable()
      val got = spark.table("dwelllate").as[(String, Double)].collect().toSeq
      assert(got == Seq(("b", 50.0))) // the stale id=11 never opened
    } finally q.stop()
  }
}
