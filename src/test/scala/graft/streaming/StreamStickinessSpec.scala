package graft.streaming

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.streaming.StreamOps.Event

/** The rolling-MAU twin (VERDICT r11 #3): the batch
  * `dau_mau_stickiness` computes a 28-day rolling HLL as a window MAX
  * over per-day register frames; the stream expresses the same union
  * as a sliding event-time window. The contract pinned here: after
  * EVERY trigger, the stream's latest per-(day, bucket) register
  * state equals the batch rolling-register frame over the prefix
  * (bit-for-bit — same md5 slices via Sketch.hllBucketRank), and the
  * harmonic estimate assembled from that state equals the batch
  * estimate. */
class StreamStickinessSpec extends SparkSpec {
  import spark.implicits._

  private val DayMs = 86400L * 1000

  private def ev(id: Long, day: Int, user: Long) =
    Event(id, new Timestamp(day * DayMs + 3600 * 1000), user, "view", 1.0)

  /** Batch rolling registers over a prefix — the dau_mau_stickiness
    * register stage verbatim (spine-densified window max), keyed
    * (d, b) → reg28, null-reg spine rows dropped (the stream has no
    * row where no event contributed). */
  private def batchRoll(prefix: Seq[Event]): Map[(Date, Long), Int] = {
    val ev = prefix.toDF().select(to_date(col("ts")).as("d"), col("user_id"))
    val daily = graft.operators.Sketch.hllRegistersGrouped(
      ev, Seq("d"), "user_id")
    val spine = ev.agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
      .select(explode(sequence(col("d0"), col("d1"))).as("d"))
      .crossJoin(spark.range(64).select(col("id").as("b")))
    val w = Window.partitionBy(col("b"))
      .orderBy(datediff(col("d"), to_date(lit("1990-01-01"))))
      .rangeBetween(-27, 0)
    spine.join(daily, Seq("d", "b"), "left")
      .withColumn("reg28", max(col("reg")).over(w))
      .filter(col("reg28").isNotNull)
      .select(col("d"), col("b"), col("reg28"))
      .collect().map(r => (r.getDate(0), r.getLong(1)) -> r.getInt(2)).toMap
  }

  private def estimate(regs: Iterable[Int]): Double = {
    val used = regs.size
    val s = regs.map(r => math.pow(2.0, -r)).sum
    0.709 * 64 * 64 / (s + (64 - used))
  }

  test("sliding-window register stream ≡ batch rolling registers per trigger") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    var state = Map.empty[(Date, Long), Int]
    val q = StreamOps.stickinessStream(mem.toDS().toDF()).writeStream
      .outputMode("update")
      .foreachBatch { (df: DataFrame, _: Long) =>
        df.collect().foreach(r =>
          state = state.updated((r.getDate(0), r.getLong(1)), r.getInt(2)))
      }
      .start()
    // three triggers spanning > 28 days so the rolling union actually
    // drops old users: users 1-4 early, churn at day 30, rebound later
    val batches = Seq(
      (1 to 8).map(i => ev(i, day = i % 3, user = i % 4 + 1)),
      Seq(ev(9, 29, 10), ev(10, 30, 11), ev(11, 30, 1)),
      Seq(ev(12, 33, 12), ev(13, 34, 4), ev(14, 34, 13)))
    try {
      var prefix = Seq.empty[Event]
      batches.foreach { b =>
        mem.addData(b: _*); q.processAllAvailable()
        prefix ++= b
        val expect = batchRoll(prefix)
        val lastDay = expect.keys.map(_._1.toLocalDate).max
        // the stream also holds windows ENDING AFTER the last observed
        // day (old users still inside a trailing window) — the batch
        // frame stops at the last day, so compare on its domain
        val got = state.filter { case ((d, _), _) =>
          !d.toLocalDate.isAfter(lastDay) }
        assert(got == expect, s"after ${prefix.size} events")
        // assembled per-day MAU estimate matches the batch harmonic
        // fold over the same registers
        for (d <- expect.keys.map(_._1).toSeq.distinct) {
          val e = estimate(expect.collect { case ((`d`, _), r) => r })
          val g = estimate(got.collect { case ((`d`, _), r) => r })
          assert(math.abs(e - g) < 1e-12, s"estimate day $d")
        }
      }
    } finally q.stop()
    // churn sanity: the day-34 window (days 7-34) no longer holds the
    // day-0..2 cohort — users {2,3} churned, so its register set is
    // strictly smaller than the all-history union's (md5 buckets are
    // deterministic; 6 live users vs 8 ever-seen, no collisions)
    val d34 = Date.valueOf(java.time.LocalDate.ofEpochDay(34))
    val rollEnd = state.collect { case ((`d34`, _), r) => r }
    assert(rollEnd.nonEmpty && rollEnd.size < 8,
      s"day-34 window holds ${rollEnd.size} registers — expected fewer " +
        "than the 8-user history union (users 2 and 3 churned)")
  }
}
