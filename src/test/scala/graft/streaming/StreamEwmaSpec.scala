package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.streaming.StreamOps.{DailyCount, EwmaOut}

/** Pins the streaming EWMA to the batch ewma_smooth formula: after
  * any trigger split, each emitted y equals Σ2ⁱxᵢ/Σ2ⁱ over the
  * series-so-far (the adjusted-EWMA closed form the batch query
  * computes), including rows delivered out of order INSIDE a trigger.
  */
class StreamEwmaSpec extends SparkSpec {
  import spark.implicits._

  private def closedForm(xs: Seq[Long]): Seq[Double] =
    (1 to xs.size).map { t =>
      val num = (1 to t).map(i => math.pow(2.0, i) * xs(i - 1)).sum
      val den = (1 to t).map(i => math.pow(2.0, i)).sum
      num / den
    }

  private def runStream(batches: Seq[Seq[DailyCount]]): Seq[EwmaOut] = {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[DailyCount]
    val got = scala.collection.mutable.ArrayBuffer.empty[EwmaOut]
    val q = StreamOps.ewmaStream(mem.toDS()).writeStream
      .outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[EwmaOut], _: Long) =>
        got ++= df.collect(); ()
      }
      .start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    got.toSeq
  }

  test("stream EWMA equals the batch closed form across trigger splits") {
    val xs = Seq(10L, 4L, 7L, 7L, 0L, 30L)
    val rows = xs.zipWithIndex.map { case (x, i) => DailyCount("view", i + 1, x) }
    // split mid-series; second trigger delivers its rows out of order
    val got = runStream(Seq(rows.take(3), Seq(rows(4), rows(3), rows(5))))
      .sortBy(_.day)
    assert(got.map(_.day) == (1 to 6))
    got.map(_.ewma).zip(closedForm(xs)).foreach { case (g, w) =>
      assert(math.abs(g - w) < 1e-9, s"$g vs $w")
    }
  }

  private def runCusum(batches: Seq[Seq[DailyCount]],
                       ref: Map[String, (Double, Double)]): Seq[StreamOps.CusumOut] = {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[DailyCount]
    val got = scala.collection.mutable.ArrayBuffer.empty[StreamOps.CusumOut]
    val q = StreamOps.cusumStream(mem.toDS(), ref).writeStream
      .outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[StreamOps.CusumOut], _: Long) =>
        got ++= df.collect(); ()
      }
      .start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    got.toSeq
  }

  test("stream CUSUM equals the batch running-sum-minus-running-min form") {
    val xs = Seq(10L, 11L, 9L, 30L, 32L, 31L) // level shift at day 4
    val mu = 10.0; val sigma = 1.0
    val rows = xs.zipWithIndex.map { case (x, i) => DailyCount("view", i + 1, x) }
    val got = runCusum(Seq(rows.take(2), rows.drop(2)),
      Map("view" -> (mu, sigma))).sortBy(_.day)
    // batch replay: srun_t = Σ(x−μ), cusum_t = srun_t − min_{i≤t} srun_i
    var srun = 0.0; var smin = Double.MaxValue
    val want = xs.map { x =>
      srun += x - mu; smin = math.min(smin, srun); srun - smin
    }
    assert(got.map(_.cusum) == want)
    assert(got.map(_.alarm) == want.map(_ > 3 * sigma))
    assert(got.map(_.alarm) == Seq(false, false, false, true, true, true))
  }

  test("a key with no reference never alarms") {
    val got = runCusum(Seq(Seq(DailyCount("mystery", 1, 1000L))), Map.empty)
    assert(got.map(_.alarm) == Seq(false))
  }

  test("keys hold independent state") {
    val a = Seq(DailyCount("a", 1, 8L), DailyCount("a", 2, 0L))
    val b = Seq(DailyCount("b", 1, 2L))
    val got = runStream(Seq(a ++ b))
    val byKey = got.groupBy(_.event_type)
    assert(byKey("a").sortBy(_.day).map(_.ewma) == closedForm(Seq(8L, 0L)))
    assert(byKey("b").map(_.ewma) == closedForm(Seq(2L)))
  }
}
