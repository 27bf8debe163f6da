package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Expectations._

/** Streaming expectations monitor: per-window check reports from the
  * stream must equal running the batch suite on each window's rows —
  * the stream ≡ batch twin contract every curation stream carries. */
class StreamExpectationsSpec extends graft.SparkSpec {
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
  import spark.implicits._

  private def ts(min: Int) = new Timestamp(min * 60000L)

  // (ts, id, value, status): window 0 carries a null id and an
  // out-of-range value; window 1 is clean.
  private val w0 = Seq(
    (ts(1), Option(1L), Option(5.0), "OK"),
    (ts(2), Option.empty[Long], Option(7.0), "OK"),
    (ts(3), Option(3L), Option(-2.0), "BAD"))
  private val w1 = Seq(
    (ts(61), Option(4L), Option(1.0), "OK"),
    (ts(62), Option(5L), Option(2.0), "OK"))

  private def suite = Seq(
    notNull("id"),
    inRange("value", lit(0.0), lit(10.0)),
    inSet("status", Seq("OK")))

  test("per-window stream reports equal the batch suite on each window's rows") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Option[Long], Option[Double], String)]
    val q = StreamOps.expectationsStream(
        mem.toDS().toDF("ts", "id", "value", "status"), suite,
        windowLen = "1 hour")
      .writeStream.format("memory").queryName("sexp")
      .outputMode("complete").start()
    try {
      mem.addData(w0 ++ w1: _*)
      q.processAllAvailable()
      val got = spark.table("sexp")
        .select("bucket", "check_name", "n_rows", "violations", "passed")
        .as[(Timestamp, String, Long, Long, Boolean)].collect().toSet
      val want = Seq(ts(0) -> w0, ts(60) -> w1).flatMap { case (b, rows) =>
        report(rows.toDF("ts", "id", "value", "status"), suite)
          .select("check_name", "n_rows", "violations", "passed")
          .as[(String, Long, Long, Boolean)].collect()
          .map { case (c, n, v, p) => (b, c, n, v, p) }
      }.toSet
      assert(got == want)
      // the dirty window fails all three checks, the clean window none
      assert(got.count { case (b, _, _, _, p) => b == ts(0) && !p } == 3)
      assert(got.forall { case (b, _, _, _, p) => b != ts(60) || p })
    } finally q.stop()
  }

  test("a unique() check is rejected by the engine on a stream") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Option[Long], Option[Double], String)]
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      StreamOps.expectationsStream(
          mem.toDS().toDF("ts", "id", "value", "status"),
          suite :+ unique("id"))
        .writeStream.format("memory").queryName("sexp_bad")
        .outputMode("complete").start()
    }
    assert(err.getMessage.toLowerCase.contains("distinct"))
  }
}
