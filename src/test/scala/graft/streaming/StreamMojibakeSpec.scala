package graft.streaming

import org.apache.spark.sql.functions._

/** Streaming encoding monitor (the expectations-monitor family): the
  * per-language mojibake census must equal the batch census after
  * every trigger, so a mis-decoded feed shows up during ingestion. */
class StreamMojibakeSpec extends graft.SparkSpec {
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
  import spark.implicits._

  private val moji = "\u00e2\u20ac\u2122"
  private val repl = "\ufffd"

  private def batchCensus(rows: Seq[(String, String)]) =
    StreamOps.mojibakeStream(rows.toDF("lang", "text"))
      .as[(String, Long, Long, Long, Long)].collect().toSet

  test("stream mojibake census equals batch after every trigger") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, String)]
    val q = StreamOps.mojibakeStream(mem.toDS().toDF("lang", "text"))
      .writeStream.format("memory").queryName("mojicensus")
      .outputMode("complete").start()
    val first = Seq(
      ("en", "a clean sentence"),
      ("en", s"its${moji}s broken quote"),
      ("de", s"der $repl$repl feed"))
    val second = Seq(
      ("de", "ganz sauber"),
      ("en", s"$moji$moji twice"))
    try {
      mem.addData(first: _*)
      q.processAllAvailable()
      assert(spark.table("mojicensus")
        .as[(String, Long, Long, Long, Long)].collect().toSet
        == batchCensus(first))
      mem.addData(second: _*)
      q.processAllAvailable()
      val got = spark.table("mojicensus")
        .as[(String, Long, Long, Long, Long)].collect().toSet
      assert(got == batchCensus(first ++ second))
      // the corrupted rows really were counted, not just zeroed rows
      assert(got.find(_._1 == "en").exists(r => r._3 == 2 && r._4 == 3))
      assert(got.find(_._1 == "de").exists(r => r._3 == 1 && r._5 == 2))
    } finally q.stop()
  }
}
