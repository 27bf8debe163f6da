package graft.streaming

/** Streaming drift monitor: the live term census must equal the batch
  * census over everything seen so far after every trigger, and the
  * shared klAgainst join must produce identical per-term KL
  * contributions on the streamed census as on the batch one —
  * census interchangeability, the histogram/CMS story for drift. */
class StreamDriftSpec extends graft.SparkSpec {
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
  import spark.implicits._

  private def batchCensus(docs: Seq[String]) =
    StreamOps.termCensusStream(docs.toDF("text"))
      .as[(String, Long)].collect().toMap

  test("stream census equals batch census after every trigger; KL join matches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val q = StreamOps.termCensusStream(mem.toDS().toDF("text"))
      .writeStream.format("memory").queryName("scensus")
      .outputMode("complete").start()
    val first = Seq("the quick fox", "the slow dog", "fox and dog")
    val second = Seq("drifted vocabulary arrives", "the fox drifted")
    try {
      mem.addData(first: _*)
      q.processAllAvailable()
      assert(spark.table("scensus").as[(String, Long)].collect().toMap
        == batchCensus(first))
      mem.addData(second: _*)
      q.processAllAvailable()
      val streamed = spark.table("scensus")
      assert(streamed.as[(String, Long)].collect().toMap
        == batchCensus(first ++ second))

      // the SAME klAgainst code runs on the streamed census table and
      // on the batch census — contributions must be identical
      val reference = Seq("the fox", "the dog", "vocabulary of the fox")
        .toDF("text")
      val refCensus = StreamOps.termCensusStream(reference)
      val fromStream = StreamOps.klAgainst(streamed, refCensus)
        .as[(String, Double)].collect().toMap
      val fromBatch = StreamOps.klAgainst(
          StreamOps.termCensusStream((first ++ second).toDF("text")), refCensus)
        .as[(String, Double)].collect().toMap
      assert(fromStream == fromBatch)
      assert(fromStream.nonEmpty)
      // a term absent from the reference contributes nothing (inner
      // join on shared vocab — the batch stats_drift contract)
      assert(!fromStream.contains("drifted"))
    } finally q.stop()
  }
}
