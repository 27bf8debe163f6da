package graft.streaming

import org.apache.spark.sql.functions._

/** Streaming CDC-chunk census maintenance: the live occurrence census
  * over content-defined chunks must equal the batch census after every
  * trigger — the duplication monitor of a continuous crawl (boundaries
  * are row-local window hashes, so the census is the only stateful
  * piece and it is a plain streaming aggregation).
  */
class StreamCdcCensusSpec extends graft.SparkSpec {
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
  import spark.implicits._

  private def batchCensus(docs: Seq[(Long, String)]) =
    StreamOps.cdcCensusStream(docs.toDF("doc_id", "text"))

  test("stream CDC census equals batch census after every trigger") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = StreamOps.cdcCensusStream(mem.toDS().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("cdccensus")
      .outputMode("complete").start()
    val tail = (1 to 12).map(i => s"shared boilerplate sentence $i.").mkString(" ")
    val first = Seq((1L, "unique prefix one. " + tail),
      (2L, "a different and much longer unique prefix two here. " + tail))
    val second = Seq((3L, "third unique prefix text. " + tail))
    try {
      mem.addData(first: _*)
      q.processAllAvailable()
      assert(spark.table("cdccensus").as[(String, Long, Long)].collect().toSet
        == batchCensus(first).as[(String, Long, Long)].collect().toSet)
      mem.addData(second: _*)
      q.processAllAvailable()
      val streamed = spark.table("cdccensus")
        .as[(String, Long, Long)].collect().toSet
      assert(streamed
        == batchCensus(first ++ second).as[(String, Long, Long)].collect().toSet)
      // the planted shared tail is visible to the monitor: some chunk
      // reaches n_occ = 3 once the third doc lands
      assert(streamed.exists(_._3 == 3L), "no chunk shared by all 3 docs")
    } finally q.stop()
  }
}
