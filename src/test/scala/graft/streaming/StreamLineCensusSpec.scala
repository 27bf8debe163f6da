package graft.streaming

import org.apache.spark.sql.functions.col

/** Streaming boilerplate monitor: the live line census must equal the
  * batch commonLines census (occurrence half) over everything seen so
  * far after every trigger — the stream ≡ batch contract that lets a
  * crawl flip between live monitoring and batch re-census without a
  * semantic seam. */
class StreamLineCensusSpec extends graft.SparkSpec {
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
  import spark.implicits._

  private def batchOcc(docs: Seq[String]): Map[String, Long] =
    graft.operators.Dedup.commonLines(
        docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text"),
        "id", "text", minDocs = 1L)
      .select(col("line"), col("n_occ")).as[(String, Long)].collect().toMap

  test("stream line census equals the batch census after every trigger") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val q = StreamOps.lineCensusStream(mem.toDS().toDF("text"))
      .writeStream.format("memory").queryName("lcensus")
      .outputMode("complete").start()
    val first = Seq("Subscribe NOW\nunique alpha", "subscribe  now\nunique beta")
    val second = Seq("unique gamma\nSUBSCRIBE now", "\n  \n") // blanks drop
    try {
      mem.addData(first: _*)
      q.processAllAvailable()
      val afterFirst = spark.table("lcensus").as[(String, Long)].collect().toMap
      assert(afterFirst == batchOcc(first))
      assert(afterFirst("subscribe now") == 2L) // case/ws-normalized
      mem.addData(second: _*)
      q.processAllAvailable()
      val afterSecond = spark.table("lcensus").as[(String, Long)].collect().toMap
      assert(afterSecond == batchOcc(first ++ second))
      assert(afterSecond("subscribe now") == 3L)
    } finally q.stop()
  }
}
