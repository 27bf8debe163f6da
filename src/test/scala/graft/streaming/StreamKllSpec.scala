package graft.streaming

import org.apache.spark.sql.functions._

/** Streaming KLL census maintenance: the (level, x, cnt) census must
  * equal the batch census after every trigger (levels are row-local
  * md5 bits, so the census is the only stateful piece and it is a
  * plain streaming aggregation), and the sketch derived from the live
  * census must match the batch build bit-for-bit — continuous
  * quantile state with no range pre-pass. */
class StreamKllSpec extends graft.SparkSpec {
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
  import spark.implicits._

  test("stream KLL census equals batch census; derived sketch matches build") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long)]
    val q = StreamOps.kllCensusStream(mem.toDS().toDF("rid", "x"), "rid", "x")
      .writeStream.format("memory").queryName("kllcensus")
      .outputMode("complete").start()
    val first = (1 to 800).map(i => (s"r$i", i.toLong * i))
    val second = (801 to 1200).map(i => (s"r$i", i.toLong * i))
    def batchCensus(rows: Seq[(String, Long)]) =
      StreamOps.kllCensusStream(rows.toDF("rid", "x"), "rid", "x")
        .as[(Int, Long, Long)].collect().toSet
    try {
      mem.addData(first: _*)
      q.processAllAvailable()
      assert(spark.table("kllcensus").as[(Int, Long, Long)].collect().toSet
        == batchCensus(first))
      mem.addData(second: _*)
      q.processAllAvailable()
      val streamed = spark.table("kllcensus")
      assert(streamed.as[(Int, Long, Long)].collect().toSet
        == batchCensus(first ++ second))
      // the serve step: sketch from the LIVE census ≡ batch build
      val fromStream = graft.operators.Kll.fromCensus(streamed, k = 64)
      val direct = graft.operators.Kll.build(
        (first ++ second).toDF("rid", "x"), "rid", "x", k = 64)
      assert(fromStream.items.as[(Int, Long, Long)].collect().toSet
        == direct.items.as[(Int, Long, Long)].collect().toSet)
      assert(graft.operators.Kll.quantiles(fromStream, Seq(0.5, 0.9))
        .as[(Double, Long, Int, Long, Long)].collect().toSet
        == graft.operators.Kll.quantiles(direct, Seq(0.5, 0.9))
          .as[(Double, Long, Int, Long, Long)].collect().toSet)
    } finally q.stop()
  }
}
