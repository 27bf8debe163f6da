package graft.streaming

import org.apache.spark.sql.functions._

import graft.operators.KneserNey

/** Streaming KN-census maintenance (the wordCensusStream story lifted
  * to the LM): the live bigram census must equal the batch census
  * after every trigger, and KneserNey.trainFromCensus fed the STREAMED
  * census must produce the bit-identical parameter table it produces
  * from the batch corpus — the continuous-crawl perplexity-gate story:
  * the census is the trainer's sufficient statistic and its only
  * corpus-sized pass, and the stream has already paid it. */
class StreamKnCensusSpec extends graft.SparkSpec {
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
  import spark.implicits._

  private def tokens(docs: Seq[String]) =
    docs.toDF("text").select(graft.functions.TextAnalysis.wsTokens(
      graft.functions.TextAnalysis.canonicalize(col("text"))).as("tokens"))

  test("stream bigram census equals batch; trainFromCensus folds it in bit-identically") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val q = StreamOps.bigramCensusStream(mem.toDS().toDF("text"))
      .writeStream.format("memory").queryName("kncensus")
      .outputMode("complete").start()
    val first = Seq("a b a c", "a b", "B? a.")
    val second = Seq("c c a b", "a b a")
    try {
      mem.addData(first: _*)
      q.processAllAvailable()
      assert(spark.table("kncensus").as[(String, String, Long)].collect().toSet
        == KneserNey.bigramCensus(tokens(first))
          .as[(String, String, Long)].collect().toSet)
      // BOS contract is the batch one: every doc contributes (<s>, w)
      assert(spark.table("kncensus")
        .filter(col("w1") === KneserNey.Bos).agg(sum(col("c2")))
        .as[Long].head() == first.size)
      mem.addData(second: _*)
      q.processAllAvailable()
      val streamed = spark.table("kncensus")
      val fromStream = KneserNey.trainFromCensus(streamed)
        .as[(String, String, String, Long, Long)].collect().toSet
      val fromBatch = KneserNey.train(tokens(first ++ second))
        .as[(String, String, String, Long, Long)].collect().toSet
      assert(fromStream == fromBatch)
      assert(fromStream.exists(_._1 == "bi")) // real bigram params present
    } finally q.stop()
  }
}
