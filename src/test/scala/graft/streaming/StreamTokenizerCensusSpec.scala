package graft.streaming

import org.apache.spark.sql.functions._

import graft.operators.UnigramLm

/** Streaming tokenizer-census maintenance (VERDICT r12 #8): the live
  * word census must equal the batch census after every trigger, and
  * the unigram-LM trainer fed the STREAMED census must produce the
  * bit-identical cost table it produces from the batch census — the
  * continuous-crawl tokenizer story: the census is the only
  * corpus-sized pass, and the stream has already paid it. */
class StreamTokenizerCensusSpec extends graft.SparkSpec {
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
  import spark.implicits._

  private def batchCensus(docs: Seq[String]) =
    StreamOps.wordCensusStream(docs.toDF("text"))

  test("stream word census equals batch census; trainer folds it in bit-identically") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val q = StreamOps.wordCensusStream(mem.toDS().toDF("text"))
      .writeStream.format("memory").queryName("wcensus")
      .outputMode("complete").start()
    val first = Seq("aba abba cab", "aba cab cab", "Abba, ABA!")
    val second = Seq("bac bac aba", "abba abba cab")
    try {
      mem.addData(first: _*)
      q.processAllAvailable()
      assert(spark.table("wcensus").as[(String, Long)].collect().toMap
        == batchCensus(first).as[(String, Long)].collect().toMap)
      // canonicalization is the batch one: case folded, punct stripped
      assert(spark.table("wcensus").filter(col("w") === "abba")
        .as[(String, Long)].head()._2 == 2L)
      mem.addData(second: _*)
      q.processAllAvailable()
      val streamed = spark.table("wcensus")
      assert(streamed.as[(String, Long)].collect().toMap
        == batchCensus(first ++ second).as[(String, Long)].collect().toMap)

      // the trainer consumes the streamed table exactly as it would
      // the batch census — identical (piece, cnt, cost) fixed point
      val fromStream = UnigramLm.train(streamed, topMulti = 4, rounds = 2)
        .as[(String, Long, Long)].collect().toSet
      val fromBatch = UnigramLm.train(batchCensus(first ++ second),
          topMulti = 4, rounds = 2)
        .as[(String, Long, Long)].collect().toSet
      assert(fromStream == fromBatch)
      assert(fromStream.exists(_._1.length > 1)) // multi-char pieces learned
    } finally q.stop()
  }
}
