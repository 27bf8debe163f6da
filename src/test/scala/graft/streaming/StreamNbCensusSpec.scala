package graft.streaming

import org.apache.spark.sql.functions._

import graft.operators.NaiveBayes

/** Streaming NB-census maintenance (the bigramCensusStream story
  * lifted to the classifier): BOTH of the trainer's sufficient
  * statistics — the (label, token) census and the (label, n) doc
  * census — must equal their batch twins after every trigger, and
  * NaiveBayes.trainFromCensus fed the STREAMED censuses must produce
  * the bit-identical parameter table it produces from the batch
  * corpus — the continuous-crawl quality-gate retraining story. */
class StreamNbCensusSpec extends graft.SparkSpec {
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
  import spark.implicits._

  private def labeled(rows: Seq[(String, String)]) =
    rows.toDF("label", "text")
      .select(col("label"),
        graft.functions.TextAnalysis.wsTokens(col("text")).as("tokens"))

  test("stream censuses equal batch; trainFromCensus folds them in bit-identically") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, String)]
    val in = mem.toDS().toDF("label", "text")
      .select(col("label"),
        graft.functions.TextAnalysis.wsTokens(col("text")).as("tokens"))
    val qTok = StreamOps.nbTokenCensusStream(in)
      .writeStream.format("memory").queryName("nbtok")
      .outputMode("complete").start()
    val qDoc = StreamOps.nbDocCensusStream(in)
      .writeStream.format("memory").queryName("nbdoc")
      .outputMode("complete").start()
    val first = Seq(
      ("good", "the cat sat on the mat"),
      ("bad", "buy buy buy now"),
      ("good", "a readable sentence about cats"))
    val second = Seq(
      ("bad", "now now __prior__ spam"), // pseudo-token filtered out
      ("good", "the mat again"))
    try {
      mem.addData(first: _*)
      qTok.processAllAvailable(); qDoc.processAllAvailable()
      assert(spark.table("nbtok").as[(String, String, Long)].collect().toSet
        == NaiveBayes.tokenCensus(labeled(first))
          .as[(String, String, Long)].collect().toSet)
      assert(spark.table("nbdoc").as[(String, Long)].collect().toSet
        == NaiveBayes.docCensus(labeled(first))
          .as[(String, Long)].collect().toSet)
      mem.addData(second: _*)
      qTok.processAllAvailable(); qDoc.processAllAvailable()
      // the reserved pseudo-token never enters the streamed census
      assert(spark.table("nbtok")
        .filter(col("token") === NaiveBayes.PriorToken).count() == 0)
      val fromStream = NaiveBayes.trainFromCensus(
          spark.table("nbtok"), spark.table("nbdoc"))
        .as[(String, String, Long, Long)].collect().toSet
      val fromBatch = NaiveBayes.train(labeled(first ++ second))
        .as[(String, String, Long, Long)].collect().toSet
      assert(fromStream == fromBatch)
      assert(fromStream.exists(_._2 == NaiveBayes.PriorToken))
      assert(fromStream.exists(_._2 == NaiveBayes.UnseenToken))
    } finally { qTok.stop(); qDoc.stop() }
  }
}
