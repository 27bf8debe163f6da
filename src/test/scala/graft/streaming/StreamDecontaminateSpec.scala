package graft.streaming

import org.apache.spark.sql.functions._

import graft.operators.Bloom

/** Streaming decontamination gate (VERDICT r14 #10 stretch): every
  * arriving doc gets a (n_grams, n_hits, contaminated) verdict against
  * the broadcast benchmark-gram Bloom — stream ≡ batch per trigger,
  * stateless append mode, and no false negative is possible for a doc
  * that genuinely shares an 8-gram with the benchmark. */
class StreamDecontaminateSpec extends graft.SparkSpec {
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
  import spark.implicits._

  // a benchmark of two "eval questions"; 8-gram shingles
  private val benchDocs = Seq(
    "the quick brown fox jumps over the lazy dog tonight",
    "colorless green ideas sleep furiously under a pale winter moon")

  private def bloomOf(): Bloom.Filter = {
    val grams = benchDocs.toDF("text")
      .select(explode(graft.functions.TextAnalysis.wordShingles(
        col("text"), 8)).as("g"))
      .select(md5(col("g")).as("gh")).distinct()
    Bloom.build(grams, "gh")
  }

  private def batchVerdicts(bloom: Bloom.Filter,
                            rows: Seq[(Long, String)]) =
    StreamOps.decontaminateStream(rows.toDF("doc_id", "text"), bloom)
      .as[(Long, Int, Int, Boolean)].collect().toSet

  test("stream verdicts equal batch after every trigger; leaks caught") {
    implicit val sqlCtx = spark.sqlContext
    val bloom = bloomOf()
    val mem = MemoryStream[(Long, String)]
    val q = StreamOps.decontaminateStream(
        mem.toDS().toDF("doc_id", "text"), bloom)
      .writeStream.format("memory").queryName("decontam")
      .outputMode("append").start()
    // doc 2 embeds a full benchmark 8-gram (a LEAK); 1 and 3 are clean;
    // doc 4 is too short to have any 8-gram at all
    val first = Seq(
      (1L, "completely fresh training text with no overlap at all here"),
      (2L, "preamble then the quick brown fox jumps over the lazy dog " +
        "tonight and a tail"))
    val second = Seq(
      (3L, "another clean doc of ordinary words that keeps to itself " +
        "entirely today"),
      (4L, "too short"))
    try {
      mem.addData(first: _*)
      q.processAllAvailable()
      val got1 = spark.table("decontam")
        .as[(Long, Int, Int, Boolean)].collect().toSet
      assert(got1 == batchVerdicts(bloom, first))
      // the planted leak MUST be caught (no false negatives)
      assert(got1.find(_._1 == 2L).exists(r => r._4 && r._3 >= 1))
      mem.addData(second: _*)
      q.processAllAvailable()
      val got2 = spark.table("decontam")
        .as[(Long, Int, Int, Boolean)].collect().toSet
      assert(got2 == batchVerdicts(bloom, first ++ second))
      // the gram-free doc flows through with a zero census
      assert(got2.find(_._1 == 4L).exists(r => r._2 == 0 && !r._4))
    } finally q.stop()
  }

  test("the stream plan is stateless: no aggregation, no state store") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = StreamOps.decontaminateStream(
        mem.toDS().toDF("doc_id", "text"), bloomOf())
      .writeStream.format("memory").queryName("decontamplan")
      .outputMode("append").start()
    try {
      mem.addData((1L, "just some words"))
      q.processAllAvailable()
      val p = q.lastProgress
      assert(p.stateOperators.isEmpty, s"state operators: ${p.stateOperators}")
    } finally q.stop()
  }
}
