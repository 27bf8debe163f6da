package graft.streaming

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, PngCodec}

/** phashServeStream — the continuous-crawl image-dedup serve: per
  * trigger the streaming verdicts equal the batch evaluation of the
  * SAME Bloom, the plan is stateless append (no state store), and
  * the Bloom never false-negatives against the exact band store. */
class StreamPhashServeSpec extends graft.SparkSpec {
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
  import spark.implicits._

  private def sigsOf(ids: Seq[Long]) =
    PngCodec.pngPHash(PngCodec.synthPngs(
        ids.map(java.lang.Long.valueOf).toDS()))
      .toDF().select(col("id"), col("phash"))
      .as[(Long, Long)].collect().toSeq

  test("stream ≡ batch bloom verdicts; no false negatives vs exact") {
    implicit val sqlCtx = spark.sqlContext
    // history = ids 0..19; the store is their distinct band slices
    val hist = sigsOf(0L until 20L)
    val store = Dedup.hammingBandStore(
      hist.toDF("id", "phash"), "id", "phash")
    val bloom = Dedup.hammingStoreBloom(store)
    // batch: re-posts of history pixels (ids 100/101 share group
    // pixels with 16/17 — synthPngs keys pixels on id/2, so probe
    // with the ORIGINAL sigs relabeled) + genuinely new images
    val reposts = sigsOf(Seq(16L, 17L)).map { case (id, ph) =>
      (id + 1000L, ph)
    }
    val fresh = sigsOf(Seq(500L, 501L, 502L))
    val probes = reposts ++ fresh

    val mem = MemoryStream[(Long, Long)]
    val q = StreamOps.phashServeStream(
        mem.toDS().toDF("id", "phash"), bloom)
      .writeStream.format("memory").queryName("phashserve")
      .outputMode("append").start()
    try {
      mem.addData(probes.take(2): _*)
      q.processAllAvailable()
      mem.addData(probes.drop(2): _*)
      q.processAllAvailable()
      // stateless: no state operator in the progress
      assert(q.lastProgress.stateOperators.isEmpty,
        "serve must be stateless")
      val streamed = spark.table("phashserve")
        .as[(Long, Long, Boolean)].collect().toSet
      val batch = StreamOps.phashServeStream(
          probes.toDF("id", "phash"), bloom)
        .as[(Long, Long, Boolean)].collect().toSet
      assert(streamed == batch)
      // no false negatives: every EXACT store hit is a bloom hit
      val exact = Dedup.hammingServeVerdicts(
          probes.toDF("id", "phash"), store, "id", "phash")
        .as[(Long, Boolean)].collect().toMap
      val bloomV = streamed.map(t => t._1 -> t._3).toMap
      exact.foreach { case (id, known) =>
        if (known) assert(bloomV(id), s"bloom false negative on $id")
      }
      // the planted re-posts ARE exact hits (same pixels, same hash)
      assert(exact(1016L) && exact(1017L))
      assert(bloomV(1016L) && bloomV(1017L))
    } finally q.stop()
  }
}
