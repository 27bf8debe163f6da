package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Dedup
import graft.streaming.StreamOps.BandClaim

/** Pins the streaming near-dedup twin to the batch band-store path:
  * per-bucket state claims are first-trigger-wins / min-id-within-
  * trigger, a doc keeps iff it owns every one of its buckets, and the
  * verdicts agree with batch bandStore + incrementalNear's store-
  * collision step on the same history/batch arrival split.
  */
class StreamNearDedupSpec extends SparkSpec {
  import spark.implicits._

  // the batch fixture's corpus (OperatorsSpec incremental test), split
  // into two arrival triggers
  private val t1 = Seq(
    (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"),
    (2L, "completely different historical document about parquet row groups"))
  private val t2 = Seq(
    // near re-fetch of doc 1: first word dropped
    (10L, "beta gamma delta epsilon zeta eta theta iota kappa lambda mu"),
    // exact re-fetch of doc 2
    (11L, "completely different historical document about parquet row groups"),
    // fresh doc, double-fetched within the trigger — min id keeps
    (12L, "a genuinely new page about adaptive query execution internals"),
    (13L, "a genuinely new page about adaptive query execution internals"),
    // fresh singleton
    (14L, "another new page with entirely novel words and content"))

  /** Drive the stream; return kept doc ids per trigger (a doc keeps
    * iff it owns every band it touches). */
  private def runStream(triggers: Seq[Seq[(Long, String)]]): Seq[Set[Long]] = {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val perTrigger = scala.collection.mutable.ArrayBuffer[Set[Long]]()
    val q = StreamOps.nearDedupStream(mem.toDF().toDF("id", "text")).writeStream
      .outputMode("update")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[BandClaim], _: Long) =>
        val rows = df.collect()
        val kept = rows.groupBy(_.doc_id)
          .collect { case (id, cs) if cs.forall(_.claimed_by == id) => id }
        perTrigger += kept.toSet
        ()
      }
      .start()
    try {
      triggers.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    perTrigger.toSeq
  }

  test("cross-trigger near-dups drop via state; min id wins within a trigger") {
    val got = runStream(Seq(t1, t2))
    // trigger 1: both history docs are novel
    assert(got(0) == Set(1L, 2L))
    // trigger 2: 10 (near re-fetch) and 11 (exact re-fetch) collide
    // with trigger-1 claims; 13 loses its buckets to 12; 14 is fresh
    assert(got(1) == Set(12L, 14L), s"got ${got(1)}")
  }

  test("stream verdicts agree with the batch store-collision step") {
    // batch equivalent of trigger 2: any band collision with the
    // trigger-1 store drops the doc (incrementalNear step 2)
    val store = Dedup.bandStore(t1.toDF("id", "text"), "id", "text")
    val batchHits = Dedup.minhashBanded(t2.toDF("id", "text"), "id", "text")
      .join(store, Seq("band", "bh"), "left_semi")
      .select("id").as[Long].collect().toSet
    val got = runStream(Seq(t1, t2))
    val streamDropped = t2.map(_._1).toSet -- got(1)
    // stream additionally drops within-trigger losers (13); the
    // cross-trigger verdicts must coincide exactly
    assert(streamDropped - 13L == batchHits, s"stream $streamDropped vs batch $batchHits")
    // and the batch path's full kept set matches on this corpus too
    val batchKept = Dedup.incrementalNear(t2.toDF("id", "text"), store, "id", "text")
      .select("keep_id").as[Long].collect().toSet
    assert(got(1) == batchKept)
  }

  test("the claimed band-bucket state equals the batch band store") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val claims = scala.collection.mutable.ArrayBuffer[BandClaim]()
    val q = StreamOps.nearDedupStream(mem.toDF().toDF("id", "text")).writeStream
      .outputMode("update")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[BandClaim], _: Long) =>
        claims ++= df.collect()
        ()
      }
      .start()
    try { mem.addData(t1: _*); q.processAllAvailable() } finally q.stop()
    val novel = claims.filter(_.novel).map(c => (c.band, c.bh)).toSet
    val store = Dedup.bandStore(t1.toDF("id", "text"), "id", "text")
      .as[(Int, String)].collect().toSet
    assert(novel == store, "novel claims must equal the batch band store")
  }
}
