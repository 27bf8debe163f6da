package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.streaming.StreamOps.Event

class StreamOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Long) = new Timestamp(min * 60000)

  test("windowedAgg aggregates tumbling windows over a stream") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    mem.addData(
      Event(1, ts(5), 1, "click", 1.0),
      Event(2, ts(10), 1, "click", 2.0),
      Event(3, ts(65), 2, "view", 4.0))
    val q = StreamOps.windowedAgg(mem.toDF(), "1 hour", "10 minutes")
      .writeStream.format("memory").queryName("wagg")
      .outputMode(OutputMode.Complete()).start()
    try {
      q.processAllAvailable()
      val rows = spark.table("wagg")
        .select("event_type", "n", "total_value")
        .as[(String, Long, Double)].collect().toSet
      assert(rows == Set(("click", 2L, 3.0), ("view", 1L, 4.0)))
    } finally q.stop()
  }

  test("streamJoin pairs purchases with same-user views inside the lookback window") {
    implicit val sqlCtx = spark.sqlContext
    val purchases = MemoryStream[Event]
    val views = MemoryStream[Event]
    val q = StreamOps.streamJoin(purchases.toDF(), views.toDF(), "1 hour")
      .writeStream.format("memory").queryName("sjoin")
      .outputMode(OutputMode.Append()).start()
    try {
      views.addData(
        Event(10, ts(30), 1, "view", 1.0),  // 70 min before → outside lookback
        Event(11, ts(70), 1, "view", 1.0),
        Event(12, ts(95), 1, "view", 1.0),
        Event(13, ts(96), 2, "view", 1.0))  // other user
      purchases.addData(Event(1, ts(100), 1, "purchase", 9.0))
      q.processAllAvailable()
      val got = spark.table("sjoin").select("purchase_id", "view_id")
        .as[(Long, Long)].collect().toSet
      assert(got == Set((1L, 11L), (1L, 12L)))
    } finally q.stop()
  }

  test("dedupeStream keeps first row per key within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = StreamOps.dedupeStream(mem.toDF(), Seq("event_id"))
      .writeStream.format("memory").queryName("dedup")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(
        Event(1, ts(5), 1, "click", 1.0),
        Event(1, ts(6), 1, "click", 1.0), // duplicate id within watermark
        Event(2, ts(7), 2, "view", 4.0))
      q.processAllAvailable()
      mem.addData(Event(2, ts(8), 2, "view", 4.0)) // late duplicate
      q.processAllAvailable()
      val rows = spark.table("dedup").select("event_id")
        .as[Long].collect().toSeq.sorted
      assert(rows == Seq(1L, 2L))
    } finally q.stop()
  }

  test("sessionize emits closed sessions as watermark advances") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = StreamOps.sessionize(mem.toDS(), gapSeconds = 1800)
      .writeStream.format("memory").queryName("sess")
      .outputMode(OutputMode.Append()).start()
    try {
      // session A: minutes 100-110 (offset from epoch: a row AT the
      // initial watermark would be dropped as late); the distant event
      // at minute 700 pushes the watermark past A's timeout → emitted.
      mem.addData(
        Event(1, ts(100), 1, "click", 1.0),
        Event(2, ts(110), 1, "click", 2.0))
      q.processAllAvailable()
      mem.addData(Event(3, ts(700), 1, "click", 4.0))
      q.processAllAvailable()
      mem.addData(Event(4, ts(2100), 1, "click", 8.0))
      q.processAllAvailable()
      val sessions = spark.table("sess")
        .select("user_id", "n_events", "total_value")
        .as[(Long, Long, Double)].collect().toSet
      assert(sessions.contains((1L, 2L, 3.0)))   // minutes 0-10 session closed
      assert(sessions.contains((1L, 1L, 4.0)))   // minute-600 session closed
    } finally q.stop()
  }
}

/** Streaming session_window: the native-aggregation twin of
  * StreamOps.sessionize — closed sessions must match the batch
  * session_window aggregation over the same rows. */
class StreamSessionWindowSpec extends graft.SparkSpec {
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
  import org.apache.spark.sql.streaming.OutputMode
  import graft.streaming.StreamOps.Event
  import spark.implicits._

  private def ts(min: Long) = new java.sql.Timestamp(min * 60000)

  test("native session windows close and match the batch aggregation") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = graft.streaming.StreamOps.sessionWindowStream(mem.toDF())
      .writeStream.format("memory").queryName("snsess")
      .outputMode(OutputMode.Append()).start()
    try {
      val rows = Seq(
        Event(1, ts(100), 1, "click", 1.0),
        Event(2, ts(110), 1, "click", 2.0),
        Event(3, ts(105), 2, "click", 4.0))
      mem.addData(rows: _*)
      q.processAllAvailable()
      // distant event pushes the watermark past both sessions' gaps
      mem.addData(Event(4, ts(3000), 1, "click", 8.0))
      q.processAllAvailable()
      val streamed = spark.table("snsess")
        .select("user_id", "n_events", "total_value")
        .as[(Long, Long, Double)].collect().toSet
      val batch = rows.toDF()
        .groupBy($"user_id",
          org.apache.spark.sql.functions.session_window($"ts", "30 minutes"))
        .agg(org.apache.spark.sql.functions.count($"value").as("n_events"),
          org.apache.spark.sql.functions.sum($"value").as("total_value"))
        .select("user_id", "n_events", "total_value")
        .as[(Long, Long, Double)].collect().toSet
      assert(streamed == batch, s"streamed=$streamed batch=$batch")
    } finally q.stop()
  }
}

/** Streaming histogram: the mergeable-sketch claim behind
  * sketch_quantile — per-bin counts must equal the batch binning of
  * everything seen so far after EVERY trigger (Complete mode), i.e.
  * the sketch accumulates across micro-batches instead of
  * restarting. */
class StreamHistogramSpec extends graft.SparkSpec {
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
  import spark.implicits._

  private def batchHist(xs: Seq[Long]): Map[Int, Long] =
    graft.streaming.StreamOps.histogramStream(
      xs.toDF("x"), lo = 0L, w = 7L, bins = 16)
      .as[(Int, Long)].collect().toMap

  test("stream histogram equals batch after every trigger") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Long]
    val q = graft.streaming.StreamOps.histogramStream(
        mem.toDS().toDF("x"), lo = 0L, w = 7L, bins = 16)
      .writeStream.format("memory").queryName("shist")
      .outputMode("complete").start()
    try {
      val first = (0L until 100L).map(i => i * 3 % 120)
      val second = (0L until 80L).map(i => i * 5 % 200)
      mem.addData(first: _*)
      q.processAllAvailable()
      val afterOne = spark.table("shist").as[(Int, Long)].collect().toMap
      assert(afterOne == batchHist(first))
      mem.addData(second: _*)
      q.processAllAvailable()
      val afterTwo = spark.table("shist").as[(Int, Long)].collect().toMap
      assert(afterTwo == batchHist(first ++ second))
      // clamp bin: values past lo + w*bins land in the last bin
      assert(afterTwo.keySet.max == 15)
    } finally q.stop()
  }
}

/** Streaming Count-Min: the sketch TABLE must equal the batch
  * operators.Sketch.countMin table over everything seen so far after
  * every trigger, and the batch estimator must work unchanged on the
  * streamed table (sketch interchangeability). */
class StreamCmsSpec extends graft.SparkSpec {
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
  import org.apache.spark.sql.functions.col
  import spark.implicits._

  private def batchTable(xs: Seq[Long]): Set[(Int, Long, Long)] =
    graft.operators.Sketch.countMin(xs.toDF("key"), "key")
      .table.as[(Int, Long, Long)].collect().toSet

  test("stream CMS table equals the batch sketch after every trigger") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Long]
    val q = graft.streaming.StreamOps.cmsStream(mem.toDS().toDF("key"))
      .writeStream.format("memory").queryName("scms")
      .outputMode("complete").start()
    try {
      val first = (1L to 200L) ++ (1L to 50L) // 1..50 twice
      val second = (1L to 25L) ++ (180L to 260L)
      mem.addData(first: _*)
      q.processAllAvailable()
      assert(spark.table("scms").as[(Int, Long, Long)].collect().toSet
        == batchTable(first))
      mem.addData(second: _*)
      q.processAllAvailable()
      val streamed = spark.table("scms")
      assert(streamed.as[(Int, Long, Long)].collect().toSet
        == batchTable(first ++ second))
      // the batch estimator runs unchanged on the streamed table and
      // keeps the CMS upper bound: est >= true count for every key
      val est = graft.operators.Sketch.CountMin(streamed, 4, 64)
        .estimate((1L to 260L).toDF("key"), "key")
        .as[(Long, Long)].collect().toMap
      val truth = (first ++ second).groupBy(identity).view.mapValues(_.size.toLong)
      assert(truth.forall { case (k, n) => est(k) >= n })
    } finally q.stop()
  }
}

class FileStreamSpec extends graft.SparkSpec {
  import org.apache.spark.sql.functions._

  test("file-source streaming: windowedAgg over the events parquet equals batch") {
    // stage the events file into its own directory (file streams read dirs)
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      java.nio.file.Paths.get(dir, "events.parquet"))
    val batch = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    // normalize ts to a session-UTC TIMESTAMP under either testdata
    // regime (nanos-as-long or TIMESTAMP_NTZ) — the Tables.events
    // contract, applied to the streaming read
    val raw = spark.readStream.schema(schema).parquet(dir)
    val stream = schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
    val q = graft.streaming.StreamOps.windowedAgg(stream)
      .writeStream.format("memory").queryName("fstream")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      q.awaitTermination(60000)
      val streamed = spark.table("fstream").agg(sum("n")).head().getLong(0)
      assert(streamed == batch.count())
    } finally q.stop()
  }
}

class FileSinkStreamSpec extends graft.SparkSpec {
  import spark.implicits._
  import graft.streaming.StreamOps.Event
  import java.sql.Timestamp

  private def ts(min: Long) = new Timestamp(min * 60000)

  test("sessionize streams to a checkpointed parquet sink") {
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft-sink-stream").toString
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Event]
    val q = graft.streaming.StreamOps.sessionize(mem.toDS(), gapSeconds = 1800)
      .writeStream
      .format("parquet")
      .option("path", s"$base/out")
      .option("checkpointLocation", s"$base/ckpt")
      .outputMode("append")
      .start()
    try {
      mem.addData(Event(1, ts(100), 1, "click", 1.0), Event(2, ts(110), 1, "click", 2.0))
      q.processAllAvailable()
      mem.addData(Event(3, ts(700), 1, "click", 4.0))
      q.processAllAvailable()
      mem.addData(Event(4, ts(2100), 1, "click", 8.0))
      q.processAllAvailable()
      val out = spark.read.parquet(s"$base/out")
        .select("user_id", "n_events", "total_value")
        .as[(Long, Long, Double)].collect().toSet
      assert(out.contains((1L, 2L, 3.0)))
      assert(new java.io.File(s"$base/ckpt").exists()) // durable progress
    } finally q.stop()
  }
}

/** The curation-tier operators that matter on a CONTINUOUS ingest —
  * deterministic sampling/splitting and quality gating — are stateless
  * Column predicates, so the exact batch operators run unchanged on a
  * stream (no state store, no watermark needed). This spec pins that
  * contract: same rows kept, streaming or not.
  */
class StreamCurationSpec extends graft.SparkSpec {
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
  import org.apache.spark.sql.streaming.OutputMode
  import graft.streaming.StreamOps.Event
  import java.sql.Timestamp
  import spark.implicits._

  private def ev(i: Long) = Event(i, new Timestamp(i * 60000), i % 7, "doc", i.toDouble)

  test("deterministic hash sampling keeps identical rows on stream and batch") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val rows = (1L to 500L).map(ev)
    mem.addData(rows: _*)
    val q = graft.operators.Sampling.bernoulli(mem.toDF(), "event_id", 3000)
      .writeStream.format("memory").queryName("ssample")
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("ssample").select("event_id").as[Long].collect().toSet
      val batch = graft.operators.Sampling.bernoulli(rows.toDF(), "event_id", 3000)
        .select("event_id").as[Long].collect().toSet
      assert(streamed == batch && streamed.nonEmpty)
    } finally q.stop()
  }

  test("train/test split labels a stream identically to batch") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val rows = (1L to 300L).map(ev)
    mem.addData(rows: _*)
    val q = graft.operators.Sampling.splitLabel(mem.toDF(), "event_id", 2000)
      .writeStream.format("memory").queryName("ssplit")
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("ssplit").select("event_id", "split")
        .as[(Long, String)].collect().toMap
      val batch = graft.operators.Sampling.splitLabel(rows.toDF(), "event_id", 2000)
        .select("event_id", "split").as[(Long, String)].collect().toMap
      assert(streamed == batch)
      assert(streamed.values.toSet == Set("train", "test"))
    } finally q.stop()
  }
}

/** Streaming packing: the stateful curation twin — bins must match the
  * batch operator exactly when docs arrive in order. */
class StreamPackingSpec extends graft.SparkSpec {
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
  import org.apache.spark.sql.streaming.OutputMode
  import graft.streaming.StreamOps.Doc
  import spark.implicits._

  test("stream bins equal batch bins, and state carries across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val docs = (1L to 60L).map(i => Doc(i, if (i % 2 == 0) "a" else "b", 100L))
    val mem = MemoryStream[Doc]
    val q = graft.streaming.StreamOps.packStream(mem.toDS(), budget = 256)
      .writeStream.format("memory").queryName("spack")
      .outputMode(OutputMode.Append()).start()
    try {
      // two micro-batches: the second must continue each stratum's
      // fill from state, not restart at offset 0
      mem.addData(docs.take(30): _*)
      q.processAllAvailable()
      mem.addData(docs.drop(30): _*)
      q.processAllAvailable()
      val streamed = spark.table("spack")
        .select("strat", "doc_id", "bin").as[(String, Long, Long)]
        .collect().toSet
      val batch = graft.operators.Packing.packByBudget(
          docs.toDF(), Seq("strat"), "doc_id", "n_tok", budget = 256)
        .select("strat", "doc_id", "bin").as[(String, Long, Long)]
        .collect().toSet
      assert(streamed == batch)
      // 30 docs × 100 tok per stratum → bins 0..11 used across strata
      assert(streamed.map(_._3).max > 0)
    } finally q.stop()
  }
}
