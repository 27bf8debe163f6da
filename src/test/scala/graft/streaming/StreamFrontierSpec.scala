package graft.streaming

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Streaming crawl-frontier gate (VERDICT r13 #7): robots verdicts +
  * politeness slots assigned on arrival must equal the BATCH
  * crawl_robots_filter + crawl_schedule computation on every
  * doc_id-ordered arrival prefix — slots continue across triggers
  * (the per-host counter is the stream state), blocked URLs pass
  * through unslotted. */
class StreamFrontierSpec extends graft.SparkSpec {
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
  import spark.implicits._

  private val rules = Map(
    "a.example" -> Seq(
      ("disallow", "/docs/3"),
      ("allow", "/docs/3/x.html"),   // longest match overrides
      ("disallow", "/priv")),
    "b.example" -> Seq(("disallow", "/")) // block-all
    // c.example: no rules → everything allowed
  )

  /** The batch twin, in the batch queries' own idiom: broadcast rule
    * join + longest-match struct argmax (crawl_robots_filter), then
    * the per-host row_number slot walk over ALLOWED urls
    * (crawl_schedule), blocked urls unioned back unslotted. */
  private def batchFrontier(rows: Seq[(Long, String, String)]) = {
    val df = rows.toDF("doc_id", "source", "path")
    val rulesDf = rules.toSeq.flatMap { case (h, rs) =>
      rs.map { case (v, rp) => (h, v, rp) }
    }.toDF("rsource", "verdict", "rp")
    val verdicts = df.join(broadcast(rulesDf),
        $"source" === $"rsource" && $"path".startsWith($"rp"), "left")
      .groupBy($"doc_id", $"source", $"path")
      .agg(max(when($"rp".isNotNull,
        struct(length($"rp").as("l"),
          ($"verdict" === "allow").cast("int").as("a")))).as("best"))
      .withColumn("allowed", $"best".isNull || $"best.a" === 1)
      .withColumn("delay_ms",
        (conv(substring(md5($"source"), 32, 1), 16, 10).cast("long")
          % 4 + 1) * 250)
    val w = Window.partitionBy($"source").orderBy($"doc_id")
    val sched = verdicts.filter($"allowed")
      .withColumn("slot", row_number().over(w).cast("long") - 1)
      .withColumn("fetch_at_ms", $"slot" * $"delay_ms")
    val blocked = verdicts.filter(!$"allowed")
      .withColumn("slot", lit(null).cast("long"))
      .withColumn("fetch_at_ms", lit(null).cast("long"))
    sched.unionByName(blocked)
      .select($"doc_id", $"source", $"path", $"allowed", $"slot",
        $"delay_ms", $"fetch_at_ms")
      .as[(Long, String, String, Boolean, Option[Long], Long, Option[Long])]
      .collect().toSet
  }

  test("stream verdicts + slots equal the batch frontier on every prefix") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamOps.FrontierUrl]
    val q = StreamOps.frontierStream(mem.toDS(), rules)
      .toDF("doc_id", "source", "path", "allowed", "slot", "delay_ms",
        "fetch_at_ms")
      .writeStream.format("memory").queryName("frontier")
      .outputMode("append").start()
    val first = Seq(
      (1L, "a.example", "/docs/1"),          // no match → allowed
      (2L, "a.example", "/docs/3/y.html"),   // disallow /docs/3
      (3L, "a.example", "/docs/3/x.html"),   // allow overrides (longer)
      (4L, "b.example", "/anything"),        // block-all host
      (5L, "c.example", "/docs/9"),          // ruleless host
      (6L, "a.example", "/priv/x"))          // disallow /priv
    val second = Seq(
      (7L, "a.example", "/docs/2"),          // slot continues from t1
      (8L, "b.example", "/more"),            // still blocked
      (9L, "c.example", "/docs/10"))         // slot 1 on host c
    def streamed = spark.table("frontier")
      .as[(Long, String, String, Boolean, Option[Long], Long, Option[Long])]
      .collect().toSet
    try {
      mem.addData(first.map(StreamOps.FrontierUrl.tupled): _*)
      q.processAllAvailable()
      assert(streamed == batchFrontier(first))
      mem.addData(second.map(StreamOps.FrontierUrl.tupled): _*)
      q.processAllAvailable()
      val all = streamed
      assert(all == batchFrontier(first ++ second))
      // the politeness counter really continued: host a's trigger-2
      // url got slot 2 (after 2 ALLOWED arrivals in trigger 1 — docs
      // 2 and 6 were blocked and consumed no slot), never slot 0
      assert(all.collectFirst { case (7L, _, _, _, s, _, _) => s }
        .flatten.contains(2L))
      // and the RFC tie-break story: the longest-match allow survived
      assert(all.collectFirst { case (3L, _, _, a, _, _, _) => a }
        .contains(true))
    } finally q.stop()
  }
}
