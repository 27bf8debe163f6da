package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming twins of the batch temporal operators
  * (SURVEY.md §2.I): watermarked tumbling-window aggregation and
  * gap-based sessionization with arbitrary state.
  *
  * The reference processes its event stream incrementally with
  * per-worker progress state (scraper_v2.py:1423-1565); here the
  * state is managed by the engine — watermarks bound it, timeouts
  * purge it, and the same code runs on a 1000-executor cluster.
  */
// Serializable: stateful-op closures reference object-level helpers
// (weekStartMs), so task serialization captures the module instance.
object StreamOps extends Serializable {

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                   event_type: String, value: Double)

  case class SessionAcc(start: Long, end: Long, n: Long, total: Double)

  case class Session(user_id: Long, session_start: Timestamp,
                     session_end: Timestamp, n_events: Long, total_value: Double)

  /** Tumbling-window count/sum per event type. Watermark bounds state:
    * windows older than (max event time - delay) are finalized and
    * dropped. Batch twin: EventsQ "window_agg". */
  def windowedAgg(events: DataFrame, windowLen: String = "1 hour",
                  watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("w.start").as("bucket"), col("event_type"),
        col("n"), col("total_value"))

  /** Streaming data-quality monitor — the windowed twin of
    * [[graft.operators.Expectations.report]]: the same one-pass check
    * suite, grouped under a tumbling event-time window, so a
    * continuous ingest publishes a per-window admission report
    * (window, check, n_rows, violations, passed) instead of a
    * batch-end one. Restriction inherited from the engine: streaming
    * aggregation forbids DISTINCT aggregates, so a `unique(...)` check
    * (count - countDistinct) is rejected here — key-uniqueness on a
    * stream IS [[dedupeStream]]'s stateful job, not a windowed
    * aggregate. Watermark bounds state exactly as in [[windowedAgg]].
    */
  def expectationsStream(events: DataFrame,
                         checks: Seq[graft.operators.Expectations.Check],
                         windowLen: String = "1 hour",
                         watermarkDelay: String = "10 minutes"): DataFrame = {
    require(checks.nonEmpty, "empty expectation suite")
    val aggs = checks.zipWithIndex.map { case (c, i) =>
      coalesce(c.violations.cast("long"), lit(0L)).as(s"v$i")
    }
    val stackArgs = checks.zipWithIndex
      .map { case (c, i) => s"'${c.name}', v$i" }.mkString(", ")
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowLen).as("w"))
      .agg(count(lit(1)).as("n_rows"), aggs: _*)
      .selectExpr("w.start AS bucket", "n_rows",
        s"stack(${checks.size}, $stackArgs) AS (check_name, violations)")
      .select(col("bucket"), col("check_name"), col("n_rows"),
        col("violations"), (col("violations") === 0L).as("passed"))
  }

  /** Streaming equi-width histogram — the streaming proof of the
    * quantile sketch's mergeability claim (Scale "sketch_quantile"):
    * bin assignment is a stateless map and the per-bin counts are a
    * plain streaming aggregation, so the ≤`bins`-row sketch stays
    * current as micro-batches arrive (Complete output) and quantile
    * interpolation can run over it after any trigger. Bin parameters
    * are FIXED up front — a stream cannot 2-pass for min/max; at
    * scale they come from a prior batch profile or domain bounds.
    * Input column: `x` (long). */
  def histogramStream(values: DataFrame, lo: Long, w: Long,
                      bins: Int): DataFrame =
    values
      .select(least(
        floor((col("x") - lit(lo)).cast("double") / lit(w.toDouble)),
        lit((bins - 1).toLong)).cast("int").as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as("cnt"))

  /** Streaming twin of the batch `sessionize_native` query: Spark's
    * own session_window aggregation under a watermark — the
    * engine-managed alternative to [[sessionize]]'s explicit
    * flatMapGroupsWithState (same trade as batch: native windows when
    * count/sum suffice, arbitrary state when the session payload is
    * custom). Sessions close and emit (Append mode) once the
    * watermark passes their gap. */
  def sessionWindowStream(events: DataFrame, gap: String = "30 minutes",
                          watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"),
        max(col("ts")).as("last_ts"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("last_ts").as("session_end"), col("n_events"), col("total_value"))

  /** Streaming term census — the continuous-crawl DRIFT monitor's
    * live side (batch twin: Corpus "stats_drift"). The term explode
    * is stateless and the census a plain streaming aggregation, so
    * after any trigger the ≤|vocab|-row table joins a broadcast
    * REFERENCE census (from a prior admitted batch — a stream cannot
    * 2-pass its own totals) for the same per-term KL contributions
    * the batch query computes; [[klAgainst]] is that join, shared by
    * the batch and post-trigger paths. Input column: `text`. */
  def termCensusStream(docs: DataFrame): DataFrame =
    docs.select(explode(graft.functions.TextAnalysis.wsTokens(
        graft.functions.TextAnalysis.canonicalize(col("text")))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("c"))

  /** Streaming WORD-frequency census — the continuous-crawl side of
    * the tokenizer trainers (VERDICT r12 #8): BPE and the unigram-LM
    * trainer both consume a (w, freq) word census, and this maintains
    * exactly that census (same canonicalization as the batch
    * `bpeWords`/`unigramCensus` chain) as a plain streaming
    * aggregation over arriving documents. After any trigger the
    * ≤|vocab|-row table IS the trainers' input: a nightly
    * `UnigramLm.train`/BPE learn folds in everything the crawl has
    * admitted so far with no batch re-scan of the corpus — the
    * trainers are census-bounded by design, so the census is the only
    * corpus-sized pass and the stream has already paid it.
    * Differs from [[termCensusStream]] (the drift monitor) only in
    * schema — (w, freq) vs (term, c) — kept separate because the two
    * downstream contracts evolve independently. Input column: `text`. */
  def wordCensusStream(docs: DataFrame): DataFrame =
    docs.select(explode(graft.functions.TextAnalysis.wsTokens(
        graft.functions.TextAnalysis.canonicalize(col("text")))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))

  /** Streaming twin of [[graft.operators.KneserNey.bigramCensus]]: the
    * (w1, w2, c2) BOS-prepended bigram census over a continuous
    * document stream — the census is the KN trainer's sufficient
    * statistic and its only corpus-sized pass, so a nightly
    * KneserNey.trainFromCensus over this table retrains the CCNet
    * perplexity gate with NO corpus re-scan (the wordCensusStream
    * story, lifted to the LM). Same canonicalization and BOS contract
    * as the batch census; state is one count per bigram type. */
  def bigramCensusStream(docs: DataFrame): DataFrame =
    docs.select(graft.functions.TextAnalysis.wsTokens(
        graft.functions.TextAnalysis.canonicalize(col("text"))).as("tokens"))
      .filter(size(col("tokens")) >= 1)
      .select(explode(graft.operators.KneserNey.bigrams(col("tokens")))
        .as("bg"))
      .groupBy(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .agg(count(lit(1)).as("c2"))

  /** Streaming twin of `text_mojibake`'s census: per-language counts
    * of cp1252 double-encoding digraphs and U+FFFD replacement chars
    * over a continuous document stream — the live encoding monitor a
    * crawl runs so a mis-decoded feed shows up DURING ingestion, not
    * at the next batch census. Same replace-length counting identity
    * as the batch gate; plain streaming aggregation, state = one row
    * per language. Input columns: `lang`, `text`. */
  /** Streaming twin of dedup_cdc's chunk census: Chunker.cdcChunks is
    * a pure row-local generator (boundaries from an 8-char rolling
    * window hash), so the chunk census is a plain streaming
    * aggregation — the live duplication monitor of a continuous
    * crawl's content-defined dedup; state is one (n_occ, chunk_len)
    * row per chunk type. count(DISTINCT doc_id) is not a legal
    * streaming aggregate, so the twin maintains the OCCURRENCE census
    * (n_occ > 1 is the duplication signal a monitor alerts on; the
    * per-doc-distinct census stays a batch pass). Input columns:
    * doc_id, text. */
  def cdcCensusStream(docs: DataFrame): DataFrame =
    graft.operators.Chunker.cdcChunks(docs, "doc_id", "text")
      .groupBy(col("chunk_hash"))
      .agg(min(col("chunk_len")).as("chunk_len"),
        count(lit(1)).as("n_occ"))

  /** KLL rank-sketch census twin: the level assignment is row-local
    * (md5 leading-one bits \u2014 [[graft.operators.Kll.level]]), so the
    * (level, x, cnt) census is a plain streaming aggregation;
    * `Kll.fromCensus` derives the capacity-floored sketch from the
    * live census bit-identically to the batch build (KllSpec). A
    * continuous stream thus maintains rank/quantile state with no
    * range pre-pass \u2014 the gap the equi-width histogramStream's
    * min/max contract could not close. Input: (idCol, xCol) rows,
    * xCol integral. */
  def kllCensusStream(rows: DataFrame, idCol: String, xCol: String): DataFrame =
    rows.filter(col(xCol).isNotNull)
      .select(graft.operators.Kll.level(col(idCol)).as("level"),
        col(xCol).cast("long").as("x"))
      .groupBy(col("level"), col("x"))
      .agg(count(lit(1)).as("cnt"))

  def mojibakeStream(docs: DataFrame): DataFrame = {
    val moji = "\u00e2\u20ac\u2122"
    val repl = "\ufffd"
    val x = col("text")
    docs.select(col("lang"),
        ((length(x) - length(replace(x, lit(moji), lit("")))) / 3)
          .cast("long").as("n_moji"),
        (length(x) - length(replace(x, lit(repl), lit(""))))
          .cast("long").as("n_repl"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum((col("n_moji") > 0 || col("n_repl") > 0).cast("long"))
          .as("n_flagged"),
        sum(col("n_moji")).as("tot_moji"),
        sum(col("n_repl")).as("tot_repl"))
  }

  /** Streaming twin of [[graft.operators.NaiveBayes.tokenCensus]]: the
    * (label, token, cnt) census over a continuous labeled-document
    * stream — with [[nbDocCensusStream]] it carries BOTH of the NB
    * quality gate's sufficient statistics, so a nightly
    * NaiveBayes.trainFromCensus retrains the model-based filter with
    * NO corpus re-scan (the bigramCensusStream story, lifted to the
    * classifier). Input columns: `label`, `tokens`. */
  def nbTokenCensusStream(labeled: DataFrame): DataFrame =
    labeled.select(col("label"), explode(col("tokens")).as("token"))
      .filter(!col("token").isin(graft.operators.NaiveBayes.PriorToken,
        graft.operators.NaiveBayes.UnseenToken))
      .groupBy(col("label"), col("token"))
      .agg(count(lit(1)).as("cnt"))

  /** Streaming twin of [[graft.operators.NaiveBayes.docCensus]] — the
    * prior's (label, n) statistic; state is one count per class. */
  def nbDocCensusStream(labeled: DataFrame): DataFrame =
    labeled.groupBy(col("label")).agg(count(lit(1)).as("n"))

  /** Streaming twin of the [[graft.operators.Dedup.commonLines]]
    * census: normalized-line occurrence counts over a continuous
    * document stream — the live boilerplate monitor a crawl runs so
    * the nav-bar line that suddenly floods a domain shows up DURING
    * ingestion, not at the next batch census. Same normalization as
    * the batch operator (lowercase, whitespace-collapsed, empties
    * dropped); state is one count per distinct line, the same
    * bound as the batch shuffle's key space (a deployment ages it
    * with a watermark on arrival time when the line space is
    * open-ended). */
  def lineCensusStream(docs: DataFrame): DataFrame =
    docs.select(explode(split(col("text"), "\n")).as("raw"))
      .select(lower(trim(regexp_replace(col("raw"), "\\s+", " "))).as("line"))
      .filter(length(col("line")) > 0)
      .groupBy(col("line")).agg(count(lit(1)).as("n_occ"))

  /** Per-term KL contributions of `census` against `reference` (both
    * (term, c) frames), over shared terms — batch code, runnable on a
    * streamed census after any trigger. */
  def klAgainst(census: DataFrame, reference: DataFrame): DataFrame = {
    val ref = reference.select(col("term"), col("c").as("cr"))
    val tc = census.agg(sum(col("c")).cast("double").as("tc"))
    val tr = ref.agg(sum(col("cr")).cast("double").as("tr"))
    census.join(broadcast(ref), Seq("term"))
      .crossJoin(broadcast(tc)).crossJoin(broadcast(tr))
      .select(col("term"),
        graft.functions.PRound.pround((col("c") / col("tc")) *
          log((col("c") / col("tc")) / (col("cr") / col("tr"))), 6)
          .as("kl_term"))
  }

  /** Streaming Count-Min Sketch — with histogramStream this makes all
    * three sketches (HLL lives in HllStreamSpec) streaming-maintained:
    * the d-row bucket explode is stateless and the (j, bucket) counts
    * are a plain streaming aggregation, so the d×width sketch TABLE
    * stays current per trigger and equals the batch
    * operators.Sketch.countMin table over everything seen so far.
    * Input column: `key` (string-castable). */
  def cmsStream(values: DataFrame, depth: Int = 4,
                width: Int = 64): DataFrame =
    values
      .select(graft.operators.Sketch.buckets(col("key"), depth, width).as("rb"))
      .select(col("rb.j").as("j"), col("rb.bucket").as("bucket"))
      .groupBy(col("j"), col("bucket")).agg(count(lit(1)).as("cnt"))

  /** Rolling-MAU register stream — the streaming twin of the batch
    * `dau_mau_stickiness` rolling HLL (VERDICT r11 #3). The batch
    * query's rolling state IS a register frame (window MAX over
    * per-day (b, reg) rows); here the SLIDING event-time window does
    * the rolling union natively: every event lands in the `days`
    * windows that cover its day (slide = 1 day), keyed by HLL bucket,
    * and groupBy max(rank) per (window, b) is exactly the `days`-day
    * union sketch — max is associative/commutative/idempotent, so no
    * second stateful stage exists. Update-mode emissions carry
    * (d = window end − 1 day, b, reg28); the harmonic estimate is a
    * stateless fold the consumer applies to the latest per-(d, b)
    * state (Sketch.hllEstimate's formula), identical to batch's
    * Window.rangeBetween(−(days−1), 0) max. State is calendar-bounded:
    * days-in-watermark × days × 64 register rows, at ANY corpus size.
    * Hashing is [[graft.operators.Sketch.hllBucketRank]] — the same
    * md5 slices as batch, so stream registers ≡ batch registers
    * bit-for-bit per trigger prefix (StreamStickinessSpec). */
  def stickinessStream(events: DataFrame, days: Int = 28,
                       watermarkDelay: String = "35 days"): DataFrame = {
    val (b, r) = graft.operators.Sketch.hllBucketRank(col("user_id"))
    events
      .withWatermark("ts", watermarkDelay)
      .select(col("ts"), b.as("b"), r.as("r"))
      .groupBy(window(col("ts"), s"$days days", "1 day").as("w"), col("b"))
      .agg(max(col("r")).as("reg28"))
      .select(date_sub(to_date(col("w.end")), 1).as("d"), col("b"),
        col("reg28"))
  }

  /** Watermarked stream-stream inner join: each purchase pairs with
    * the same user's views from the preceding `lookback` window. Both
    * sides carry watermarks and the join condition bounds event time,
    * so the state store evicts rows once they can no longer match —
    * the requirement for joining two unbounded streams with finite
    * state. Batch twin: the as-of/time-range joins in operators. */
  def streamJoin(purchases: DataFrame, views: DataFrame,
                 lookback: String = "1 hour",
                 watermarkDelay: String = "10 minutes"): DataFrame = {
    val p = purchases.withWatermark("ts", watermarkDelay)
      .select(col("user_id"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"))
    val v = views.withWatermark("ts", watermarkDelay)
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
        col("event_id").as("view_id"))
    p.join(v, col("user_id") === col("v_user") &&
        col("v_ts") <= col("p_ts") &&
        col("v_ts") >= col("p_ts") - expr(s"INTERVAL $lookback"))
      .select(col("user_id"), col("purchase_id"), col("view_id"),
        col("p_ts"), col("v_ts"))
  }

  /** Exact dedup on a stream: keep the first row per key, with state
    * bounded by the watermark (keys older than the delay are purged —
    * the only way streaming dedup state stays finite). The streaming
    * twin of [[graft.operators.Dedup.exact]] for continuous corpus
    * ingestion; dedup by content hash, not raw text, so the state
    * store holds fixed-width keys. */
  def dedupeStream(events: DataFrame, keyCols: Seq[String],
                   tsCol: String = "ts",
                   watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(keyCols)

  case class Doc(doc_id: Long, strat: String, n_tok: Long)

  case class PackedDoc(strat: String, doc_id: Long, bin: Long)

  case class PackState(filled: Long)

  /** Streaming sequence packing — the stateful twin of
    * [[graft.operators.Packing.packByBudget]] for a CONTINUOUS
    * curation feed: per stratum, the running token offset lives in
    * group state, and each arriving doc is assigned the bin its start
    * offset falls in (bin = start div budget — same rule as batch, so
    * a stream processed in doc_id order produces the identical bins).
    * Docs inside a micro-batch are sorted by doc_id before folding:
    * Spark does not guarantee intra-batch order, and packing is
    * order-sensitive by definition. State is one counter per stratum
    * — O(|strata|), no timeout needed (strata are long-lived). */
  def packStream(docs: Dataset[Doc], budget: Long): Dataset[PackedDoc] = {
    import docs.sparkSession.implicits._
    require(budget > 0, s"budget must be positive, got $budget")

    def update(strat: String, it: Iterator[Doc],
               state: GroupState[PackState]): Iterator[PackedDoc] = {
      var filled = state.getOption.map(_.filled).getOrElse(0L)
      val out = it.toSeq.sortBy(_.doc_id).map { d =>
        val bin = filled / budget
        filled += d.n_tok
        PackedDoc(strat, d.doc_id, bin)
      }
      state.update(PackState(filled))
      out.iterator
    }

    docs.groupByKey(_.strat)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(update)
  }

  case class FrontierUrl(doc_id: Long, source: String, path: String)

  case class FrontierOut(doc_id: Long, source: String, path: String,
                         allowed: Boolean, slot: Option[Long],
                         delay_ms: Long, fetch_at_ms: Option[Long])

  /** Streaming CRAWL FRONTIER gate (round 14, VERDICT r13 #7 — the
    * continuous twin of the batch crawl family): each arriving URL
    * gets its ROBOTS verdict (RFC 9309 longest-matching-prefix,
    * Allow beats Disallow at equal length, no match → allowed — the
    * crawl_robots_filter rule, computed row-locally against the
    * host's rule list) and, when allowed, its POLITENESS slot —
    * crawl_schedule's per-host row_number restated as a stateful
    * counter via flatMapGroupsWithState: state is ONE long per host
    * (the next slot), fetch_at = slot × the host's deterministic
    * crawl delay (md5 nibble → 250/500/750/1000 ms, the batch
    * idiom). Blocked URLs pass through with allowed=false and no
    * slot — a monitor sees the whole verdict stream.
    *
    * The rules ride the closure as a plain Map (a robots cache is
    * hosts×≤4 entries — broadcast weight); per trigger each host's
    * arrivals are processed in doc_id order, so the stream equals the
    * batch schedule on any doc_id-ordered arrival prefix
    * (StreamFrontierSpec) — the per-host FIFO a real frontier is.
    * State is O(|hosts|), no timeout (hosts are long-lived). */
  def frontierStream(urls: Dataset[FrontierUrl],
                     rules: Map[String, Seq[(String, String)]]): Dataset[FrontierOut] = {
    import urls.sparkSession.implicits._

    def update(host: String, it: Iterator[FrontierUrl],
               state: GroupState[Long]): Iterator[FrontierOut] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val delay = ((md.digest(host.getBytes("UTF-8"))(15) & 0x0F) % 4 + 1) * 250L
      val hostRules = rules.getOrElse(host, Nil)
      var slot = state.getOption.getOrElse(0L)
      val out = it.toSeq.sortBy(_.doc_id).map { u =>
        val hits = hostRules.filter { case (_, rp) => u.path.startsWith(rp) }
        val allowed = hits.isEmpty || {
          val best = hits.maxBy { case (v, rp) =>
            (rp.length, if (v == "allow") 1 else 0)
          }
          best._1 == "allow"
        }
        if (allowed) {
          val s = slot; slot += 1
          FrontierOut(u.doc_id, u.source, u.path, allowed = true,
            Some(s), delay, Some(s * delay))
        } else
          FrontierOut(u.doc_id, u.source, u.path, allowed = false,
            None, delay, None)
      }
      state.update(slot)
      out.iterator
    }

    urls.groupByKey(_.source)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(update)
  }

  case class Ranked(event_type: String, rk: Int, event_id: Long, value: Double)

  /** Streaming top-k per key — the stateful twin of the TopKPerKey
    * physical operator ([[graft.plans.TopKPerKey]]): group state holds
    * AT MOST k (value, id) pairs per key (a bounded heap), each
    * micro-batch merges its rows into the state and re-emits the
    * group's refreshed ranking. State is O(|keys|·k) regardless of
    * stream length — the property that lets a ranking run forever;
    * no timeout, because a live leaderboard never expires.
    *
    * Emissions are Update-mode: downstream upserts by
    * (event_type, rk). After ANY prefix of the stream, the latest
    * emission per key equals the batch TopK.perKey over that prefix —
    * StreamTopKSpec pins stream ≡ batch across multiple triggers.
    * Ordering matches the batch operator: value desc, id asc. */
  def topKStream(events: Dataset[Event], k: Int): Dataset[Ranked] = {
    import events.sparkSession.implicits._
    require(k > 0, s"k must be positive, got $k")

    def update(key: String, it: Iterator[Event],
               state: GroupState[Seq[(Double, Long)]]): Iterator[Ranked] = {
      val merged = (state.getOption.getOrElse(Seq.empty) ++
          it.map(e => (e.value, e.event_id)))
        .sortBy { case (v, id) => (-v, id) }
        .take(k)
      state.update(merged)
      merged.iterator.zipWithIndex.map { case ((v, id), i) =>
        Ranked(key, i + 1, id, v)
      }
    }

    events.groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout())(update)
  }

  /** Per-user funnel state in epoch ms: the minimal view, plus the
    * click/purchase candidates that can still win (see funnelStream's
    * pruning proof). */
  case class FunnelState(minView: Option[Long], clicks: Seq[Long],
                         purchases: Seq[Long])

  case class UserFunnel(user_id: Long, step: Int, t1: Option[Timestamp],
                        t2: Option[Timestamp], t3: Option[Timestamp])

  /** Streaming conversion funnel — the stateful twin of the batch
    * `funnel_steps` query (view → click → purchase, each step's
    * earliest event strictly after the previous step's completion),
    * EXACT under arbitrary out-of-order arrival. The subtlety a naive
    * 3-timestamp state gets wrong: a late-arriving EARLIER view drops
    * t1, which can make a click that was previously ≤ t1 eligible —
    * so clicks cannot be discarded just because they precede the
    * current t1. The state kept is provably minimal for exactness:
    * t1 only ever decreases, so the click candidate set only grows,
    * so t2 = min{click > t1} only decreases — a click above the
    * current t2 can never win and is pruned; symmetrically for
    * purchases vs t3. State per user = one view ts + clicks ≤ t2 +
    * purchases ≤ t3 (everything, until the step first completes).
    * Update mode: each trigger re-emits the user's current depth and
    * step timestamps. */
  def funnelStream(events: Dataset[Event]): Dataset[UserFunnel] = {
    import events.sparkSession.implicits._

    def update(user: Long, it: Iterator[Event],
               state: GroupState[FunnelState]): Iterator[UserFunnel] = {
      val prev = state.getOption.getOrElse(FunnelState(None, Nil, Nil))
      var minView = prev.minView
      var clicks = prev.clicks
      var purchases = prev.purchases
      it.foreach { e =>
        val t = e.ts.getTime
        e.event_type match {
          case "view"     => if (minView.forall(t < _)) minView = Some(t)
          case "click"    => clicks = clicks :+ t
          case "purchase" => purchases = purchases :+ t
          case _          => ()
        }
      }
      val t1 = minView
      val t2 = t1.flatMap(a => clicks.filter(_ > a).minOption)
      val t3 = t2.flatMap(b => purchases.filter(_ > b).minOption)
      clicks = (t2 match {
        case Some(b) => clicks.filter(_ <= b)
        case None    => clicks
      }).distinct.sorted
      purchases = (t3 match {
        case Some(c) => purchases.filter(_ <= c)
        case None    => purchases
      }).distinct.sorted
      state.update(FunnelState(t1, clicks, purchases))
      val step = if (t3.isDefined) 3 else if (t2.isDefined) 2
        else if (t1.isDefined) 1 else 0
      Iterator(UserFunnel(user, step, t1.map(new Timestamp(_)),
        t2.map(new Timestamp(_)), t3.map(new Timestamp(_))))
    }

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout())(update)
  }

  case class Change(k: Long, v: String, seq: Long, op: String)

  case class KeyState(k: Long, v: String, deleted: Boolean)

  /** Streaming CDC apply — the stream-table materialization twin of
    * [[graft.operators.Merge.cdcApply]]: group state holds each key's
    * latest (seq, payload, tombstone); every micro-batch folds its
    * changes in seq order and emits the key's refreshed state
    * (Update mode; downstream upserts by key, dropping tombstones).
    *
    * A change with a seq at-or-below the state's is IGNORED, so
    * out-of-order delivery ACROSS micro-batches converges to the same
    * final state as the batch operator over the full log — the
    * at-least-once/shuffled-delivery contract. State is one row per
    * live key, independent of stream length. */
  def cdcApplyStream(changes: Dataset[Change]): Dataset[KeyState] = {
    import changes.sparkSession.implicits._

    def update(k: Long, it: Iterator[Change],
               state: GroupState[(Long, String, Boolean)]): Iterator[KeyState] = {
      var cur = state.getOption.orNull
      it.toSeq.sortBy(_.seq).foreach { c =>
        if (cur == null || c.seq > cur._1)
          cur = (c.seq, c.v, c.op == "D")
      }
      if (cur == null) Iterator.empty
      else {
        state.update(cur)
        Iterator(KeyState(k, cur._2, cur._3))
      }
    }

    changes.groupByKey(_.k)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout())(update)
  }

  case class DailyCount(event_type: String, day: Int, n: Long)

  case class EwmaOut(event_type: String, day: Int, n: Long, ewma: Double)

  /** Streaming EWMA — the stateful twin of the batch "ewma_smooth"
    * query (adjusted EWMA, α=0.5) in RESCALED recursive form: state
    * per key is just (num, den) with num′ = x + num/2, den′ = 1 +
    * den/2, and y = num′/den′ equals the batch Σ2ⁱxᵢ/Σ2ⁱ in real
    * arithmetic (the 2⁻ᵗ rescale cancels in the ratio) — so the
    * monitor holds O(1) state per key FOREVER, never a series.
    * Halving is exact binary arithmetic; stream and batch agree
    * bit-for-beat until series depth ~50 (then differ only at ulp —
    * the spec pins 1e-9). Within a trigger rows sort by day; across
    * triggers days must arrive non-decreasing per key (the
    * [[intervalActiveStream]] contract — a replayed closed day would
    * re-weight history). */
  def ewmaStream(daily: Dataset[DailyCount]): Dataset[EwmaOut] = {
    import daily.sparkSession.implicits._

    def update(k: String, it: Iterator[DailyCount],
               state: GroupState[(Double, Double)]): Iterator[EwmaOut] = {
      var (num, den) = state.getOption.getOrElse((0.0, 0.0))
      val out = it.toSeq.sortBy(_.day).map { d =>
        num = d.n + num / 2; den = 1.0 + den / 2
        EwmaOut(k, d.day, d.n, num / den)
      }
      state.update((num, den))
      out.iterator
    }

    daily.groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(update)
  }

  case class CusumOut(event_type: String, day: Int, n: Long,
                      cusum: Double, alarm: Boolean)

  /** Streaming CUSUM — the stateful twin of the batch
    * "changepoint_cusum" query. The closed window form (running
    * Σ(x−μ) minus its own running min) needs only TWO doubles of
    * state per key, updated recursively — O(1) forever, like
    * [[ewmaStream]]. μ/σ come from an admitted REFERENCE batch (a
    * stream cannot 2-pass its own totals — the [[termCensusStream]]
    * rule); keys without a reference never alarm (σ treated ∞).
    * Same non-decreasing-day contract across triggers. */
  def cusumStream(daily: Dataset[DailyCount],
                  ref: Map[String, (Double, Double)]): Dataset[CusumOut] = {
    import daily.sparkSession.implicits._

    def update(k: String, it: Iterator[DailyCount],
               state: GroupState[(Double, Double)]): Iterator[CusumOut] = {
      val (mu, sigma) = ref.getOrElse(k, (0.0, Double.PositiveInfinity))
      var (srun, smin) = state.getOption.getOrElse((0.0, Double.MaxValue))
      val out = it.toSeq.sortBy(_.day).map { d =>
        srun += d.n - mu
        smin = math.min(smin, srun)
        val c = srun - smin
        CusumOut(k, d.day, d.n, c, c > 3 * sigma)
      }
      state.update((srun, smin))
      out.iterator
    }

    daily.groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(update)
  }

  case class Interval(item_id: Long, start_day: Int, end_day: Int)

  case class ActiveDay(day: Int, net: Long, n_active: Long)

  /** Sweep state: open-horizon day→net pairs, running total, horizon.
    * (Public + Seq-of-pairs: the product encoder's generated code
    * cannot construct private classes or some Map shapes.) */
  case class SweepState(pending: Seq[(Int, Long)], cum: Long, maxStart: Int)

  /** Streaming interval-concurrency sweep — the stateful twin of the
    * batch +1/−1 endpoint trick (EventsQ "interval_active"): each
    * interval contributes +1 at `start_day` and −1 at `end_day`
    * (exclusive); the emission is the per-day net and the running
    * active count.
    *
    * Finality without watermarks, from the feed's natural order:
    * intervals arrive in NON-DECREASING start_day order (the contract,
    * like packStream's doc_id order), so every delta any future
    * interval can contribute lands at ≥ the max start seen — days
    * strictly below it are closed and emitted in day order,
    * Append-mode. State holds only the OPEN horizon: the pending
    * day→net map spans at most the longest interval length, O(maxLen)
    * regardless of stream length. Days at/after the horizon emit when
    * a later start advances it (a sentinel interval past the last day
    * flushes everything). */
  def intervalActiveStream(intervals: Dataset[Interval]): Dataset[ActiveDay] = {
    import intervals.sparkSession.implicits._

    def update(key: Int, it: Iterator[Interval],
               state: GroupState[SweepState]): Iterator[ActiveDay] = {
      val ivs = it.toSeq
      val st = state.getOption.getOrElse(SweepState(Seq.empty, 0L, Int.MinValue))
      var pending = st.pending.toMap
      ivs.foreach { iv =>
        pending = pending.updated(iv.start_day,
          pending.getOrElse(iv.start_day, 0L) + 1)
        pending = pending.updated(iv.end_day,
          pending.getOrElse(iv.end_day, 0L) - 1)
      }
      val horizon = (st.maxStart +: ivs.map(_.start_day)).max
      val (ready, rest) = pending.partition(_._1 < horizon)
      var cum = st.cum
      val out = ready.toSeq.sortBy(_._1).map { case (d, net) =>
        cum += net
        ActiveDay(d, net, cum)
      }
      state.update(SweepState(rest.toSeq, cum, horizon))
      out.iterator
    }

    // the sweep is a single global prefix over the day axis (one
    // group); at cluster scale the axis would shard by coarse day
    // range with per-shard offsets merged downstream
    intervals.groupByKey(_ => 0)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(update)
  }

  /** (tsMs, id, value) right rows + pending left rows carrying their
    * last-emitted match (tsMs, id, lastRightId, lastValue) + max event
    * time seen. Public product shapes for the state encoder, like
    * [[SweepState]]. */
  case class AsOfState(rights: Seq[(Long, Long, Double)],
                       lefts: Seq[(Long, Long, Option[Long], Option[Double])],
                       maxTs: Long)

  case class AsOfOut(event_id: Long, user_id: Long, ts: Timestamp,
                     view_event_id: Option[Long], view_value: Option[Double])

  /** Last event per user: (µs, event_id, event_type, value). The id
    * rides along so equal-timestamp events split ACROSS triggers keep
    * the batch (us, event_id) tie order — without it a same-µs event
    * arriving in a later trigger would be accepted regardless of id
    * and the attribution would diverge from the batch sort. Public
    * product shape for the state encoder. */
  case class TwState(us: Long, id: Long, tpe: String, value: Double)

  /** One CLOSED interval's contribution: the previous event's value
    * weighted by the seconds until this event — 6-dp-rounded exactly
    * like the batch query's per-row contributions. */
  case class TwContrib(event_type: String, wv: Double, dw: Double)

  /** Streaming twin of `interval_weighted_avg`'s contribution stage:
    * an event's value holds until the user's NEXT event, so each
    * arriving event CLOSES the previous interval and emits its
    * (type, value·duration, duration) contribution — O(1) state per
    * user (the single open interval), Append mode. Summing the
    * emitted contributions per type reproduces the batch
    * time-weighted average over everything seen so far at every
    * trigger (spec-pinned as a multiset of contributions).
    *
    * Contract: per-user arrival across triggers must respect the
    * batch sort order (ts, event_id) — per-device telemetry's natural
    * order; an event sorting BEFORE the open interval (older ts, or
    * equal ts with a smaller id) is dropped, the same monotone-per-key
    * contract events_dedup_window documents. Within a trigger, rows
    * process in (ts, event_id) order, exactly the batch window's
    * sort. */
  def timeWeightedStream(events: Dataset[Event]): Dataset[TwContrib] = {
    import events.sparkSession.implicits._
    // PRound.pround's exact form — sign·floor(|x|·10⁶+0.5)/10⁶ — so
    // stream contributions are bit-identical to the batch column
    def r6(x: Double): Double =
      math.signum(x) * math.floor(math.abs(x) * 1e6 + 0.5) / 1e6
    def micros(t: Timestamp): Long = t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
    def update(userId: Long, it: Iterator[Event],
               state: GroupState[TwState]): Iterator[TwContrib] = {
      val rows = it.toSeq.sortBy(e => (micros(e.ts), e.event_id))
      var st = state.getOption
      val out = Seq.newBuilder[TwContrib]
      rows.foreach { e =>
        val us = micros(e.ts)
        st match {
          case Some(TwState(pus, pid, ptype, pval))
              if us > pus || (us == pus && e.event_id >= pid) =>
            val durS = (us - pus).toDouble / 1e6
            out += TwContrib(ptype, r6(pval * durS), r6(durS))
            st = Some(TwState(us, e.event_id, e.event_type, e.value))
          case Some(_) => // sorts before the open interval: dropped
          case None => st = Some(TwState(us, e.event_id, e.event_type, e.value))
        }
      }
      st.foreach(state.update)
      out.result().iterator
    }
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(update)
  }

  /** One CLOSED dwell gap: the seconds from an event to the SAME
    * user's next event, attributed to the EARLIER event's type —
    * exactly the batch events_dwell gap column (µs-exact double
    * division, no rounding needed: µs deltas are integers far below
    * 2^53). */
  case class DwellGap(event_type: String, gap_s: Double)

  /** Streaming twin of `events_dwell`'s gap stage (VERDICT r10 #6):
    * each arriving event CLOSES the user's single open interval and
    * emits the PREVIOUS event's (type, gap seconds) — O(1) state per
    * user ([[timeWeightedStream]]'s shape; the state is reused, its
    * value field simply unused), Append mode. Aggregating the emitted
    * gaps per type (count / median / p95) reproduces the batch dwell
    * profile over everything seen so far at every trigger; the gaps
    * themselves are spec-pinned as a multiset (the strongest
    * stream ≡ batch form — no aggregate to hide a swap).
    *
    * Same monotone-per-key arrival contract as [[timeWeightedStream]]:
    * per-user arrival across triggers must respect the batch
    * (ts, event_id) sort; an event sorting BEFORE the open interval
    * is dropped. */
  def dwellStream(events: Dataset[Event]): Dataset[DwellGap] = {
    import events.sparkSession.implicits._
    def micros(t: Timestamp): Long = t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
    def update(userId: Long, it: Iterator[Event],
               state: GroupState[TwState]): Iterator[DwellGap] = {
      val rows = it.toSeq.sortBy(e => (micros(e.ts), e.event_id))
      var st = state.getOption
      val out = Seq.newBuilder[DwellGap]
      rows.foreach { e =>
        val us = micros(e.ts)
        st match {
          case Some(TwState(pus, pid, ptype, _))
              if us > pus || (us == pus && e.event_id >= pid) =>
            out += DwellGap(ptype, (us - pus).toDouble / 1e6)
            st = Some(TwState(us, e.event_id, e.event_type, e.value))
          case Some(_) => // sorts before the open interval: dropped
          case None => st = Some(TwState(us, e.event_id, e.event_type, e.value))
        }
      }
      st.foreach(state.update)
      out.result().iterator
    }
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(update)
  }

  /** Touch rows (tsMs, id, channel) + pending purchases carrying
    * their last-emitted channel (tsMs, id, value, lastChannel) + max
    * event time seen. Public product shape for the state encoder. */
  case class AttrState(touches: Seq[(Long, Long, String)],
                       lefts: Seq[(Long, Long, Double, Option[String])],
                       maxTs: Long)

  case class AttrOut(event_id: Long, user_id: Long, ts: Timestamp,
                     channel: Option[String], value: Double)

  /** Streaming last-touch attribution — the continuous twin of the
    * `attribution_last` batch query: each purchase credits the
    * non-purchase event with the greatest (ts, event_id)
    * lexicographically BEFORE its own (ts, event_id) — exactly the
    * batch window's `last(..., ignoreNulls)` over (ts, event_id)
    * order, so equal-timestamp ties resolve identically.
    *
    * The asofStream skeleton: one keyed stream, Update-mode DELTAS
    * (a purchase emits on arrival and again only when a late touch
    * CHANGES its channel — per-trigger volume O(new + changed)),
    * state bounded by the lookback horizon with purchases final below
    * it and touches collapsing to the single latest sub-horizon row
    * (the only one a future purchase can still credit). After any
    * trigger prefix the latest emission per purchase equals the batch
    * window over that prefix (StreamAttributionSpec pins it,
    * including cross-trigger out-of-order arrival); the channel
    * rollup downstream is then an ordinary streaming aggregate.
    */
  def attributionStream(events: Dataset[Event], lookbackMs: Long): Dataset[AttrOut] = {
    import events.sparkSession.implicits._
    require(lookbackMs > 0, s"lookbackMs must be positive, got $lookbackMs")

    def update(userId: Long, it: Iterator[Event],
               state: GroupState[AttrState]): Iterator[AttrOut] = {
      val rows = it.toSeq
      val st = state.getOption.getOrElse(AttrState(Nil, Nil, Long.MinValue))
      val newTouches = rows.filter(_.event_type != "purchase")
        .map(e => (e.ts.getTime, e.event_id, e.event_type))
      val newLefts = rows.filter(_.event_type == "purchase")
        .map(e => (e.ts.getTime, e.event_id, e.value))
      val maxTs = (st.maxTs +: (newTouches.map(_._1) ++ newLefts.map(_._1))).max
      val horizon = maxTs - lookbackMs
      val allTouches = (st.touches ++ newTouches).sortBy(t => (t._1, t._2))
      val allLefts =
        (st.lefts.map(l => (l, false)) ++
          newLefts.map { case (lts, lid, v) =>
            ((lts, lid, v, Option.empty[String]), true)
          }).sortBy { case ((lts, lid, _, _), _) => (lts, lid) }
      val out = Seq.newBuilder[AttrOut]
      val updatedLefts = allLefts.map { case ((lts, lid, v, lastCh), isNew) =>
        val m = allTouches
          .filter(t => t._1 < lts || (t._1 == lts && t._2 < lid)).lastOption
        val ch = m.map(_._3)
        if (isNew || ch != lastCh)
          out += AttrOut(lid, userId, new Timestamp(lts), ch, v)
        (lts, lid, v, ch)
      }
      val (old, recent) = allTouches.partition(_._1 < horizon)
      state.update(AttrState(old.takeRight(1) ++ recent,
        updatedLefts.filter(_._1 >= horizon), maxTs))
      out.result().iterator
    }

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout())(update)
  }

  /** Streaming as-of join — the stateful twin of
    * [[graft.operators.AsOf.join]] (latest view at-or-before each
    * purchase, per user), completing the streaming mirror of the
    * temporal operators the way cdcApplyStream mirrors Merge.
    *
    * Both sides ride one keyed stream; group state holds the right
    * rows and the not-yet-final left rows. Emissions are Update-mode
    * DELTAS: a left emits on arrival and again only when a
    * late-arriving view CHANGES its best match (state carries each
    * pending left's last-emitted match), so per-trigger output volume
    * is O(new + changed lefts), not O(pending lefts) — the upsert
    * contract is unchanged because an unchanged pending left's
    * earlier emission is still its current best: after any trigger,
    * the latest emission per purchase equals the batch AsOf.join over
    * the prefix (StreamAsOfSpec pins this, including cross-batch
    * out-of-order arrival and the no-re-emission delta property).
    *
    * State stays bounded by the `lookbackMs` horizon (maxTs −
    * lookback, the watermark analog; the arrival contract is "rows
    * arrive at most lookback late"): lefts below the horizon are
    * final — no in-contract arrival can improve them — and are
    * evicted after their final emission; rights below it collapse to
    * the single LATEST one, which is the only sub-horizon row any
    * future left can still match (backward as-of reaches arbitrarily
    * far back, so it cannot be dropped entirely). O(rows in lookback
    * window + 1) per key, independent of stream length.
    *
    * Equal-timestamp ties replay the batch sweep's determinism: the
    * greatest (ts, id, value) right at-or-before the left wins. */
  def asofStream(events: Dataset[Event], lookbackMs: Long): Dataset[AsOfOut] = {
    import events.sparkSession.implicits._
    require(lookbackMs > 0, s"lookbackMs must be positive, got $lookbackMs")

    def update(userId: Long, it: Iterator[Event],
               state: GroupState[AsOfState]): Iterator[AsOfOut] = {
      val rows = it.toSeq
      val st = state.getOption.getOrElse(AsOfState(Nil, Nil, Long.MinValue))
      val newRights = rows.filter(_.event_type == "view")
        .map(e => (e.ts.getTime, e.event_id, e.value))
      val newLefts = rows.filter(_.event_type == "purchase")
        .map(e => (e.ts.getTime, e.event_id))
      val maxTs = (st.maxTs +: (newRights.map(_._1) ++ newLefts.map(_._1))).max
      val horizon = maxTs - lookbackMs
      val allRights = (st.rights ++ newRights).sorted
      // pending lefts carry their last-emitted match; arriving lefts
      // always emit (marked new). Matching runs against the FULL right
      // view of this trigger; eviction below only shapes what the
      // next trigger still holds.
      val allLefts =
        (st.lefts.map(l => (l, false)) ++
          newLefts.map { case (lts, lid) =>
            ((lts, lid, Option.empty[Long], Option.empty[Double]), true)
          }).sortBy { case ((lts, lid, _, _), _) => (lts, lid) }
      val out = Seq.newBuilder[AsOfOut]
      val updatedLefts = allLefts.map { case ((lts, lid, lastId, lastVal), isNew) =>
        val m = allRights.filter(_._1 <= lts).lastOption
        val (curId, curVal) = (m.map(_._2), m.map(_._3))
        if (isNew || curId != lastId || curVal != lastVal)
          out += AsOfOut(lid, userId, new Timestamp(lts), curId, curVal)
        (lts, lid, curId, curVal)
      }
      val (old, recent) = allRights.partition(_._1 < horizon)
      state.update(AsOfState(old.takeRight(1) ++ recent,
        updatedLefts.filter(_._1 >= horizon), maxTs))
      out.result().iterator
    }

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout())(update)
  }

  /** Streaming NEAREST as-of join — the stateful twin of
    * [[graft.operators.AsOf.joinNearest]] (the view CLOSEST to each
    * purchase in either direction; tie → the earlier view), completing
    * the streaming as-of family next to the backward [[asofStream]].
    *
    * Same skeleton: one keyed stream, Update-mode DELTAS (a purchase
    * emits on arrival and again only when a late view CHANGES its
    * nearest match), state = views in the lookback window + pending
    * purchases with their last emission. Tie replay of the batch
    * sweeps: backward candidate = greatest (ts, id, value) view at
    * ts ≤ purchase; forward candidate = SMALLEST (ts, id, value)
    * view at ts ≥ purchase (the batch forward sweep's desc-order
    * `last` = min struct); forward wins only on strictly smaller
    * distance. After any trigger, the latest emission per purchase
    * equals batch joinNearest over the prefix (StreamAsOfNearestSpec).
    *
    * Finality differs from backward as-of — a FUTURE view can still
    * improve a sub-horizon purchase (forward matches reach ahead), so
    * a purchase is evicted only when its current match distance is ≤
    * (horizon − its ts): every in-contract future view is farther.
    * A matchless purchase is retained until its first match makes it
    * evictable — state is O(window + unmatched purchases + 1), the
    * honest price of nearest semantics under late arrival. Sub-horizon
    * views collapse to the single latest one (the only sub-horizon
    * view a future purchase can still match backward). */
  def asofNearestStream(events: Dataset[Event], lookbackMs: Long): Dataset[AsOfOut] = {
    import events.sparkSession.implicits._
    require(lookbackMs > 0, s"lookbackMs must be positive, got $lookbackMs")

    def update(userId: Long, it: Iterator[Event],
               state: GroupState[AsOfState]): Iterator[AsOfOut] = {
      val rows = it.toSeq
      val st = state.getOption.getOrElse(AsOfState(Nil, Nil, Long.MinValue))
      val newRights = rows.filter(_.event_type == "view")
        .map(e => (e.ts.getTime, e.event_id, e.value))
      val newLefts = rows.filter(_.event_type == "purchase")
        .map(e => (e.ts.getTime, e.event_id))
      val maxTs = (st.maxTs +: (newRights.map(_._1) ++ newLefts.map(_._1))).max
      val horizon = maxTs - lookbackMs
      val allRights = (st.rights ++ newRights).sorted
      val allLefts =
        (st.lefts.map(l => (l, false)) ++
          newLefts.map { case (lts, lid) =>
            ((lts, lid, Option.empty[Long], Option.empty[Double]), true)
          }).sortBy { case ((lts, lid, _, _), _) => (lts, lid) }
      val out = Seq.newBuilder[AsOfOut]
      val survivors = Seq.newBuilder[(Long, Long, Option[Long], Option[Double])]
      allLefts.foreach { case ((lts, lid, lastId, lastVal), isNew) =>
        val b = allRights.filter(_._1 <= lts).lastOption // max (ts,id,v)
        val f = allRights.find(_._1 >= lts)              // min (ts,id,v)
        val m = (b, f) match {
          case (None, x) => x
          case (x, None) => x
          case (Some(bb), Some(ff)) =>
            if (ff._1 - lts < lts - bb._1) Some(ff) else Some(bb)
        }
        val (curId, curVal) = (m.map(_._2), m.map(_._3))
        if (isNew || curId != lastId || curVal != lastVal)
          out += AsOfOut(lid, userId, new Timestamp(lts), curId, curVal)
        // STRICT <: at distance exactly (horizon − lts) an in-contract
        // view arriving exactly at the horizon could still tie-break a
        // forward match to a smaller (id, value) — keep such a left
        val finalized = lts < horizon &&
          m.exists(mm => math.abs(mm._1 - lts) < horizon - lts)
        if (!finalized) survivors += ((lts, lid, curId, curVal))
      }
      val (old, recent) = allRights.partition(_._1 < horizon)
      state.update(AsOfState(old.takeRight(1) ++ recent,
        survivors.result(), maxTs))
      out.result().iterator
    }

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout())(update)
  }

  /** Per-user retention state: the cohort week (ms of Monday 00:00
    * UTC of the first-seen week) plus every distinct active week
    * (ms). State size = distinct active WEEKS per user — the coarse
    * granularity is the bound (52 longs per user-year), and it is
    * exactly the information the batch matrix needs; no horizon can
    * shrink it without changing retention semantics. */
  case class RetState(cohortMs: Long, weekMs: Seq[Long])

  /** One retention-matrix cell DELTA: summing `delta` per
    * (cohort, week_offset) over all emissions reproduces the batch
    * `events_retention` n_users matrix for the stream prefix. */
  case class RetDelta(cohort: Timestamp, week_offset: Long, delta: Int)

  /** Streaming weekly cohort retention — the continuous twin of the
    * `events_retention` batch query (cohort = Monday-truncated week of
    * the user's first event; each distinct active week increments the
    * (cohort, offset) cell). The matrix can't be emitted as-is from
    * per-user state (no single key owns a cell), so the stream emits
    * per-cell DELTAS in Append mode and the matrix is the running sum
    * per (cohort, week_offset) downstream — the ledger shape
    * timeWeightedStream uses.
    *
    * The interesting case is a LATE event that predates the user's
    * current cohort week: the user re-bases — every cell their old
    * cohort row contributed gets a -1 retraction and the re-based
    * (new cohort, new offsets) cells get +1, so the running sum is
    * exact (not approximately converging) after every trigger, with
    * out-of-order arrival in any split. StreamRetentionSpec pins
    * sum-of-deltas ≡ batch matrix per trigger prefix, including the
    * re-basing retraction.
    *
    * Per-trigger output volume: O(new distinct weeks) per quiet user,
    * O(|weeks|) only on a re-base (rare: it needs an event EARLIER
    * than everything seen for that user). */
  /** Monday-00:00 truncation in epoch-ms (UTC): day 0 is a Thursday,
    * so Monday-aligned weeks start at days ≡ -3 (mod 7) — identical
    * to the batch date_trunc("week", ts) under the UTC session tz
    * (engine-checked in StreamRetentionSpec). */
  private def weekStartMs(ms: Long): Long = {
    val day = Math.floorDiv(ms, 86400000L)
    (day - Math.floorMod(day + 3, 7)) * 86400000L
  }

  def retentionStream(events: Dataset[Event]): Dataset[RetDelta] = {
    import events.sparkSession.implicits._
    val wkMs = 7L * 86400000L
    def weekStart(ms: Long): Long = weekStartMs(ms)
    def offsets(cohort: Long, weeks: Seq[Long]): Seq[Long] =
      weeks.map(w => (w - cohort) / wkMs)
    def update(userId: Long, it: Iterator[Event],
               state: GroupState[RetState]): Iterator[RetDelta] = {
      val newWeeks = it.map(e => weekStart(e.ts.getTime)).toSet
      if (newWeeks.isEmpty) return Iterator.empty
      val out = Seq.newBuilder[RetDelta]
      def emit(cohort: Long, wks: Seq[Long], d: Int): Unit =
        offsets(cohort, wks).foreach(o =>
          out += RetDelta(new Timestamp(cohort), o, d))
      state.getOption match {
        case None =>
          val cohort = newWeeks.min
          emit(cohort, newWeeks.toSeq, +1)
          state.update(RetState(cohort, newWeeks.toSeq.sorted))
        case Some(RetState(cohort, seen)) =>
          val fresh = newWeeks -- seen.toSet
          val merged = (seen ++ fresh).sorted
          if (fresh.nonEmpty && fresh.min < cohort) {
            // re-base: retract the old cohort row, emit the new one
            emit(cohort, seen, -1)
            val nc = fresh.min
            emit(nc, merged, +1)
            state.update(RetState(nc, merged))
          } else if (fresh.nonEmpty) {
            emit(cohort, fresh.toSeq, +1)
            state.update(RetState(cohort, merged))
          }
      }
      out.result().iterator
    }
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(update)
  }

  /** One ± unit of a (week, class) growth-accounting cell. */
  case class GrowthDelta(wk: Timestamp, cls: String, d: Int)

  case class GrowthState(weeks: Seq[Long])

  /** Streaming growth accounting — the continuous twin of
    * `growth_accounting` (VERDICT r11 #3's second half): per-user
    * state is the active-week set (calendar-bounded); each trigger
    * recomputes the user's (week, class) cell set — new / retained /
    * resurrected per active week, churned at w+1wk for every
    * gap-or-tail week — and emits the DIFF as ± deltas (the
    * retentionStream Append-ledger shape). A LATE earlier week
    * re-classifies its successor and moves the user's "new" cell, so
    * retraction pairs keep the running sum exact; the batch horizon
    * cut (churn rows beyond the last globally-active week) is the
    * CONSUMER's filter — the horizon is derivable from the emitted
    * active cells (max active week), so no global state hides in a
    * keyed stream. Running sum of deltas, horizon-filtered, ≡ the
    * batch query after every trigger prefix (StreamGrowthSpec). */
  def growthStream(events: Dataset[Event]): Dataset[GrowthDelta] = {
    import events.sparkSession.implicits._
    val wkMs = 7L * 86400000L
    // the user's full (week, class) cell set — recomputed per trigger
    // (weeks-per-user is calendar-bounded, so the O(weeks) rebuild is
    // cheaper than incremental surgery and obviously diffable)
    def cells(weeks: Seq[Long]): Set[(Long, String)] = {
      val sorted = weeks.sorted
      val active = sorted.zipWithIndex.map { case (w, i) =>
        val c = if (i == 0) "new"
          else if (sorted(i - 1) + wkMs == w) "retained"
          else "resurrected"
        (w, c)
      }
      val churned = sorted.zipWithIndex.collect {
        case (w, i) if i + 1 >= sorted.size || sorted(i + 1) != w + wkMs =>
          (w + wkMs, "churned")
      }
      (active ++ churned).toSet
    }
    def update(userId: Long, it: Iterator[Event],
               state: GroupState[GrowthState]): Iterator[GrowthDelta] = {
      val newWeeks = it.map(e => weekStartMs(e.ts.getTime)).toSet
      if (newWeeks.isEmpty) return Iterator.empty
      val seen = state.getOption.map(_.weeks).getOrElse(Seq.empty)
      val merged = (seen.toSet ++ newWeeks).toSeq.sorted
      if (merged == seen) return Iterator.empty
      val before = cells(seen)
      val after = cells(merged)
      state.update(GrowthState(merged))
      ((after -- before).iterator.map { case (w, c) =>
        GrowthDelta(new Timestamp(w), c, +1) } ++
        (before -- after).iterator.map { case (w, c) =>
          GrowthDelta(new Timestamp(w), c, -1) })
    }
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(update)
  }

  /** One doc's claim on one LSH band bucket: `novel` marks the
    * trigger where this (band, bh) was first seen corpus-wide;
    * `claimed_by` is the doc that owns the bucket (the doc itself on
    * a novel claim). A doc is near-KNOWN iff any of its rows has
    * `claimed_by != doc_id` — the keep verdict is a per-doc
    * bool_and over this frame. */
  case class BandClaim(doc_id: Long, band: Int, bh: String,
                       novel: Boolean, claimed_by: Long)

  /** Streaming incremental near-dedup — the continuous-crawl twin of
    * [[graft.operators.Dedup.incrementalNear]]. The persisted
    * (band, bh) store becomes per-bucket group state holding the
    * CLAIMING doc id: each arriving doc is shingled + minhash-banded
    * with the batch machinery (stateless expressions, so the same
    * code plans under Structured Streaming), then every band bucket
    * is claimed by its first doc — earlier trigger wins, lowest doc
    * id within a trigger (the batch path's min-id-keeps rule).
    *
    * Semantics are the STORE-COLLISION level of the batch operator
    * (its step 2): any band collision marks the doc near-known, with
    * no shingle verification — deliberately, because the state (like
    * the store) keeps fixed-width band hashes, never text; precision
    * is tuned by the band/row geometry. State size = distinct band
    * buckets = exactly the batch store's cardinality, and each state
    * value is one long — the streaming store IS the band store.
    *
    * Docs with no shingles (empty/short text) emit no rows; callers
    * treat no-verdict as kept, like the batch path's unbanded
    * survivors. StreamNearDedupSpec pins cross-trigger drops, the
    * within-trigger min-id rule, and agreement with the batch
    * bandStore + incrementalNear verdicts on the same arrival split.
    */
  /** Streaming DECONTAMINATION gate (round 15, VERDICT r14 #10
    * stretch — the continuous-crawl side of decontaminate_bloom): the
    * benchmark-gram Bloom filter rides its ONE packed broadcast row
    * against the arriving doc stream via a stream-static cross join,
    * and each doc's verdict is a row-local codegen'd fold over its own
    * word shingles — (doc_id, n_grams, n_hits, contaminated), fully
    * STATELESS append mode: no watermark, no shuffle, no state store.
    * No false negatives by Bloom construction; maybe-hits at the
    * filter's standard FP rate route to the batch verify join
    * (decontaminate_bloom's exact stage) downstream, exactly like the
    * batch prune. Spec: StreamDecontaminateSpec (stream ≡ batch
    * verdicts per trigger). */
  def decontaminateStream(docs: DataFrame,
                          bloom: graft.operators.Bloom.Filter,
                          shingleK: Int = 8): DataFrame = {
    val sh = graft.functions.TextAnalysis.wordShingles(col("text"), shingleK)
    // bindOnce (ADVICE r15): tokenize+shingle ONCE per row — size()
    // and filter() read the lambda-bound array, and the staged struct
    // alias is non-cheap + multi-referenced, so CollapseProject keeps
    // the projection instead of inlining the shingle subtree twice.
    val verdict = element_at(transform(array(sh), bound =>
      struct(size(bound).as("n_grams"),
        size(filter(bound, g => bloom.mayContain(md5(g)))).as("n_hits"))), 1)
    docs.crossJoin(broadcast(bloom.packed))
      .select(col("doc_id"), verdict.as("v"))
      .select(col("doc_id"), col("v.n_grams").as("n_grams"),
        col("v.n_hits").as("n_hits"),
        (col("v.n_hits") > lit(0)).as("contaminated"))
  }

  /** Streaming IMAGE-dedup serve (round 16 — the continuous-crawl
    * twin of mm_phash_stored's batch serve): each arriving perceptual
    * hash band-slices ROW-LOCALLY and tests its 4 md5(band|bv) keys
    * against the broadcast band-store Bloom
    * ([[graft.operators.Dedup.hammingStoreBloom]]) — (id, phash,
    * near_known), fully STATELESS append mode: no watermark, no
    * shuffle, no state store. No false negatives by Bloom
    * construction; maybe-hits at the filter's FP rate route to the
    * exact batch serve (hammingServeVerdicts) downstream, exactly
    * like the decontaminate prune. Spec: StreamPhashServeSpec
    * (stream ≡ batch verdicts per trigger; no false negatives vs the
    * exact store). */
  def phashServeStream(sigs: DataFrame,
                       bloom: graft.operators.Bloom.Filter,
                       bands: Int = 4, bits: Int = 48): DataFrame = {
    val width = bits / bands
    val mask = (1L << width) - 1
    val hit = (0 until bands).map { b =>
      val bv = shiftright(col("phash"), b * width).bitwiseAND(lit(mask))
      bloom.mayContain(md5(concat_ws("|", lit(b), bv)))
    }.reduce(_ || _)
    sigs.crossJoin(broadcast(bloom.packed))
      .select(col("id"), col("phash"), hit.as("near_known"))
  }

  def nearDedupStream(docs: DataFrame, shingleK: Int = 3, numHashes: Int = 6,
                      rowsPerBand: Int = 3): Dataset[BandClaim] = {
    import docs.sparkSession.implicits._
    val banded = graft.operators.Dedup
      .minhashBanded(docs, "id", "text", shingleK, numHashes, rowsPerBand)
      .select(col("id").as("doc_id"), col("band"), col("bh"))
      .as[(Long, Int, String)]

    def update(key: (Int, String), it: Iterator[(Long, Int, String)],
               state: GroupState[Long]): Iterator[BandClaim] = {
      val ids = it.map(_._1).toSeq.distinct.sorted
      val existing = state.getOption
      val claimer = existing.getOrElse(ids.min)
      if (existing.isEmpty) state.update(claimer)
      ids.iterator.map(id => BandClaim(id, key._1, key._2,
        novel = existing.isEmpty && id == claimer, claimed_by = claimer))
    }

    banded.groupByKey(r => (r._2, r._3))
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout())(update)
  }

  /** Gap-based sessionization with flatMapGroupsWithState: state is
    * one open session per user, emitted and replaced when the gap
    * exceeds `gapSeconds` (or on event-time timeout). Batch twin:
    * operators.Sessionize. */
  def sessionize(events: Dataset[Event], gapSeconds: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = gapSeconds * 1000L

    def update(userId: Long, it: Iterator[Event],
               state: GroupState[SessionAcc]): Iterator[Session] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        return Iterator(Session(userId, new Timestamp(s.start), new Timestamp(s.end), s.n, s.total))
      }
      val sorted = it.toSeq.sortBy(_.ts.getTime)
      var acc = state.getOption.orNull
      val closed = Seq.newBuilder[Session]
      sorted.foreach { e =>
        val t = e.ts.getTime
        if (acc == null) acc = SessionAcc(t, t, 1L, e.value)
        else if (t - acc.end > gapMs) {
          closed += Session(userId, new Timestamp(acc.start), new Timestamp(acc.end), acc.n, acc.total)
          acc = SessionAcc(t, t, 1L, e.value)
        } else acc = SessionAcc(acc.start, math.max(acc.end, t), acc.n + 1, acc.total + e.value)
      }
      if (acc != null) {
        state.update(acc)
        state.setTimeoutTimestamp(acc.end + gapMs)
      }
      closed.result().iterator
    }

    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(update)
  }
}
