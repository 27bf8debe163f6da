package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.PRound

/** Deterministic multinomial Naive Bayes over a token census — the
  * MODEL-BASED quality filter (the fastText-classifier gate real
  * curation stacks run after the heuristic gates; cf. the reference's
  * heuristic-only filter layer, scraper_v2.py:1136-1230, which this
  * extends rather than replaces).
  *
  * Engine-exact by the UnigramLm cost discipline: every learned
  * parameter is ONE rounded double frozen to integer micro-nats
  * (`round(−ln(p)·10⁶)` as BIGINT), so scoring — a plain integer sum —
  * has a total order identical in any engine, any partitioning, any
  * summation order. Parameters, with add-one smoothing over the shared
  * train vocabulary of size V:
  *
  *   cost(t|c)  = round(−ln((cnt(t,c)+1) / (total_c+V)) · 10⁶)
  *   unseen(c)  = round(−ln(      1      / (total_c+V)) · 10⁶)
  *   prior(c)   = round(−ln(n_docs_c / n_docs) · 10⁶)
  *   score(d,c) = prior(c) + Σ_{t ∈ d} cost(t|c)   (argmin wins)
  *
  * Scale: training is CENSUS-BOUNDED (one explode → one (label, token)
  * aggregation; everything after runs on the vocabulary-sized census,
  * checkpointed once), and applying is MAP-SIDE (the whole model rides
  * one broadcast 1-row frame of token→cost maps; each document folds
  * its own tokens — no join, no shuffle on the corpus).
  */
object NaiveBayes {

  /** Pseudo-token rows carrying the per-class prior / unseen-floor
    * parameters inside the same (label, token, cnt, cost) table — a
    * model IS a keyed parameter frame, storable and servable like any
    * ThresholdStore artifact. Both sort before alphanumeric tokens and
    * cannot collide with whitespace-split tokens (no `_`-only words in
    * a vocabulary would still be fine: real tokens never carry the
    * reserved names because training filters them out defensively). */
  val PriorToken = "__prior__"
  val UnseenToken = "__unseen__"

  /** The (label, token, cnt) token census — one of the trainer's two
    * sufficient statistics. Streamable: the same explode+groupBy is a
    * plain streaming aggregation (StreamOps.nbTokenCensusStream), so
    * a continuous crawl maintains it and a nightly
    * [[trainFromCensus]] retrains the gate with no corpus re-scan. */
  def tokenCensus(labeled: DataFrame, labelCol: String = "label",
                  tokensCol: String = "tokens"): DataFrame =
    labeled.select(col(labelCol).as("label"),
        explode(col(tokensCol)).as("token"))
      .filter(!col("token").isin(PriorToken, UnseenToken))
      .groupBy(col("label"), col("token"))
      .agg(count(lit(1)).as("cnt"))

  /** The (label, n) doc census — the prior's sufficient statistic;
    * streamable like [[tokenCensus]] (StreamOps.nbDocCensusStream). */
  def docCensus(labeled: DataFrame, labelCol: String = "label"): DataFrame =
    labeled.groupBy(col(labelCol).as("label")).agg(count(lit(1)).as("n"))

  /** Train from (label, tokens) rows → the (label, token, cnt, cost)
    * parameter table. `cnt` is the raw census count (the class doc
    * count on prior rows, 0 on unseen rows); `cost` is the integer
    * micro-nat parameter. Two column-pruned passes over the input
    * (token census + doc census) — never a materialization of the
    * corpus. */
  def train(labeled: DataFrame, labelCol: String = "label",
            tokensCol: String = "tokens"): DataFrame =
    trainFromCensus(tokenCensus(labeled, labelCol, tokensCol),
      docCensus(labeled, labelCol))

  /** Train from the two censuses — everything here is census-sized
    * (the censuses ARE the sufficient statistics, so streamed
    * censuses train bit-identically). The token census is
    * Materialize.cut: three downstream frames (totals, vocabulary,
    * cost rows) fan out of it, and the cut also rebases attribute ids
    * so a memory-table source (the streaming twin) survives the
    * fan-out (the KneserNey.trainFromCensus lesson). */
  def trainFromCensus(tokenCensus: DataFrame,
                      docCensus: DataFrame): DataFrame = {
    val census = Materialize.cut(tokenCensus)
    val totals = census.groupBy(col("label")).agg(sum(col("cnt")).as("total"))
    val vocab = census.agg(countDistinct(col("token")).as("v"))
    val cost = census
      .join(broadcast(totals), Seq("label"))
      .crossJoin(broadcast(vocab))
      .select(col("label"), col("token"), col("cnt"),
        microNats((col("cnt") + lit(1)).cast("double") /
          (col("total") + col("v")).cast("double")).as("cost"))
    val allW = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val prior = docCensus
      .withColumn("n_all", sum(col("n")).over(allW)) // |classes|-row frame
      .select(col("label"), lit(PriorToken).as("token"), col("n").as("cnt"),
        microNats(col("n").cast("double") / col("n_all").cast("double"))
          .as("cost"))
    val unseen = totals.crossJoin(broadcast(vocab))
      .select(col("label"), lit(UnseenToken).as("token"), lit(0L).as("cnt"),
        microNats(lit(1.0) / (col("total") + col("v")).cast("double"))
          .as("cost"))
    cost.unionByName(prior).unionByName(unseen)
  }

  /** `round(−ln(p)·10⁶)` as BIGINT — the one rounded double per
    * parameter (PRound ≙ DuckDB round, the cross-engine boundary). */
  private def microNats(p: Column): Column =
    PRound.pround(-log(p) * 1e6, 0).cast("long")

  /** Hash-bucket count of the broadcast lookup structure. Spark map
    * `element_at` is a LINEAR key scan (the KneserNey.score lesson),
    * so a flat vocabulary-sized token→cost map cost
    * docs × tokens × classes × |V| string comparisons at score time —
    * measured 23 s for the 5-class langid apply at sf0.1 (r16). The
    * bucketed form pays one O(1) array index plus a scan of the ~|V|/B
    * tokens sharing the bucket. The hash (xxhash64 mod B) is engine-
    * INTERNAL — no score, cost or prediction depends on it. */
  val LookupBuckets = 1024

  private def bucketOf(t: Column): Column =
    pmod(xxhash64(t), lit(LookupBuckets)).cast("int")

  /** Collapse the parameter table to ONE broadcastable row: per class
    * `c` an array `arr_c` of [[LookupBuckets]] token→cost maps
    * (slot = xxhash64 bucket; empty slots null) plus scalars
    * `prior_c` / `unseen_c`. The structure is vocabulary-sized — the
    * same broadcast weight class as a PQ codebook or a Bloom side.
    *
    * ONE pass over the model frame (r17): the r16 two-pass build
    * (bucket maps + a crossJoined scalar aggregation) derived the
    * model twice, adding a third artifact scan to every `*_nb_stored`
    * serve plan (plan-gated at 2 scans). The sentinel rows ride the
    * same aggregation chain in a reserved bucket (−1, unreachable by
    * `pmod`), so buckets AND the prior/unseen scalars fall out of a
    * single groupBy(label, bucket) → groupBy(label) → global agg. */
  def broadcastParams(model: DataFrame, labels: Seq[String]): DataFrame = {
    val isSentinel = col("token").isin(PriorToken, UnseenToken)
    val perLabel = model
      .groupBy(col("label"),
        when(isSentinel, lit(-1)).otherwise(bucketOf(col("token"))).as("__b"))
      .agg(map_from_entries(collect_list(
        struct(col("token"), col("cost")))).as("__m"))
      .groupBy(col("label"))
      .agg(
        // collect_list drops the null the `when` leaves on the
        // sentinel bucket, so only real buckets enter the map
        map_from_entries(collect_list(
          when(col("__b") >= 0, struct(col("__b"), col("__m"))))).as("__bm"),
        max(when(col("__b") === -1,
          element_at(col("__m"), lit(PriorToken)))).as("__prior"),
        max(when(col("__b") === -1,
          element_at(col("__m"), lit(UnseenToken)))).as("__unseen"))
    val aggs: Seq[Column] = labels.map { l =>
      // exactly one row per label → first(ignoreNulls) is deterministic
      // (max() cannot order a MAP type)
      first(when(col("label") === l, col("__bm")), ignoreNulls = true)
        .as(s"__bm_$l")
    } ++ labels.flatMap { l =>
      Seq(
        max(when(col("label") === l, col("__prior"))).as(s"prior_$l"),
        max(when(col("label") === l, col("__unseen"))).as(s"unseen_$l"))
    }
    perLabel.agg(aggs.head, aggs.tail: _*)
      .select(labels.map(l =>
        transform(sequence(lit(0), lit(LookupBuckets - 1)),
          b => element_at(col(s"__bm_$l"), b)).as(s"arr_$l")) ++
        labels.flatMap(l => Seq(col(s"prior_$l"), col(s"unseen_$l"))): _*)
  }

  /** Map-side scorer: every input column rides through, plus one
    * integer `cost_<label>` per class and `pred` = argmin class (ties
    * break to the lexicographically SMALLER label — fixed,
    * engine-independent). The model arrives as
    * `crossJoin(broadcast(params))`; each row folds its own tokens
    * against the cost maps — zero shuffle on the scored corpus. */
  def score(docs: DataFrame, params: DataFrame, labels: Seq[String],
            tokensCol: String = "tokens"): DataFrame = {
    val carry = docs.columns
    val costCols = labels.map { l =>
      aggregate(col(tokensCol), col(s"prior_$l"),
        (acc, t) => acc +
          coalesce(element_at(
            element_at(col(s"arr_$l"), bucketOf(t) + 1), t),
            col(s"unseen_$l")))
        .as(s"cost_$l")
    }
    // direct projection ON PURPOSE: an explode(array(struct(costs)))
    // "bind-once" was A/B'd at sf0.1 and LOSES badly (langid_nb_apply
    // 5.8 → 40 s — the Generate forces the fold stage out of
    // whole-stage codegen, which evidently covers these HOF folds and
    // shares their subtrees); the collapse-duplication worry the bind
    // was meant to fix is already handled by codegen CSE
    val scored = docs.crossJoin(broadcast(params))
      .select(carry.map(col) ++ costCols: _*)
    val ls = labels.sorted
    val best = ls.tail.foldLeft(
      struct(col(s"cost_${ls.head}").as("c"), lit(ls.head).as("l"))) {
      (acc, l) =>
        when(col(s"cost_$l") < acc.getField("c"),
          struct(col(s"cost_$l").as("c"), lit(l).as("l"))).otherwise(acc)
    }
    scored.withColumn("pred", best.getField("l"))
  }
}
