package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.PRound

/** Interpolated Kneser-Ney bigram language model — the KenLM-style
  * perplexity gate (CCNet's "train a small LM on the target domain,
  * score the crawl" step; cf. Heafield, KenLM, WMT 2011 and Wenzek et
  * al., CCNet, LREC 2020). The reference's filter layer is heuristic
  * only (scraper_v2.py:1136-1230); this is the model-based stage real
  * curation stacks run next to it, sibling to [[NaiveBayes]].
  *
  * Engine-exact by the established cost discipline: every learned
  * parameter is ONE rounded double frozen to integer micro-nats
  * (`round(−ln(p)·10⁶)` as BIGINT), so scoring is a plain integer sum
  * with a total order identical in any engine or summation order.
  * With fixed discount D = 0.75 (exact in binary), bigram census
  * c(w1,w2), context totals fol(w1) = Σ_w2 c(w1,w2), fan-outs
  * N1+(w1·), fan-ins N1+(·w2) and B = |distinct bigrams|:
  *
  *   seen (w1,w2):  cost_bi = µ( (c−D)/fol(w1)
  *                              + (D·N1+(w1·)/fol(w1)) · N1+(·w2)/B )
  *   backoff(w1):   cost_bo = µ( D·N1+(w1·)/fol(w1) )
  *   continuation:  cost_cont = µ( N1+(·w2)/B )
  *   OOV floor:     cost_unk  = µ( 1/(B+1) )
  *   score(w1,w2)   = cost_bi                    if the pair is seen
  *                  | cost_bo(w1) + cost_cont(w2)   else      (KenLM's
  *                    own prob+backoff decomposition — two separately
  *                    rounded params ADD, keeping unseen-pair scoring
  *                    integer-exact without enumerating V² pairs)
  *                  | cost_cont(w2) (unknown context backs off free)
  *                  | … with cost_unk for an unseen continuation.
  *
  * where µ(p) = round(−ln(p)·10⁶). Every document is scored with a
  * `<s>` BOS context prepended, so a 1-token doc still has a bigram.
  *
  * Scale: training is CENSUS-BOUNDED (one explode → one bigram
  * aggregation; fol/pre/B all derive from the bigram census, cut once
  * because four frames fan out of it). Applying is MAP-SIDE: the model
  * rides ONE broadcast row of three token→cost maps + the OOV scalar,
  * and each document folds its own bigrams — no join, no shuffle on
  * the scored corpus (the NaiveBayes.broadcastParams topology; beyond
  * broadcast weight the same table serves a sort-merge join on the
  * bigram key instead).
  */
object KneserNey {

  val Bos = "<s>"
  private val D = 0.75

  /** `round(−ln(p)·10⁶)` as BIGINT — one rounded double per parameter
    * (PRound ≙ DuckDB round, the cross-engine boundary). */
  private def microNats(p: Column): Column =
    PRound.pround(-log(p) * 1e6, 0).cast("long")

  /** Prepend the BOS context to a token array. */
  def withBos(tokens: Column): Column =
    concat(array(lit(Bos)), tokens)

  /** (w1, w2) bigram pairs of a BOS-prepended token array. */
  def bigrams(tokens: Column): Column = {
    val t = withBos(tokens)
    val n = size(t)
    zip_with(slice(t, lit(1), n - 1), slice(t, lit(2), n - 1),
      (a, b) => struct(a.as("w1"), b.as("w2")))
  }

  /** The (w1, w2, c2) bigram census of BOS-prepended documents — the
    * one corpus-sized aggregation of training. Streamable: the same
    * explode+groupBy is a plain streaming aggregation
    * (StreamOps.bigramCensusStream), so a continuous crawl maintains
    * it and a nightly [[trainFromCensus]] folds it in with no corpus
    * re-scan. */
  def bigramCensus(docs: DataFrame, tokensCol: String = "tokens"): DataFrame =
    docs.filter(size(col(tokensCol)) >= 1)
      .select(explode(bigrams(col(tokensCol))).as("bg"))
      .groupBy(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .agg(count(lit(1)).as("c2"))

  /** Train from (tokens) rows → the (kind, w1, w2, cnt, cost)
    * parameter table: 'bi' rows keyed (w1,w2), 'bo' rows keyed w1,
    * 'cont' rows keyed w2, one 'unk' row. Missing key slots carry ''
    * (never a real token — tokens are non-empty), NOT null, so the
    * presentation sort needs no cross-engine null-order pinning. */
  def train(docs: DataFrame, tokensCol: String = "tokens"): DataFrame =
    trainFromCensus(bigramCensus(docs, tokensCol))

  /** Train from a (w1, w2, c2) bigram census — everything past the
    * census is census-sized (the census IS the sufficient statistic,
    * so a streamed census trains bit-identically). The census is
    * Materialize.cut here: four derived censuses fan out of it, and
    * the cut also rebases attribute ids so a memory-table source (the
    * streaming twin) survives its own self-join. */
  def trainFromCensus(census: DataFrame): DataFrame = {
    val bi = Materialize.cut(census)
    val fol = bi.groupBy(col("w1"))
      .agg(sum(col("c2")).as("tot"), count(lit(1)).as("n1f"))
    val pre = bi.groupBy(col("w2")).agg(count(lit(1)).as("n1p"))
    val btot = bi.agg(count(lit(1)).as("b"))
    val biRows = bi
      .join(fol, Seq("w1")).join(pre, Seq("w2"))
      .crossJoin(broadcast(btot))
      .select(lit("bi").as("kind"), col("w1"), col("w2"), col("c2").as("cnt"),
        microNats((col("c2") - lit(D)) / col("tot") +
          (lit(D) * col("n1f") / col("tot")) *
            (col("n1p") / col("b").cast("double"))).as("cost"))
    val boRows = fol.select(lit("bo").as("kind"), col("w1"),
      lit("").as("w2"), col("n1f").as("cnt"),
      microNats(lit(D) * col("n1f") / col("tot")).as("cost"))
    val contRows = pre.crossJoin(broadcast(btot))
      .select(lit("cont").as("kind"), lit("").as("w1"), col("w2"),
        col("n1p").as("cnt"),
        microNats(col("n1p") / col("b").cast("double")).as("cost"))
    val unkRow = btot.select(lit("unk").as("kind"), lit("").as("w1"),
      lit("").as("w2"), lit(0L).as("cnt"),
      microNats(lit(1.0) / (col("b") + 1)).as("cost"))
    biRows.unionByName(boRows).unionByName(contRows).unionByName(unkRow)
  }

  /** Score every document against a trained parameter table:
    * (keyCols..., n_bg, cost, avg_nats). avg_nats is the mean
    * per-bigram cost in nats (perplexity = e^avg_nats — the
    * monotone-equivalent integer form, no cross-engine exp at the
    * boundary).
    *
    * Topology: explode bigrams → three BROADCAST-HASH joins against
    * the model slices ('bi' on the pair, 'bo' on w1, 'cont' on w2 —
    * proper hash lookups) → one map-side-combined aggregation keyed on
    * `keyCols`. The corpus text never shuffles: the only exchange
    * carries (key, partial count, partial sum). A first cut folded a
    * broadcast one-row token→cost MAP per doc instead — Spark's
    * ArrayBasedMapData `element_at` is a LINEAR scan, so scoring cost
    * was docs × bigrams × |model| (measured 16–35 s where this
    * formulation runs sub-second). `keyCols` must identify a document
    * (extra carried dimensions like lang are fine). */
  def score(docs: DataFrame, model: DataFrame,
            keyCols: Seq[String] = Seq("doc_id"),
            tokensCol: String = "tokens"): DataFrame = {
    val keys = keyCols.map(col)
    val biP = model.filter(col("kind") === "bi")
      .select(col("w1"), col("w2"), col("cost").as("c_bi"))
    val boP = model.filter(col("kind") === "bo")
      .select(col("w1"), col("cost").as("c_bo"))
    val ctP = model.filter(col("kind") === "cont")
      .select(col("w2"), col("cost").as("c_ct"))
    val unkP = model.filter(col("kind") === "unk")
      .select(col("cost").as("c_unk"))
    docs.filter(size(col(tokensCol)) >= 1)
      .select((keys :+ explode(bigrams(col(tokensCol))).as("bg"))
        .toIndexedSeq: _*)
      .select((keys ++ Seq(col("bg.w1").as("w1"), col("bg.w2").as("w2")))
        .toIndexedSeq: _*)
      .join(broadcast(biP), Seq("w1", "w2"), "left")
      .join(broadcast(boP), Seq("w1"), "left")
      .join(broadcast(ctP), Seq("w2"), "left")
      .crossJoin(broadcast(unkP))
      .withColumn("__c", coalesce(col("c_bi"),
        coalesce(col("c_bo"), lit(0L)) + coalesce(col("c_ct"), col("c_unk"))))
      .groupBy(keys.toIndexedSeq: _*)
      .agg(count(lit(1)).as("n_bg"), sum(col("__c")).as("cost"))
      .withColumn("avg_nats",
        PRound.pround(col("cost").cast("double") / col("n_bg") / 1e6, 6))
  }
}
