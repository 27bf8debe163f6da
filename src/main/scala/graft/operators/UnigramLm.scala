package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.PRound

/** Unigram-LM (SentencePiece-style) tokenizer trainer — the OTHER
  * tokenizer real pipelines train, next to the BPE family
  * ([[graft.functions.Bpe]]): pieces carry probabilities and a word's
  * tokenization is its best-scoring segmentation (Viterbi), not a
  * greedy merge replay (Kudo 2018, "Subword Regularization").
  *
  * Everything runs over the WORD-FREQUENCY CENSUS, never the corpus:
  * seed counts, EM rounds, and the apply segmentation are all
  * vocabulary-bounded (the graph_lpa / bpe_merges discipline), so the
  * corpus is scanned exactly once (census build) regardless of EM
  * rounds — iteration cost is O(|vocab|), not O(corpus), the property
  * that makes the trainer run at 100 TB.
  *
  * Determinism across engines (the oracle contract): piece costs are
  * INTEGER micro-nats `round(-ln(cnt/total)·10⁶)` — the Viterbi DP
  * compares and sums BIGINTs only, so the argmin and the EM
  * trajectory are bit-identical in any engine and any partitioning;
  * double arithmetic touches exactly one rounded point per piece per
  * round (the stats-family exact-census discipline). Hard-EM
  * (Viterbi-EM) with a fixed round count keeps the unrolled
  * MATERIALIZED-CTE oracle exact.
  *
  * Both folds are codegen'd higher-order `aggregate` calls — no UDF,
  * no shuffle inside a word; the per-word work is O(len · MaxPiece).
  */
object UnigramLm {

  /** Unreachable-prefix sentinel: large enough to dominate any real
    * path, small enough that Inf + Inf + costs stays < 2⁶³. */
  val Inf = 1000000000000000L // 1e15

  /** Longest candidate piece. DP candidates per position are the
    * fixed lengths 1..MaxPiece, which keeps both engines' folds
    * unrolled and identical. */
  val MaxPiece = 4

  /** All (i, len, piece) spans of a word, len 1..MaxPiece — the
    * candidate-piece explode shared by seeding and segmentation. */
  def spans(w: Column): Column =
    flatten(transform(sequence(lit(1), length(w)), i =>
      filter(transform(sequence(lit(1), lit(MaxPiece)), l =>
        when(i + l - lit(1) <= length(w),
          struct(i.as("i"), l.as("len"), w.substr(i, l).as("piece")))),
        x => x.isNotNull)))

  /** Seed expected counts: every span occurrence weighted by word
    * frequency (the standard substring-seeded init). */
  def seedCounts(census: DataFrame): DataFrame =
    census.select(col("freq"), explode(spans(col("w"))).as("sp"))
      .groupBy(col("sp.piece").as("piece"))
      .agg(sum(col("freq")).as("cnt"))

  /** Vocabulary selection: ALL single characters (coverage guarantee —
    * every word stays segmentable) plus the top-`topMulti` multi-char
    * pieces by (cnt desc, piece) — deterministic ties. */
  def selectVocab(counts: DataFrame, topMulti: Int): DataFrame =
    counts.filter(length(col("piece")) === 1)
      .unionByName(counts.filter(length(col("piece")) > 1)
        .orderBy(col("cnt").desc, col("piece")).limit(topMulti))

  /** Integer micro-nat costs from counts: round(−ln(cnt/total)·10⁶).
    * One rounded double per piece; everything downstream is BIGINT. */
  def withCosts(vocab: DataFrame): DataFrame =
    vocab.crossJoin(broadcast(vocab.agg(sum(col("cnt")).as("total"))))
      .select(col("piece"), col("cnt"),
        PRound.pround(-log(col("cnt").cast("double") /
          col("total").cast("double")) * 1e6, 0).cast("long").as("cost"))

  /** Viterbi-segment every census word against a (piece, cost) table:
    * returns (w, freq, seg array<string>, n_pieces, score). The cost
    * table collapses to ONE broadcast row of sorted parallel arrays;
    * the DP is one codegen'd JVM call per word
    * ([[graft.functions.expr.UnigramSeg]]).
    *
    * r17 (guide §2.4/§4.1 — remove the shuffle, no interpreted
    * lambdas in the hot path): the previous shape exploded all
    * O(len·MaxPiece) spans per word through an interpreted HOF,
    * joined the vocabulary, rebuilt a per-word span-cost map behind a
    * vocabulary-wide groupBy(w) Exchange (the r16 NOTE about alias
    * re-inlining — an aggregate was the only safe let-bind for the
    * Column-tree DP, and it cost a full shuffle), then ran two O(n²)
    * interpreted aggregate folds per word. The native expression
    * computes the identical BIGINT DP with zero Exchange and zero
    * lambda evaluations; a word with NO span in the vocabulary comes
    * back null and is filtered — exactly the rows the old INNER
    * span→cost join dropped (UnigramLmSpec pins both semantics).
    *
    * PRECONDITION (char coverage): `costs` must contain every single
    * character that occurs in `census.w` — a word containing an
    * uncovered character would otherwise silently score Inf-padded
    * paths (or drop entirely if NO span is covered) rather than fail
    * (ADVICE r12). Every vocabulary this trainer produces satisfies
    * this by construction ([[selectVocab]] keeps ALL single chars and
    * [[nextVocab]] persists them with an add-one floor); callers
    * feeding an EXTERNAL cost table must guarantee the same, or
    * anti-join their census against single-char coverage first. */
  def segment(census: DataFrame, costs: DataFrame): DataFrame = {
    // pieces are unique, so the struct sort orders by piece in UTF8
    // binary order — the order UnigramSeg's binary search expects
    val vocabRow = costs
      .agg(sort_array(collect_list(struct(col("piece"), col("cost")))).as("kv"))
      .select(col("kv.piece").as("__vk"), col("kv.cost").as("__vv"))
    val seg = {
      import org.apache.spark.sql.GraftBridge.{column, expression}
      column(graft.functions.expr.UnigramSeg(expression(col("w")),
        expression(col("__vk")), expression(col("__vv")), MaxPiece, Inf))
    }
    census.crossJoin(broadcast(vocabRow))
      .select(col("w"), col("freq"), seg.as("r"))
      .filter(col("r").isNotNull)
      .select(col("w"), col("freq"), col("r.seg").as("seg"),
        size(col("r.seg")).as("n_pieces"), col("r.score").as("score"))
  }

  /** Viterbi piece counts (hard-EM E-step): each path piece
    * contributes the word's frequency. */
  def viterbiCounts(segmented: DataFrame): DataFrame =
    segmented.select(col("freq"), explode(col("seg")).as("piece"))
      .groupBy(col("piece")).agg(sum(col("freq")).as("cnt"))

  /** M-step vocabulary: multi-char pieces keep their Viterbi counts
    * (unused ones prune out); single chars persist with an add-one
    * floor so coverage never breaks. `chars` = all census single-char
    * pieces. */
  def nextVocab(vitCounts: DataFrame, chars: DataFrame): DataFrame =
    // both sides are vocabulary-sized, but they arrive as
    // localCheckpoint-derived frames whose stats default to "huge", so
    // the planner picks a sort-merge join with two exchanges — hint
    // the probe side (r16; guide §3.1: estimates are often wrong)
    chars.join(broadcast(vitCounts), Seq("piece"), "left")
      .select(col("piece"), coalesce(col("cnt"), lit(1L)).as("cnt"))
      .unionByName(vitCounts.filter(length(col("piece")) > 1))

  /** Full trainer: seed → `rounds` hard-EM rounds; returns the final
    * (piece, cnt, cost) table. Each phase is Materialize.cut so fold
    * lineages never nest across rounds. */
  def train(census: DataFrame, topMulti: Int, rounds: Int): DataFrame = {
    // one spans pass feeds both the seed census and the char universe
    val seed = Materialize.cut(seedCounts(census))
    val chars = seed.filter(length(col("piece")) === 1).select(col("piece"))
    val cost0 = Materialize.cut(withCosts(selectVocab(seed, topMulti)))
    (1 to rounds).foldLeft(cost0) { (cost, _) =>
      Materialize.cut(withCosts(
        nextVocab(viterbiCounts(segment(census, cost)), chars)))
    }
  }
}
