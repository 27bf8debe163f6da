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

  /** Viterbi candidate: cost of ending position `pos` with a piece of
    * length `l`, given scores-so-far `acc` and the span-cost map `m`
    * (key = start·10 + len). Map misses and pos < l are Inf. */
  private def cand(acc: Column, m: Column, pos: Column, l: Int): Column =
    when(pos >= l,
      element_at(acc, (pos - lit(l) + lit(1)).cast("int")) +
        coalesce(element_at(m,
          ((pos - lit(l) + lit(1)) * 10 + lit(l)).cast("long")), lit(Inf)))
      .otherwise(lit(Inf))

  /** Backtrace choice at position `p`: the LONGEST length whose
    * candidate achieves the optimal score s[p+1] (ties prefer longer
    * pieces — fixed, engine-independent). */
  private def chosenLen(s: Column, m: Column, p: Column): Column =
    (MaxPiece to 2 by -1).foldLeft(null.asInstanceOf[Column]) { (acc, l) =>
      val hit = (p >= l) && (cand(s, m, p, l) === element_at(s, (p + 1).cast("int")))
      if (acc == null) when(hit, lit(l)) else acc.when(hit, lit(l))
    }.otherwise(lit(1))

  /** Viterbi-segment every census word against a (piece, cost) table:
    * returns (w, freq, seg array<string>, n_pieces, score). The cost
    * table is broadcast (vocabulary-sized); the DP is two sequential
    * folds per word (forward scores, then backtrace).
    *
    * PRECONDITION (char coverage): `costs` must contain every single
    * character that occurs in `census.w` — the span→cost join is an
    * INNER join, so a word containing an uncovered character would
    * silently drop from the output rather than fail (ADVICE r12).
    * Every vocabulary this trainer produces satisfies this by
    * construction ([[selectVocab]] keeps ALL single chars and
    * [[nextVocab]] persists them with an add-one floor); callers
    * feeding an EXTERNAL cost table must guarantee the same, or
    * anti-join their census against single-char coverage first. */
  def segment(census: DataFrame, costs: DataFrame): DataFrame = {
    val sp = census
      .select(col("w"), col("freq"), explode(spans(col("w"))).as("sp"))
      .select(col("w"), col("freq"), col("sp.i").as("i"),
        col("sp.len").as("len"), col("sp.piece").as("piece"))
      .join(broadcast(costs.select(col("piece"), col("cost"))), Seq("piece"))
    // NOTE (r16): the groupBy-built map is ALSO a correctness-of-cost
    // barrier — a row-local Project-alias map was A/B'd and LOST 2×:
    // under the downstream Generate (viterbiCounts' explode) the alias
    // chain gets re-inlined and the DP folds re-evaluate the map build
    // multiplicatively (measured 0.4 s → 4.3 s on the 31-row census).
    // An aggregate output can never be inlined.
    val mapped = sp.groupBy(col("w"), col("freq"))
      .agg(map_from_entries(collect_list(struct(
        (col("i").cast("long") * 10 + col("len")).as("k"),
        col("cost").as("v")))).as("m"))
    val n = length(col("w"))
    val fwd = aggregate(sequence(lit(1), n), array(lit(0L)),
      (acc, pos) => concat(acc, array(least(
        (1 to MaxPiece).map(l => cand(acc, col("m"), pos, l)): _*))))
    val scored = mapped.withColumn("s", fwd)
    val back = aggregate(sequence(lit(1), n),
      struct(n.cast("int").as("p"),
        array().cast("array<string>").as("seg")),
      (acc, _) => {
        val p = acc.getField("p")
        val l = chosenLen(col("s"), col("m"), p)
        when(p === 0, acc).otherwise(struct(
          (p - l).cast("int").as("p"),
          concat(array(col("w").substr(p - l + lit(1), l)),
            acc.getField("seg")).as("seg")))
      })
    scored
      .select(col("w"), col("freq"), back.getField("seg").as("seg"),
        element_at(col("s"), (n + 1).cast("int")).as("score"))
      .select(col("w"), col("freq"), col("seg"),
        size(col("seg")).as("n_pieces"), col("score"))
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
