package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed token-set Jaccard similarity join.
  *
  * Re-expresses the reference's fuzzy matcher (`calculate_similarity`,
  * scraper_v2.py:737-767, and the fallback candidate scoring at
  * 1030-1067) as a scalable set-similarity join:
  *
  *   1. tokenize both sides, keep distinct tokens per key;
  *   2. build an inverted index (explode tokens) — the only shuffle is
  *      keyed on the token, so candidate generation is
  *      O(sum of postings-list sizes squared per token), never O(n²)
  *      over the inputs;
  *   3. count shared tokens per candidate pair in one aggregation;
  *   4. compute Jaccard = common / (|a| + |b| - common) and filter by
  *      threshold — only candidates are ever scored.
  *
  * `maxTokenFreq` drops stopword-grade tokens from the index (a token
  * appearing in a large fraction of the corpus generates quadratic
  * candidates but carries no discriminating signal) — the standard
  * frequency-filter guard that keeps the join skew-safe at 100 TB.
  * Pairs whose only shared tokens were dropped are simply not
  * candidates, matching how a production blocking stage behaves.
  */
object SimilarityJoin {

  /** Tokenized view: (key, name, toks, n_tok) with distinct tokens. */
  private def tokenized(df: DataFrame, keyCol: String, nameCol: String): DataFrame =
    df.select(col(keyCol).as("k"), col(nameCol).as("name"))
      .withColumn("toks", array_distinct(filter(
        split(trim(regexp_replace(col("name"), "\\s+", " ")), " "),
        t => length(t) > 0)))
      .withColumn("n_tok", size(col("toks")))

  /** Inverted index: one row per (key, token), carrying the per-key
    * set size `n_tok`. With a frequency cap, `n_tok` is recomputed
    * over the KEPT postings (cf. Dedup.ngramJaccard) so the Jaccard
    * denominator is consistent with the capped sets — counting
    * dropped tokens in the denominator but not the intersection would
    * systematically underestimate the score and could push
    * truly-above-threshold pairs below the threshold.
    *
    * Both the document-frequency filter and the recount are WINDOWS,
    * not groupBy+join-back: the join-back formulation duplicates the
    * whole posting subtree per use (the a/b sides of the candidate
    * join then re-derive it again — 16 scans of the input in the
    * flagship plan, with no exchange reuse). The df window runs on the
    * same token partitioning the candidate join needs; one scan per
    * side. */
  private def index(tok: DataFrame, maxTokenFreq: Option[Long]): DataFrame =
    maxTokenFreq match {
      case Some(cap) =>
        import org.apache.spark.sql.expressions.Window
        val posting = tok.select(col("k"), col("name"), explode(col("toks")).as("tok"))
        posting
          .withColumn("__df", count(lit(1)).over(Window.partitionBy(col("tok"))))
          .filter(col("__df") <= cap)
          .withColumn("n_tok",
            count(lit(1)).over(Window.partitionBy(col("k"), col("name"))))
          .select(col("k"), col("name"), col("n_tok"), col("tok"))
      case None =>
        tok.select(col("k"), col("name"), col("n_tok"),
          explode(col("toks")).as("tok"))
    }

  /** All pairs (a, b) with Jaccard(tokens(a), tokens(b)) >= threshold,
    * a.key < b.key. Output: k_a, name_a, k_b, name_b, jaccard. */
  def selfJoin(
      df: DataFrame,
      keyCol: String,
      nameCol: String,
      threshold: Double,
      maxTokenFreq: Option[Long] = None): DataFrame = {
    val tok = tokenized(df, keyCol, nameCol)
    val a = index(tok, maxTokenFreq)
      .select(col("tok"), col("k").as("k_a"), col("name").as("name_a"), col("n_tok").as("n_a"))
    val b = index(tok, maxTokenFreq)
      .select(col("tok"), col("k").as("k_b"), col("name").as("name_b"), col("n_tok").as("n_b"))
    a.join(b, Seq("tok"))
      .filter(col("k_a") < col("k_b"))
      .groupBy(col("k_a"), col("name_a"), col("n_a"), col("k_b"), col("name_b"), col("n_b"))
      .agg(count(lit(1)).as("common"))
      .withColumn("jaccard",
        col("common").cast("double") / (col("n_a") + col("n_b") - col("common")))
      .filter(col("jaccard") >= threshold)
      .select(col("k_a"), col("name_a"), col("k_b"), col("name_b"), col("jaccard"))
  }

  /** Prefix posting list for [[selfJoinPrefix]]: each set's tokens are
    * ranked in the canonical global order (ascending document
    * frequency, ties by token — rare tokens first, so prefixes land on
    * the most selective tokens) and only the first
    * n − ⌈t·n⌉ + 1 survive. The ceil runs in DECIMAL (threshold via
    * `BigDecimal.valueOf`), never double — 0.3·20 in fp64 is
    * 6.000000000000001, whose ceil(7) would SHORTEN the prefix and
    * silently break the completeness guarantee.
    *
    * Package-visible so the property spec can assert the index is a
    * strict subset of the full posting list. */
  private[operators] def prefixPosting(
      df: DataFrame, keyCol: String, nameCol: String,
      threshold: Double): DataFrame =
    prefixPostingOf(tokenized(df, keyCol, nameCol), threshold)

  private def prefixPostingOf(tok: DataFrame, threshold: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val t = java.math.BigDecimal.valueOf(threshold)
    tok
      .select(col("k"), col("name"), col("n_tok"), explode(col("toks")).as("tok"))
      .withColumn("__df", count(lit(1)).over(Window.partitionBy(col("tok"))))
      .withColumn("__r", row_number().over(
        Window.partitionBy(col("k"), col("name")).orderBy(col("__df"), col("tok"))))
      .filter(col("__r") <=
        col("n_tok") - ceil(col("n_tok").cast("decimal(18,6)") * lit(t)) + 1)
      .select(col("k"), col("name"), col("n_tok"), col("tok"))
  }

  /** Prefix-filtered Jaccard self-join (AllPairs/PPJoin candidate
    * scheme, Bayardo et al. 2007): instead of indexing EVERY token
    * (quadratic in the hottest token's document frequency), index only
    * each set's canonical-order prefix of length n − ⌈t·n⌉ + 1.
    * Completeness is the classic pigeonhole: J(a,b) ≥ t forces
    * |a∩b| ≥ ⌈t·max(|a|,|b|)⌉, and a's non-prefix suffix holds only
    * ⌈t·|a|⌉ − 1 tokens, so some shared token sits in BOTH prefixes —
    * the filter is LOSSLESS (the spec pins prefix ≡ full-index results
    * property-style; the DuckDB oracle runs the full-index join, so a
    * lost pair cannot hide).
    *
    * Candidates join on prefix tokens only — because prefixes are the
    * RAREST tokens of each set, the stopword-grade token that makes
    * the full index quadratic never enters the index at all (it ranks
    * last). Verification computes the exact Jaccard via
    * array_intersect on the two full token sets carried per candidate
    * — bounded per row, no second corpus shuffle.
    *
    * `keyCol` must be unique per row. Output: k_a, name_a, k_b,
    * name_b, jaccard (a.key < b.key). */
  def selfJoinPrefix(
      df: DataFrame, keyCol: String, nameCol: String,
      threshold: Double): DataFrame = {
    // Both the candidate join (a/b sides) and the verification join
    // (ta/tb sides) reference their source twice — without the cuts
    // the tokenize + two-window posting chain executes FOUR times
    // (measured 10.7 → 1.7 s at sf0.1, final-bench median). The df census stays a
    // WINDOW, not a broadcast join-back: the token vocabulary is
    // open-ended at corpus scale, so the census is not broadcastable.
    val tok = Materialize.cut(tokenized(df, keyCol, nameCol))
    val p = Materialize.cut(prefixPostingOf(tok, threshold))
    val cand = p.select(col("tok"), col("k").as("k_a"))
      .join(p.select(col("tok"), col("k").as("k_b")), Seq("tok"))
      .filter(col("k_a") < col("k_b"))
      .select(col("k_a"), col("k_b")).distinct()
    val ta = tok.select(col("k").as("k_a"), col("name").as("name_a"),
      col("toks").as("toks_a"), col("n_tok").as("n_a"))
    val tb = tok.select(col("k").as("k_b"), col("name").as("name_b"),
      col("toks").as("toks_b"), col("n_tok").as("n_b"))
    cand.join(ta, Seq("k_a")).join(tb, Seq("k_b"))
      .withColumn("common", size(array_intersect(col("toks_a"), col("toks_b"))))
      .withColumn("jaccard",
        col("common").cast("double") / (col("n_a") + col("n_b") - col("common")))
      .filter(col("jaccard") >= threshold)
      .select(col("k_a"), col("name_a"), col("k_b"), col("name_b"), col("jaccard"))
  }

  /** Left-to-right similarity join: every (left, right) candidate pair
    * with Jaccard >= threshold. Output: k_l, name_l, k_r, name_r,
    * jaccard. */
  def join(
      left: DataFrame, leftKey: String, leftName: String,
      right: DataFrame, rightKey: String, rightName: String,
      threshold: Double,
      maxTokenFreq: Option[Long] = None): DataFrame = {
    val l = index(tokenized(left, leftKey, leftName), maxTokenFreq)
      .select(col("tok"), col("k").as("k_l"), col("name").as("name_l"), col("n_tok").as("n_l"))
    val r = index(tokenized(right, rightKey, rightName), maxTokenFreq)
      .select(col("tok"), col("k").as("k_r"), col("name").as("name_r"), col("n_tok").as("n_r"))
    l.join(r, Seq("tok"))
      .groupBy(col("k_l"), col("name_l"), col("n_l"), col("k_r"), col("name_r"), col("n_r"))
      .agg(count(lit(1)).as("common"))
      .withColumn("jaccard",
        col("common").cast("double") / (col("n_l") + col("n_r") - col("common")))
      .filter(col("jaccard") >= threshold)
      .select(col("k_l"), col("name_l"), col("k_r"), col("name_r"), col("jaccard"))
  }
}
