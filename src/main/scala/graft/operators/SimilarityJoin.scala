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
