package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.PRound

/** Bradley-Terry strength fitting — the pairwise-preference
  * leaderboard model (Bradley & Terry 1952; the fit behind
  * LLM-arena-style rankings): given a census of pairwise outcomes,
  * P(i beats j) = s_i / (s_i + s_j), and the MM update (Hunter, Annals
  * of Statistics 2004)
  *
  *   s_i ← W_i / Σ_j n_ij / (s_i + s_j)
  *
  * converges to the MLE. Runs a FIXED iteration count so the oracle
  * unrolls exactly.
  *
  * Determinism across engines: strengths are normalized by the MAX
  * (order-free, unlike a sum) and rounded to 6 dp after every
  * iteration, and the per-player denominator folds its opponent
  * contributions in OPPONENT-SORTED order (the bm25 sorted-fold
  * discipline) — so the whole trajectory is bit-reproducible under
  * any partitioning.
  *
  * Scale shape: everything after the match census is |players|- and
  * |pairs|-sized (a leaderboard has thousands of players, not
  * billions); the corpus-sized work is whatever builds the census,
  * which the caller owns.
  */
object BradleyTerry {

  /** Fit strengths from a DIRECTED match census `(i, j, n, w)` —
    * n matches between i and j (appearing once per direction),
    * w wins for i in them. Returns (i, s) with s ∈ (0, 1], max 1.
    * Players with zero wins get strength 0 after one iteration and
    * stay there — ranked, not dropped. */
  def fit(matches: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val m = Materialize.cut(matches.select(col("i"), col("j"),
      col("n").cast("double").as("n")))
    val wins = Materialize.cut(matches.groupBy(col("i"))
      .agg(sum(col("w")).cast("double").as("wi")))
    val totW = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    var s = wins.select(col("i"), lit(1.0).as("s"))
    for (_ <- 1 to iters) {
      val sj = s.select(col("i").as("j"), col("s").as("s_j"))
      val den = m.join(s, Seq("i")).join(sj, Seq("j"))
        .select(col("i"), col("j"),
          // Epsilon floor on the denominator (Hunter's conventional MM
          // guard): a match between two zero-strength players would
          // otherwise be a non-ANSI 0-divide -> NULL that poisons the
          // sorted fold (a + null = null) and silently NULLs the
          // strength. With the floor the contrib is finite-but-huge, so
          // a zero-win player still converges to strength 0 — ranked,
          // not NULLed. Cannot fire unless both sides have zero wins.
          (col("n") / greatest(col("s") + col("s_j"), lit(1e-12)))
            .as("contrib"))
        .groupBy(col("i"))
        .agg(aggregate(
          sort_array(collect_list(struct(col("j"), col("contrib")))),
          lit(0.0), (a, x) => a + x.getField("contrib")).as("den"))
      val raw = wins.join(den, Seq("i"))
        .select(col("i"), (col("wi") / col("den")).as("raw"))
      s = Materialize.cut(raw
        .withColumn("mx", max(col("raw")).over(totW))
        .select(col("i"), PRound.pround(col("raw") / col("mx"), 6).as("s")))
    }
    s
  }
}
