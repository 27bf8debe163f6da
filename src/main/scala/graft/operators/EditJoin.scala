package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Prefix-filtered edit-distance (Levenshtein) self-join — the
  * string-similarity sibling of [[SimilarityJoin.selfJoinPrefix]]
  * (Ed-Join's q-gram candidate scheme, Xiao et al., VLDB 2008; the
  * reference's fuzzy matcher at scraper_v2.py:737-767 is the
  * token-set analog).
  *
  * Candidate scheme, for edit threshold d over q-gram TYPES:
  * one edit operation destroys at most q gram occurrences, so
  * ed(s1,s2) ≤ d destroys ≤ q·d occurrences, hence at most q·d gram
  * TYPES of s1 can be absent from s2 (a missing type needs ALL its
  * occurrences destroyed): |T1 ∩ T2| ≥ |Ti| − q·d for both sides.
  * With α = max(|T1|,|T2|) − q·d ≥ 1, the classic prefix-filter
  * pigeonhole (Chaudhuri et al., ICDE 2006) under one global gram
  * order (ascending document frequency, ties by gram — rarest first)
  * says prefixes of length |Ti| − α + 1 ≤ q·d + 1 must intersect — so
  * indexing each string's first q·d + 1 grams is LOSSLESS for every
  * pair whose LARGER side carries more than q·d gram types (when the
  * smaller side has |T1| < α, overlap ≥ α > |T1| is impossible and
  * the pair cannot exist at all). Because prefixes hold each string's
  * RAREST grams, the stopword-grade gram that makes a full gram index
  * quadratic never enters the index.
  *
  * The pigeonhole is VACUOUS when both sides have ≤ q·d gram types
  * ("aacc"/"aabc" are distance 1 and share NO trigram): such strings
  * — too short (< q·d + q − 1 chars) or degenerately repetitive — go
  * to a SHORT side channel compared all-pairs (broadcast: the bucket
  * is a few-types contract, vanishingly rare in natural text; a
  * deployment caps it and fails loudly like the band-cap guards).
  * Short×long pairs are covered by the prefix scheme above. The spec
  * pins scheme ≡ naive all-pairs DP property-style.
  *
  * Verification computes exact `levenshtein` per candidate (codegen'd,
  * bounded per row). A length pre-filter (||s1|−|s2|| ≤ d) prunes
  * before the distance runs.
  *
  * Scale dial: candidate volume is Σ_g df(g)² over prefix grams —
  * QUADRATIC in corpus size once the gram space saturates, whatever
  * the space (the ScaleSmoke fixture measured it twice: an md5-HEX
  * salt's 4096-trigram space went 87 → 1892 MB shuffle at 3× input,
  * and natural-text windows still grew 424 MB → 11 GB). Bump q for
  * selectivity (lossless while max(l) − q + 1 > q·d); for the 100 TB
  * path pass `maxGramFreq` — prefix grams above the cap stop
  * generating candidates, making candidate volume ≤ N·(q·d+1)·cap,
  * LINEAR in N. Like [[SimilarityJoin]]'s maxTokenFreq this is the
  * standard bounded-loss production blocking tradeoff: a pair whose
  * every shared prefix gram is capped is not a candidate. The
  * oracle-checked query runs uncapped (lossless, full-index-verified);
  * the smoke runs capped (the honest scale configuration).
  *
  * Scale: the only corpus-keyed shuffles are the gram-df window and
  * the (q·d+1)-wide posting join; candidates are distinct (k_a, k_b)
  * pairs before the verify join, so the exact distance runs once per
  * pair.
  */
object EditJoin {

  /** (k, s, grams, n_types) with the distinct q-gram types of each
    * string (empty for strings shorter than q — NOT a descending
    * sequence: Spark's sequence(1, stop) counts DOWN for stop < 1). */
  private def grams(df: DataFrame, keyCol: String, strCol: String,
                    q: Int): DataFrame =
    df.select(col(keyCol).as("k"), col(strCol).as("s"))
      .withColumn("grams",
        when(length(col("s")) >= q, array_distinct(
          transform(sequence(lit(1), length(col("s")) - (q - 1)),
            i => col("s").substr(i, lit(q)))))
          .otherwise(array().cast("array<string>")))
      .withColumn("n_types", size(col("grams")))

  /** All pairs (a, b) with levenshtein(s_a, s_b) <= d, a.key < b.key.
    * Output: k_a, s_a, k_b, s_b, dist. `keyCol` must be unique. */
  def selfJoin(df: DataFrame, keyCol: String, strCol: String,
               d: Int, q: Int = 3,
               maxGramFreq: Option[Long] = None): DataFrame = {
    val g = Materialize.cut(grams(df, keyCol, strCol, q))
    // rarest-first canonical order; keep the q·d+1 prefix. The cap
    // filters AFTER prefix selection: capped grams stop generating
    // candidates, they don't lengthen anyone's prefix.
    //
    // r17 (guide §2.3/§2.4): the old shape ran TWO windows — a
    // count() over partitionBy(gram) and a row_number() over
    // partitionBy(k) — i.e. two full shuffle+SORT passes of every
    // posting row. The df census is an aggregation (map-side partial
    // counts, one row per distinct gram crosses the wire), and the
    // per-string prefix is selected ROW-LOCALLY: re-attach df, regroup
    // to the string (hash aggregation, no sort), order the ≤ l−q+1
    // grams in-row and slice the q·d+1 head. Same (gram, k) set —
    // (__df, gram) is a total order per string, so the sort_array
    // head is exactly the row_number ≤ q·d+1 slice.
    val dfTab = g.select(explode(col("grams")).as("gram"))
      .groupBy(col("gram")).agg(count(lit(1)).as("__df"))
    val posting = g
      .select(col("k"), explode(col("grams")).as("gram"))
      .join(dfTab, Seq("gram"))
      .groupBy(col("k"))
      .agg(slice(sort_array(collect_list(struct(col("__df"), col("gram")))),
        1, q * d + 1).as("__pre"))
      .select(col("k"), explode(col("__pre")).as("__p"))
      .filter(maxGramFreq.map(col("__p.__df") <= _).getOrElse(lit(true)))
      .select(col("__p.gram").as("gram"), col("k"))
    val p = Materialize.cut(posting)
    // short side channel: both sides ≤ q·d gram types (see scaladoc)
    val sh = g.filter(col("n_types") <= q * d).select(col("k"))
    val candShort = sh.select(col("k").as("k_a"))
      .crossJoin(broadcast(sh.select(col("k").as("k_b"))))
      .filter(col("k_a") < col("k_b"))
    val cand = p.select(col("gram"), col("k").as("k_a"))
      .join(p.select(col("gram"), col("k").as("k_b")), Seq("gram"))
      .filter(col("k_a") < col("k_b"))
      .select(col("k_a"), col("k_b"))
      .unionByName(candShort)
      .distinct()
    val sa = g.select(col("k").as("k_a"), col("s").as("s_a"))
    val sb = g.select(col("k").as("k_b"), col("s").as("s_b"))
    cand.join(sa, Seq("k_a")).join(sb, Seq("k_b"))
      .filter(abs(length(col("s_a")) - length(col("s_b"))) <= d)
      .withColumn("dist", levenshtein(col("s_a"), col("s_b")).cast("long"))
      .filter(col("dist") <= d)
      .select(col("k_a"), col("s_a"), col("k_b"), col("s_b"), col("dist"))
  }
}
