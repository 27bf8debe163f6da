package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.PRound
import graft.operators.SimilarityJoin

/** Block D — entity matching (SURVEY.md §2.D).
  *
  * The reference's matching cascade (scraper_v2.py:869-1067): exact
  * match has priority, similarity scoring is the fallback, a
  * threshold rejects weak candidates, and the best candidate per
  * entity wins. Here as set-similarity joins over the distinct
  * part-name vocabulary — candidate generation is inverted-index
  * based (see [[graft.operators.SimilarityJoin]]), never a cross
  * join.
  */
object Match {

  private def distinctNames(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir).select(col("p_name").as("name")).distinct()

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // scraper_v2.py:737-767 calculate_similarity as a join: all name
    // pairs with token-Jaccard >= 0.3. The frequency cap (1000, far
    // above this vocabulary's max df of 8) is the 100TB skew guard —
    // semantics-preserving here, load-bearing on a real corpus.
    "match_jaccard_join" -> { (s, dir) =>
      SimilarityJoin.selfJoin(distinctNames(s, dir), "name", "name", 0.3,
          maxTokenFreq = Some(1000L))
        .select(col("name_a"), col("name_b"), PRound.pround(col("jaccard"), 4).as("jaccard"))
        .orderBy(col("name_a"), col("name_b"))
    },

    // scraper_v2.py:1054-1067 — argmax candidate per entity above the
    // threshold (ties broken lexicographically, mirroring the
    // reference's stable sort). Runs on the custom TopKPerKey
    // operator: partial bounded-heap pruning → shuffle → final, so
    // only ONE candidate per (partition × entity) crosses the wire —
    // the window formulation would shuffle and sort every candidate
    // pair, which is exactly what explodes at 100× candidate volume.
    "match_best" -> { (s, dir) =>
      val names = distinctNames(s, dir)
      val pairs = SimilarityJoin.join(
        names, "name", "name", names, "name", "name", 0.3,
        maxTokenFreq = Some(1000L))
        .filter(col("name_l") =!= col("name_r"))
      graft.operators.TopK.perKey(pairs, Seq("name_l"), "jaccard", "name_r", 1)
        .select(col("name_l").as("name"), col("name_r").as("best_match"),
          PRound.pround(col("jaccard"), 4).as("jaccard"))
        .orderBy(col("name"))
    },

    // scraper_v2.py:969-994 — exact match outranks any similarity
    // match: union both channels with a priority and keep the best.
    "match_exact_first" -> { (s, dir) =>
      val left = Tables.part(s, dir).filter(col("p_type") === "PROMO")
        .select(col("p_name").as("name")).distinct()
      val right = Tables.part(s, dir).filter(col("p_type") === "ECONOMY")
        .select(col("p_name").as("name")).distinct()
      val exact = left.join(right.withColumnRenamed("name", "cand"),
          col("name") === col("cand"))
        .select(col("name"), col("cand"),
          lit("exact").as("match_type"), lit(1.0).as("jaccard"))
      val fuzzy = SimilarityJoin.join(
          left, "name", "name", right, "name", "name", 0.3,
          maxTokenFreq = Some(1000L))
        .filter(col("name_l") =!= col("name_r"))
        .select(col("name_l").as("name"), col("name_r").as("cand"),
          lit("similarity").as("match_type"), col("jaccard"))
      val w = Window.partitionBy(col("name"))
        .orderBy(when(col("match_type") === "exact", 0).otherwise(1),
          col("jaccard").desc, col("cand"))
      exact.unionByName(fuzzy)
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        // reference match_type labels: 'exact' or 'similarity_XX%'
        // (scraper_v2.py:1064)
        .select(col("name"), col("cand"),
          when(col("match_type") === "exact", lit("exact"))
            .otherwise(concat(lit("similarity_"),
              PRound.pround(col("jaccard") * 100, 0).cast("int").cast("string"),
              lit("%"))).as("match_type"),
          PRound.pround(col("jaccard"), 4).as("jaccard"))
        .orderBy(col("name"))
    })

  /** Token-pair Jaccard CTEs shared by the oracles. */
  private val tokCte =
    """toks AS (
      |  SELECT name, string_split(name, ' ') AS t,
      |         len(string_split(name, ' ')) AS n
      |  FROM (SELECT DISTINCT p_name AS name FROM part)),
      |inv AS (SELECT name, n, unnest(t) AS tok FROM toks)""".stripMargin

  def oracle: Map[String, String] = Map(
    "match_jaccard_join" ->
      s"""WITH $tokCte,
         |pairs AS (
         |  SELECT a.name AS name_a, b.name AS name_b,
         |    count(*) AS common, any_value(a.n) AS n_a, any_value(b.n) AS n_b
         |  FROM inv a JOIN inv b ON a.tok = b.tok AND a.name < b.name
         |  GROUP BY a.name, b.name)
         |SELECT name_a, name_b,
         |  round(common / (n_a + n_b - common), 4) AS jaccard
         |FROM pairs
         |WHERE common / (n_a + n_b - common) >= 0.3
         |ORDER BY name_a, name_b""".stripMargin,

    "match_best" ->
      s"""WITH $tokCte,
         |pairs AS (
         |  SELECT a.name AS name_l, b.name AS name_r,
         |    count(*) AS common, any_value(a.n) AS n_l, any_value(b.n) AS n_r
         |  FROM inv a JOIN inv b ON a.tok = b.tok AND a.name <> b.name
         |  GROUP BY a.name, b.name),
         |scored AS (
         |  SELECT name_l, name_r, common / (n_l + n_r - common) AS j
         |  FROM pairs WHERE common / (n_l + n_r - common) >= 0.3),
         |ranked AS (
         |  SELECT name_l, name_r, j,
         |    row_number() OVER (PARTITION BY name_l ORDER BY j DESC, name_r) AS rk
         |  FROM scored)
         |SELECT name_l AS name, name_r AS best_match, round(j, 4) AS jaccard
         |FROM ranked WHERE rk = 1 ORDER BY name""".stripMargin,

    "match_exact_first" ->
      """WITH lt AS (SELECT DISTINCT p_name AS name FROM part WHERE p_type = 'PROMO'),
        |rt AS (SELECT DISTINCT p_name AS name FROM part WHERE p_type = 'ECONOMY'),
        |ltok AS (SELECT name, len(string_split(name,' ')) AS n,
        |         unnest(string_split(name,' ')) AS tok FROM lt),
        |rtok AS (SELECT name, len(string_split(name,' ')) AS n,
        |         unnest(string_split(name,' ')) AS tok FROM rt),
        |exact AS (
        |  SELECT lt.name AS name, rt.name AS cand,
        |    'exact' AS match_type, 1.0 AS jaccard
        |  FROM lt JOIN rt ON lt.name = rt.name),
        |fuzzy AS (
        |  SELECT a.name AS name, b.name AS cand,
        |    'similarity' AS match_type,
        |    count(*) / (any_value(a.n) + any_value(b.n) - count(*)) AS jaccard
        |  FROM ltok a JOIN rtok b ON a.tok = b.tok AND a.name <> b.name
        |  GROUP BY a.name, b.name
        |  HAVING count(*) / (any_value(a.n) + any_value(b.n) - count(*)) >= 0.3),
        |unioned AS (
        |  SELECT * FROM exact UNION ALL SELECT * FROM fuzzy),
        |ranked AS (
        |  SELECT name, cand, match_type, jaccard,
        |    row_number() OVER (PARTITION BY name
        |      ORDER BY CASE WHEN match_type = 'exact' THEN 0 ELSE 1 END,
        |               jaccard DESC, cand) AS rk
        |  FROM unioned)
        |SELECT name, cand,
        |  CASE WHEN match_type = 'exact' THEN 'exact'
        |       ELSE 'similarity_' || CAST(round(jaccard * 100, 0) AS INT) || '%'
        |  END AS match_type,
        |  round(jaccard, 4) AS jaccard
        |FROM ranked WHERE rk = 1 ORDER BY name""".stripMargin)
}
