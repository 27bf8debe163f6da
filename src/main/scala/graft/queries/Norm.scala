package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextNorm

/** Blocks B + C — text normalization and search-term expansion
  * (SURVEY.md §2.B/§2.C; scraper_v2.py:612-866).
  *
  * Entity names are synthesized from part columns
  * (`p_name (p_brand) p_size`-style) so every normalization step has
  * real work to do; all functions are `functions._` compositions that
  * stay inside WholeStageCodegen.
  */
object Norm {

  private val fillerNouns = "(?:widget|gizmo|anvil|ring|gear|bolt|plate|rod)"

  /** `p_name (p_brand) p_size` — e.g. "cold widget (Brand#13) 45". */
  private def fullName = concat(col("p_name"), lit(" ("), col("p_brand"), lit(") "), col("p_size"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // scraper_v2.py:612-621 normalize_company_name
    "norm_name" -> { (s, dir) =>
      Tables.part(s, dir)
        .select(col("p_partkey"),
          TextNorm.stripMarkers(fullName, Seq("Brand#")).as("normalized"))
        .orderBy(col("p_partkey"))
    },

    // scraper_v2.py:624-662 extract_company_core_name
    "norm_core_name" -> { (s, dir) =>
      Tables.part(s, dir)
        .select(col("p_partkey"),
          TextNorm.coreName(fullName, Nil, Seq(" (")).as("core"))
        .orderBy(col("p_partkey"))
    },

    // scraper_v2.py:700-714 remove_parentheses
    "norm_remove_parens" -> { (s, dir) =>
      Tables.part(s, dir)
        .select(col("p_partkey"), TextNorm.removeParens(fullName).as("cleaned"))
        .orderBy(col("p_partkey"))
    },

    // scraper_v2.py:717-734 remove_trailing_numbers
    "norm_remove_trailing_num" -> { (s, dir) =>
      Tables.part(s, dir)
        .select(col("p_partkey"),
          TextNorm.removeTrailingNumbers(fullName).as("cleaned"))
        .orderBy(col("p_partkey"))
    },

    // scraper_v2.py:666-697 clean_filler_words
    "norm_clean_filler" -> { (s, dir) =>
      Tables.part(s, dir)
        .select(col("p_partkey"),
          TextNorm.cleanFiller(col("p_name"), Seq(fillerNouns)).as("cleaned"))
        .orderBy(col("p_partkey"))
    },

    // scraper_v2.py:770-866 generate_search_terms: ordered, deduped
    // variants with a 1-based strategy index (posexplode).
    "terms_expand" -> { (s, dir) =>
      val name = concat(col("p_name"), lit(" "), col("p_brand"))
      Tables.part(s, dir)
        .select(col("p_partkey"),
          TextNorm.searchTerms(name, Nil, Seq(" Brand#"), Seq(fillerNouns)).as("terms"))
        .select(col("p_partkey"), posexplode(col("terms")).as(Seq("pos", "term")))
        .select(col("p_partkey"), (col("pos") + 1).as("strategy"), col("term"))
        .orderBy(col("p_partkey"), col("strategy"))
    },

    // scraper_v2.py:855-864 progressive word trimming on a 4-token name.
    "terms_trim_progressive" -> { (s, dir) =>
      val name = concat(col("p_name"), lit(" "), col("p_type"), lit(" "), col("p_brand"))
      Tables.part(s, dir)
        .select(col("p_partkey"), TextNorm.progressiveTrims(name).as("trims"))
        .select(col("p_partkey"), posexplode(col("trims")).as(Seq("pos", "term")))
        .select(col("p_partkey"), (col("pos") + 1).as("n_trimmed"), col("term"))
        .orderBy(col("p_partkey"), col("n_trimmed"))
    })

  private val fullNameSql =
    "p_name || ' (' || p_brand || ') ' || p_size"

  def oracle: Map[String, String] = Map(
    "norm_name" ->
      s"""SELECT p_partkey,
         |  trim(regexp_replace(replace($fullNameSql, 'Brand#', ' '),
         |       '\\s+', ' ', 'g')) AS normalized
         |FROM part ORDER BY p_partkey""".stripMargin,

    "norm_core_name" ->
      s"""SELECT p_partkey,
         |  trim(regexp_replace(split_part($fullNameSql, ' (', 1),
         |       '\\s+', ' ', 'g')) AS core
         |FROM part ORDER BY p_partkey""".stripMargin,

    "norm_remove_parens" ->
      s"""SELECT p_partkey,
         |  trim(regexp_replace(regexp_replace($fullNameSql,
         |       '\\([^)]*\\)', ' ', 'g'), '\\s+', ' ', 'g')) AS cleaned
         |FROM part ORDER BY p_partkey""".stripMargin,

    "norm_remove_trailing_num" ->
      s"""SELECT p_partkey,
         |  trim(regexp_replace(regexp_replace(regexp_replace($fullNameSql,
         |       '\\(\\d+\\)', ' ', 'g'), '\\s+\\d+\\s*$$', '', 'g'),
         |       '\\s+', ' ', 'g')) AS cleaned
         |FROM part ORDER BY p_partkey""".stripMargin,

    "norm_clean_filler" ->
      s"""SELECT p_partkey,
         |  trim(regexp_replace(regexp_replace(p_name,
         |       '(?i)$fillerNouns', ' ', 'g'), '\\s+', ' ', 'g')) AS cleaned
         |FROM part ORDER BY p_partkey""".stripMargin,

    "terms_expand" ->
      s"""WITH base AS (
         |  SELECT p_partkey,
         |    p_name || ' ' || p_brand AS fullname,
         |    p_name AS core,
         |    trim(regexp_replace(regexp_replace(p_name,
         |         '(?i)$fillerNouns', ' ', 'g'), '\\s+', ' ', 'g')) AS cleaned,
         |    split_part(p_name, ' ', 1) AS trim1
         |  FROM part),
         |lists AS (
         |  SELECT p_partkey, [fullname, core, cleaned, core, core, trim1] AS l
         |  FROM base),
         |exploded AS (
         |  SELECT p_partkey, unnest(l) AS term,
         |         generate_subscripts(l, 1) AS idx
         |  FROM lists),
         |dedup AS (
         |  SELECT p_partkey, term, idx,
         |    row_number() OVER (PARTITION BY p_partkey, term ORDER BY idx) AS rn
         |  FROM exploded WHERE term <> ''),
         |ranked AS (
         |  SELECT p_partkey, term,
         |    row_number() OVER (PARTITION BY p_partkey ORDER BY idx) AS strategy
         |  FROM dedup WHERE rn = 1)
         |SELECT p_partkey, strategy, term FROM ranked
         |ORDER BY p_partkey, strategy""".stripMargin,

    "terms_trim_progressive" ->
      """WITH base AS (
        |  SELECT p_partkey, p_name || ' ' || p_type || ' ' || p_brand AS name
        |  FROM part),
        |lists AS (
        |  SELECT p_partkey, [
        |    array_to_string(string_split(name, ' ')[1:3], ' '),
        |    array_to_string(string_split(name, ' ')[1:2], ' '),
        |    string_split(name, ' ')[1]] AS l
        |  FROM base)
        |SELECT p_partkey, generate_subscripts(l, 1) AS n_trimmed,
        |       unnest(l) AS term
        |FROM lists ORDER BY p_partkey, n_trimmed""".stripMargin)
}
