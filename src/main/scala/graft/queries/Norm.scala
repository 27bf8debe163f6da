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
    // variants with a 1-based strategy index (posexplode), at full
    // 8-strategy fidelity. Entity names are synthesized with the
    // reference's actual Thai legal-form vocabulary so the
    // partnership (steps 2-3a) and public-company (steps 2-3b)
    // branches both fire.
    "terms_expand" -> { (s, dir) =>
      import graft.functions.ThaiEntities
      val name = when(col("p_partkey") % 3 === 0,
          concat(lit("บริษัท "), col("p_name"), lit(" จำกัด (มหาชน)")))
        .when(col("p_partkey") % 3 === 1,
          concat(lit("ห้างหุ้นส่วนจำกัด "), col("p_name")))
        .otherwise(concat(lit("บริษัท "), col("p_name"), lit(" จำกัด")))
      Tables.part(s, dir)
        .select(col("p_partkey"),
          TextNorm.searchTerms(name, Seq(ThaiEntities.companyPrefix),
            ThaiEntities.legalSuffixes, Seq(fillerNouns),
            partnershipPrefixes = ThaiEntities.partnershipPrefixes,
            partnershipShortPrefix = ThaiEntities.partnershipShortPrefix,
            publicMarker = ThaiEntities.publicMarker,
            noSpaceReplacements = ThaiEntities.noSpaceReplacements).as("terms"))
        .select(col("p_partkey"), posexplode(col("terms")).as(Seq("pos", "term")))
        .select(col("p_partkey"), (col("pos") + 1).as("strategy"), col("term"))
        .orderBy(col("p_partkey"), col("strategy"))
    },

    // scraper_v2.py:637-640 — search-result lines carry a
    // "row reg-number name" prefix; coreName's reg capture strips it
    // before extraction. Odd rows take the partnership break-on-first
    // prefix path instead (scraper_v2.py:645-651).
    "norm_core_reg" -> { (s, dir) =>
      import graft.functions.ThaiEntities
      val reg = concat(lit("0"),
        lpad((col("p_partkey").cast("long") * 7919 % 1000000000000L).cast("string"),
          12, "0"))
      val line = when(col("p_partkey") % 2 === 0,
          concat(col("p_partkey").cast("string"), lit(" "), reg,
            lit(" บริษัท "), col("p_name"), lit(" จำกัด (มหาชน)")))
        .otherwise(concat(lit("ห้างหุ้นส่วนจำกัด "), col("p_name")))
      Tables.part(s, dir)
        .select(col("p_partkey"), line.as("raw"),
          TextNorm.coreName(line, Seq(ThaiEntities.companyPrefix),
            ThaiEntities.legalSuffixes,
            regPrefixPattern = ThaiEntities.regPrefixPattern,
            firstOnlyPrefixes = ThaiEntities.partnershipPrefixes).as("core"))
        .orderBy(col("p_partkey"))
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

    // Expected-value oracle: per entity-form branch, the 8-step
    // variant list is written out directly (the synthesized cores are
    // just p_name), then empty-filtered + first-occurrence-deduped
    // like the reference.
    "terms_expand" ->
      s"""WITH base AS (
         |  SELECT p_partkey, p_name,
         |    trim(regexp_replace(regexp_replace(p_name,
         |         '(?i)$fillerNouns', ' ', 'g'), '\\s+', ' ', 'g')) AS cleaned,
         |    string_split(p_name, ' ') AS t
         |  FROM part),
         |built AS (
         |  SELECT p_partkey,
         |    (CASE WHEN p_partkey % 3 = 0 THEN
         |       [p_name || ' จำกัด (มหาชน)', p_name || ' จำกัด(มหาชน)',
         |        p_name || ' จำกัด', p_name, cleaned, p_name, p_name]
         |     WHEN p_partkey % 3 = 1 THEN
         |       ['ห้างหุ้นส่วนจำกัด ' || p_name, p_name,
         |        'ห้างหุ้นส่วน ' || p_name, p_name, cleaned, p_name, p_name]
         |     ELSE
         |       [p_name || ' จำกัด', '', '', p_name, cleaned, p_name, p_name]
         |     END) ||
         |    list_reverse([array_to_string(t[1:i], ' ')
         |                  for i in range(1, len(t))]) AS l
         |  FROM base),
         |exploded AS (
         |  SELECT p_partkey, unnest(l) AS term,
         |         generate_subscripts(l, 1) AS idx
         |  FROM built),
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

    // Expected-value oracle: both branches reduce to core = p_name.
    "norm_core_reg" ->
      """SELECT p_partkey,
        |  CASE WHEN p_partkey % 2 = 0 THEN
        |    p_partkey || ' 0' ||
        |    lpad(CAST(CAST(p_partkey AS BIGINT) * 7919 % 1000000000000
        |              AS VARCHAR), 12, '0') ||
        |    ' บริษัท ' || p_name || ' จำกัด (มหาชน)'
        |  ELSE 'ห้างหุ้นส่วนจำกัด ' || p_name END AS raw,
        |  p_name AS core
        |FROM part ORDER BY p_partkey""".stripMargin,

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
