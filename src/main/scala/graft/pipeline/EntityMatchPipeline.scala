package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{PRound, TextNorm}
import graft.operators.{Reshape, SimilarityJoin}
import graft.sources.GraftConfig

/** The reference's end-to-end workflow as one composed, fully
  * declarative pipeline (scraper_v2.py `main` + `process_company_chunk`,
  * 1438-1811), minus the browser: ingest → match cascade → financial
  * extraction → long-format records + not-found side output.
  *
  * Match cascade precedence, as in the reference:
  *   1. `existing` — input row already carries a valid registration id
  *      (skips search, scraper_v2.py:1472-1477);
  *   2. `exact`    — core names equal (scraper_v2.py:969-971);
  *   3. `similarity_XX%` — best token-Jaccard candidate at/above the
  *      threshold (scraper_v2.py:1054-1067).
  *
  * Every stage is a DataFrame transform: the cascade is a union with a
  * precedence window, matching is the inverted-index similarity join —
  * no per-entity loop, so the same code runs over 10⁹ entities.
  */
object EntityMatchPipeline {

  /** @param records  long-format facts: entity name, matched id,
    *                 match_type, field, year, value
    * @param notFound entities with no match (the reference's
    *                 not-found CSV) */
  case class Result(records: DataFrame, notFound: DataFrame)

  /** @param companies   input entity list (the reference's CSV/Excel)
    * @param registry    (idCol, registryNameCol) — the searchable
    *                    entity registry (the reference's DBD search)
    * @param financials  wide fact table: idCol, yearCol, measure cols
    * @param prefixes / suffixes / fillers  normalization vocabulary
    *                    (e.g. [[graft.functions.ThaiEntities]])
    */
  def run(
      companies: DataFrame,
      registry: DataFrame,
      financials: DataFrame,
      cfg: GraftConfig,
      idCol: String,
      registryNameCol: String,
      yearCol: String,
      measureCols: Seq[String],
      prefixes: Seq[String],
      suffixes: Seq[String],
      fillers: Seq[String]): Result = {

    // 1. ingest: entity filter + id validation + dedup-with-preference
    val ingested = graft.sources.FileIngest.entities(
      companies, cfg.companyColumn, cfg.regColumn,
      if (cfg.filterEntities) cfg.entityMarkers else Nil, cfg.idPattern)

    val core = (c: org.apache.spark.sql.Column) => TextNorm.coreName(
      TextNorm.cleanFiller(c, fillers), prefixes, suffixes)

    val reg = registry.select(col(idCol).as("__rid"),
      col(registryNameCol).as("__rname"),
      core(col(registryNameCol)).as("__rcore"))

    // 2a. existing: input already had a valid id
    val existing = ingested.filter(col("id").isNotNull)
      .select(col("name"), col("id").as("matched_id"),
        lit("existing").as("match_type"), lit(0).as("__prio"))

    val unmatched = ingested.filter(col("id").isNull)
      .select(col("name"), core(col("name")).as("__core"))

    // 2b. exact: core-name equality against the registry
    val exact = unmatched.join(reg, col("__core") === col("__rcore"))
      .select(col("name"), col("__rid").as("matched_id"),
        lit("exact").as("match_type"), lit(1).as("__prio"))

    // 2c. fuzzy: inverted-index token-Jaccard, threshold, best-first;
    // cfg.maxTokenFreq is the stopword-token skew guard
    val fuzzy = SimilarityJoin.join(
        unmatched, "name", "__core", reg, "__rid", "__rcore",
        cfg.similarityThreshold, maxTokenFreq = cfg.maxTokenFreq)
      .select(col("k_l").as("name"), col("k_r").as("matched_id"),
        concat(lit("similarity_"),
          PRound.pround(col("jaccard") * 100, 0).cast("int").cast("string"),
          lit("%")).as("match_type"),
        lit(2).as("__prio"), col("jaccard"))

    val w = Window.partitionBy(col("name"))
      .orderBy(col("__prio"), col("jaccard").desc_nulls_last, col("matched_id"))
    val matched = existing.withColumn("jaccard", lit(null).cast("double"))
      .unionByName(exact.withColumn("jaccard", lit(null).cast("double")))
      .unionByName(fuzzy)
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .select(col("name"), col("matched_id"), col("match_type"))

    // 3. extraction: join facts, melt wide measures to long records
    val joined = matched.join(financials,
      matched("matched_id") === financials(idCol))
    val records = Reshape.melt(
        joined.select((Seq(col("name"), col("matched_id"), col("match_type"),
          col(yearCol).as("year")) ++ measureCols.map(col)): _*),
        Seq("name", "matched_id", "match_type", "year"), measureCols)
      .filter(col("value").isNotNull)

    // 4. not-found side output (anti-join, scraper_v2.py:1404-1420)
    val notFound = ingested.join(matched, Seq("name"), "left_anti")
      .select(col("name"), lit("No search results").as("reason"))

    Result(records, notFound)
  }
}
