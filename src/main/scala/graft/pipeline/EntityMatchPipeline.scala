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
    *                 match_type, search_strategy, field, year, value
    *                 (the reference's output CSV schema,
    *                 scraper_v2.py:1341)
    * @param notFound the reference's not-found CSV
    *                 (scraper_v2.py:1350): entities with no match
    *                 (reason "No search results"), matched entities
    *                 with no financial rows (reason "No revenue data",
    *                 scraper_v2.py:1514) keeping their
    *                 match_type/search_strategy, and the error channel
    *                 (reasons "Browser error" / "Error: …"[:100],
    *                 scraper_v2.py:1534-1545) */
  case class Result(records: DataFrame, notFound: DataFrame)

  /** @param companies   input entity list (the reference's CSV/Excel)
    * @param registry    (idCol, registryNameCol) — the searchable
    *                    entity registry (the reference's DBD search)
    * @param financials  wide fact table: idCol, yearCol, measure cols
    * @param prefixes / suffixes / fillers  normalization vocabulary
    *                    (e.g. [[graft.functions.ThaiEntities]])
    * @param partnershipPrefixes / partnershipShortPrefix /
    *        publicMarker / noSpaceReplacements  the search-term
    *                    expansion's entity-form branches
    *                    ([[TextNorm.searchTerms]] steps 2–3)
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
      fillers: Seq[String],
      partnershipPrefixes: Seq[String] = Nil,
      partnershipShortPrefix: String = "",
      publicMarker: String = "",
      noSpaceReplacements: Seq[(String, String)] = Nil): Result = {

    // 1. ingest: entity filter + id validation + dedup-with-preference.
    // CACHED: one row per input company (dim-scale by contract), read
    // by the existing/unmatched channels and the not-found anti-join —
    // the Verify/Bench harness clearCache()s after materializing; a
    // library caller owns the session (see PipelineQ cache contract).
    val ingested = graft.sources.FileIngest.entities(
      companies, cfg.companyColumn, cfg.regColumn,
      if (cfg.filterEntities) cfg.entityMarkers else Nil, cfg.idPattern)
      .cache()

    val core = (c: org.apache.spark.sql.Column) => TextNorm.coreName(
      TextNorm.cleanFiller(c, fillers), prefixes, suffixes)

    val reg = registry.select(col(idCol).as("__rid"),
      col(registryNameCol).as("__rname"),
      core(col(registryNameCol)).as("__rcore"))

    // 1b. error channel (scraper_v2.py:1534-1545): the reference's
    // per-company try/except records two MORE not-found reasons —
    // "Browser error" (WebDriverException; deterministic batch
    // trigger: a name the browser search form cannot carry, longer
    // than cfg.maxNameLength) and the caught exception's str(e)[:100]
    // passthrough (deterministic trigger: a name normalizing to an
    // EMPTY core — the reference would search with a nonsense term
    // and throw downstream). Both keep the existing reg like the
    // reference's rows and LEAVE the cascade: an errored company is
    // never matched. The message mirrors the [:100] truncation.
    val isOverlong = length(col("name")) > cfg.maxNameLength
    val isEmptyCore = length(core(col("name"))) === 0
    val errors = ingested.filter(isOverlong || isEmptyCore)
      .select(col("name"), coalesce(col("id"), lit("")).as("matched_id"),
        lit("").as("match_type"), lit("").as("search_strategy"),
        when(isOverlong, lit("Browser error"))
          .otherwise(substring(concat(lit("Error: empty core name: '"),
            col("name"), lit("'")), 1, 100)).as("reason"))
    val processed = ingested.filter(!isOverlong && !isEmptyCore)

    // 2a. existing: input already had a valid id — skips search, so no
    // strategy (the reference writes '', scraper_v2.py:1476)
    val existing = processed.filter(col("id").isNotNull)
      .select(col("name"), col("id").as("matched_id"),
        lit("existing").as("match_type"), lit("").as("search_strategy"),
        lit(0).as("__prio"))

    val unmatched = processed.filter(col("id").isNull)
      .select(col("name"), core(col("name")).as("__core"))

    // 2b. exact: core-name equality against the registry, recording
    // WHICH search-term variant surfaced the match. The reference
    // tries generate_search_terms(name) in order and reports the
    // 1-based index of the first term whose keyword search returned
    // the row (scraper_v2.py:1020-1025); the batch model of "the
    // search returned the row" is substring containment in the
    // registry name, evaluated per matched pair — a per-row expression
    // over the ≤8 variants, no extra join. A pair no variant surfaces
    // is not an exact match (faithfully: the scraper would never have
    // seen it).
    val terms = TextNorm.searchTerms(col("name"), prefixes, suffixes, fillers,
      partnershipPrefixes, partnershipShortPrefix, publicMarker,
      noSpaceReplacements)
    val firstSurfacing = array_min(zip_with(
      terms, sequence(lit(1), greatest(size(terms), lit(1))),
      (t, i) => when(col("__rname").contains(t), i)))
    // 'direct' (scraper_v2.py:914,989): a search whose term IS the
    // full registered name redirects straight to the detail page — a
    // unique hit the reference labels search_strategy='direct' instead
    // of the 1-based index. Batch model: the surfacing variant EQUALS
    // the registry name (not merely contained in it).
    val exact = unmatched.join(reg, col("__core") === col("__rcore"))
      .withColumn("__strat", firstSurfacing)
      .filter(col("__strat").isNotNull)
      .select(col("name"), col("__rid").as("matched_id"),
        lit("exact").as("match_type"),
        when(element_at(terms, col("__strat")) === col("__rname"), lit("direct"))
          .otherwise(col("__strat").cast("string")).as("search_strategy"),
        lit(1).as("__prio"))

    // 2c. fuzzy: inverted-index token-Jaccard, threshold, best-first;
    // cfg.maxTokenFreq is the stopword-token skew guard. The reference
    // labels the similarity fallback's strategy 'fallback'
    // (scraper_v2.py:1063-1065).
    val fuzzy = SimilarityJoin.join(
        unmatched, "name", "__core", reg, "__rid", "__rcore",
        cfg.similarityThreshold, maxTokenFreq = cfg.maxTokenFreq)
      .select(col("k_l").as("name"), col("k_r").as("matched_id"),
        concat(lit("similarity_"),
          PRound.pround(col("jaccard") * 100, 0).cast("int").cast("string"),
          lit("%")).as("match_type"),
        lit("fallback").as("search_strategy"),
        lit(2).as("__prio"), col("jaccard"))

    val w = Window.partitionBy(col("name"))
      .orderBy(col("__prio"), col("jaccard").desc_nulls_last, col("matched_id"))
    val matched = existing.withColumn("jaccard", lit(null).cast("double"))
      .unionByName(exact.withColumn("jaccard", lit(null).cast("double")))
      .unionByName(fuzzy)
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .select(col("name"), col("matched_id"), col("match_type"),
        col("search_strategy"))
      // CACHED: one row per matched company; consumed by the records
      // join, the no-results anti-join, and the no-revenue anti-join —
      // uncached, each consumer re-runs the whole match cascade
      .cache()

    // 3. extraction: join facts, melt wide measures to long records;
    // cfg.targetYears replays the reference's TARGET_YEARS filter
    // (scraper_v2.py:1222-1225; None = export all years)
    val joined = matched.join(financials,
      matched("matched_id") === financials(idCol))
    val allYears = Reshape.melt(
        joined.select((Seq(col("name"), col("matched_id"), col("match_type"),
          col("search_strategy"), col(yearCol).as("year")) ++
          measureCols.map(col)): _*),
        Seq("name", "matched_id", "match_type", "search_strategy", "year"),
        measureCols)
      .filter(col("value").isNotNull)
    val records = cfg.targetYears.filter(_.nonEmpty) match {
      case Some(ys) => allYears.filter(col("year").isin(ys: _*))
      case None => allYears
    }

    // 4. not-found side output (scraper_v2.py:1404-1420): unmatched
    // entities (anti-join), matched entities with no financial rows
    // (reason "No revenue data" with their match info,
    // scraper_v2.py:1514), and the error channel (1b above)
    val noResults = processed.join(matched, Seq("name"), "left_anti")
      .select(col("name"), lit("").as("matched_id"), lit("").as("match_type"),
        lit("").as("search_strategy"), lit("No search results").as("reason"))
    val noRevenue = matched.join(
        financials.select(col(idCol).as("__fid")).distinct(),
        col("matched_id") === col("__fid"), "left_anti")
      .select(col("name"), col("matched_id"), col("match_type"),
        col("search_strategy"), lit("No revenue data").as("reason"))
    val notFound = noResults.unionByName(noRevenue).unionByName(errors)

    Result(records, notFound)
  }
}
