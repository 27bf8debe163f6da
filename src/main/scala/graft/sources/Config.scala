package graft.sources

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory

/** Pipeline configuration, mirroring the reference's config.yaml
  * surface (config.yaml:16-119). Loads either
  *  - flat JSON (this library's native surface), or
  *  - the reference's NESTED YAML layout verbatim
  *    (input/output/search/processing/retry sections) — YAML support
  *    costs no dependency: jackson-dataformat-yaml ships inside Spark.
  *
  * Fetch-tier-only settings (workers, browser.headless, max_pages,
  * delay_between_requests) parse without error and are retained in
  * [[GraftConfig.maxPages]]/[[GraftConfig.batchSize]]/
  * [[GraftConfig.startIndex]] where they have a batch meaning, and
  * ignored otherwise — a reference user's config.yaml loads as-is.
  */
case class GraftConfig(
    companyColumn: String = "company_name",
    regColumn: Option[String] = None,
    /** Excel sheet NAME (input.sheet; None = first sheet). */
    sheet: Option[String] = None,
    filterEntities: Boolean = true,
    entityMarkers: Seq[String] = graft.functions.ThaiEntities.entityMarkers,
    idPattern: String = graft.functions.ThaiEntities.regNumberPattern,
    similarityThreshold: Double = 0.95,
    /** Matching-stage stopword guard: tokens in more than this many
      * names are dropped from the similarity index (skew-safe at
      * corpus scale; None = uncapped). */
    maxTokenFreq: Option[Long] = Some(100000L),
    outputPath: String = "out/records",
    notFoundPath: String = "out/not_found",
    /** Skip the timestamped backup when output exists
      * (output.force_overwrite; see Sinks.backupAndWriteParquet). */
    forceOverwrite: Boolean = false,
    /** Driver-side FS retry budget (retry.max_retries). */
    maxRetries: Int = 3,
    /** Linear backoff increment in seconds
      * (retry.extra_wait_per_retry). */
    extraWaitPerRetrySec: Int = 2,
    /** processing.batch_size — incremental-append chunk size. */
    batchSize: Int = 20,
    /** processing.start_index — resume offset (0-indexed). */
    startIndex: Int = 0,
    /** search.max_pages — candidate-scan bound (fetch-tier; recorded
      * for config parity). */
    maxPages: Int = 100,
    /** TARGET_YEARS (scraper_v2.py:127,1222-1225): restrict extraction
      * to these years; None = export ALL available years, like the
      * reference's `TARGET_YEARS = None` default. */
    targetYears: Option[Seq[Int]] = None,
    /** Names longer than this cannot ride the reference's browser
      * search form — the deterministic batch trigger for its
      * "Browser error" not-found reason (scraper_v2.py:1534-1541). */
    maxNameLength: Int = 255)

object GraftConfig {

  /** Parse from a JSON string; absent keys keep defaults. */
  def fromJson(json: String): GraftConfig =
    fromNode(new ObjectMapper().readTree(json))

  /** Parse from YAML — both the reference's nested config.yaml layout
    * and a flat key set. */
  def fromYaml(yaml: String): GraftConfig =
    fromNode(new ObjectMapper(new YAMLFactory()).readTree(yaml))

  /** Load by extension: .yaml/.yml → YAML, anything else → JSON. */
  def fromFile(path: String): GraftConfig = {
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), java.nio.charset.StandardCharsets.UTF_8)
    if (path.endsWith(".yaml") || path.endsWith(".yml")) fromYaml(text)
    else fromJson(text)
  }

  /** The reference's `generate_default_config` (scraper_v2.py:208-319):
    * emit a commented YAML skeleton with every setting at its default,
    * in the nested section layout `fromYaml` accepts. Values are
    * formatted from `GraftConfig()` itself so the skeleton cannot
    * drift from the code defaults; ConfigRetrySpec pins the
    * round-trip `fromYaml(defaultYaml) == GraftConfig()`.
    */
  def defaultYaml: String = {
    val d = GraftConfig()
    def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    def optStr(o: Option[String]) = o.map(q).getOrElse("null")
    s"""# =====================================================================
       |# graft pipeline configuration — all settings at their defaults.
       |# Emitted by GraftConfig.writeDefault (the reference scraper's
       |# generate_default_config). Keys may live flat or under their
       |# reference section (input/output/search/processing/retry);
       |# the flat spelling wins when both are present.
       |# =====================================================================
       |
       |input:
       |  # column holding company names
       |  company_column: ${q(d.companyColumn)}
       |  # column holding registration numbers (null = none)
       |  reg_column: ${optStr(d.regColumn)}
       |  # Excel sheet name (null = first sheet)
       |  sheet: ${optStr(d.sheet)}
       |  # keep only rows whose name carries a legal-entity marker
       |  filter_thai: ${d.filterEntities}
       |
       |output:
       |  revenue_file: ${q(d.outputPath)}
       |  not_found_file: ${q(d.notFoundPath)}
       |  # skip the timestamped backup when output already exists
       |  force_overwrite: ${d.forceOverwrite}
       |
       |search:
       |  # candidate-scan bound (fetch-tier parity)
       |  max_pages: ${d.maxPages}
       |  # minimum similarity score for fallback matching (1.0 = exact only)
       |  similarity_threshold: ${d.similarityThreshold}
       |
       |processing:
       |  # incremental-append chunk size
       |  batch_size: ${d.batchSize}
       |  # resume offset (0-indexed)
       |  start_index: ${d.startIndex}
       |
       |retry:
       |  max_retries: ${d.maxRetries}
       |  extra_wait_per_retry: ${d.extraWaitPerRetrySec}
       |
       |# ------------------------- engine-side settings ----------------------
       |# legal-entity markers the filter looks for
       |entity_markers: [${d.entityMarkers.map(q).mkString(", ")}]
       |# registration-number shape
       |id_pattern: ${q(d.idPattern)}
       |# similarity-index stopword cap (null = uncapped)
       |max_token_freq: ${d.maxTokenFreq.map(_.toString).getOrElse("null")}
       |# restrict extraction to these years (null = all years)
       |target_years: ${d.targetYears.map(_.mkString("[", ", ", "]")).getOrElse("null")}
       |# names longer than this take the "Browser error" not-found path
       |max_name_length: ${d.maxNameLength}
       |""".stripMargin
  }

  /** Write `defaultYaml` to `path` (no overwrite of an existing file —
    * the reference prompts; we refuse, the caller deletes). */
  def writeDefault(path: String): Unit = {
    val p = java.nio.file.Paths.get(path)
    require(!java.nio.file.Files.exists(p),
      s"refusing to overwrite existing config at $path")
    java.nio.file.Files.write(p,
      defaultYaml.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ()
  }

  private def fromNode(node: JsonNode): GraftConfig = {
    // a key may live flat ("similarity_threshold") or under its
    // reference section ("search.similarity_threshold") — first
    // non-null wins, flat first (the library's own surface)
    def at(keys: String*): Option[JsonNode] =
      keys.iterator.map { k =>
        if (k.contains('/')) node.at("/" + k) else node.path(k)
      }.find(n => !n.isMissingNode && !n.isNull)
    def str(d: String, keys: String*) = at(keys: _*).map(_.asText()).getOrElse(d)
    def opt(keys: String*) = at(keys: _*).map(_.asText())
    def bool(d: Boolean, keys: String*) = at(keys: _*).map(_.asBoolean()).getOrElse(d)
    def dbl(d: Double, keys: String*) = at(keys: _*).map(_.asDouble()).getOrElse(d)
    def int(d: Int, keys: String*) = at(keys: _*).map(_.asInt()).getOrElse(d)
    def seq(d: Seq[String], keys: String*) =
      at(keys: _*).map(_.elements().asScala.map(_.asText()).toSeq).getOrElse(d)
    val defaults = GraftConfig()
    GraftConfig(
      companyColumn = str(defaults.companyColumn, "company_column", "input/company_column"),
      regColumn = opt("reg_column", "input/reg_column"),
      sheet = opt("sheet", "input/sheet"),
      filterEntities = bool(defaults.filterEntities, "filter_entities", "input/filter_thai"),
      entityMarkers = seq(defaults.entityMarkers, "entity_markers"),
      idPattern = str(defaults.idPattern, "id_pattern"),
      similarityThreshold = dbl(defaults.similarityThreshold,
        "similarity_threshold", "search/similarity_threshold"),
      maxTokenFreq = at("max_token_freq") match {
        case Some(n) =>
          require(n.isIntegralNumber && n.asLong() > 0,
            s"max_token_freq must be a positive integer, got '${n.asText()}' " +
              "(a cap of 0 would silently empty the similarity index)")
          Some(n.asLong())
        case None =>
          // distinguish "absent" (default) from explicit null (uncapped)
          if (node.has("max_token_freq")) None else defaults.maxTokenFreq
      },
      outputPath = str(defaults.outputPath, "output_path", "output/revenue_file"),
      notFoundPath = str(defaults.notFoundPath, "not_found_path", "output/not_found_file"),
      forceOverwrite = bool(defaults.forceOverwrite,
        "force_overwrite", "output/force_overwrite"),
      maxRetries = int(defaults.maxRetries, "max_retries", "retry/max_retries"),
      extraWaitPerRetrySec = int(defaults.extraWaitPerRetrySec,
        "extra_wait_per_retry", "retry/extra_wait_per_retry"),
      batchSize = int(defaults.batchSize, "batch_size", "processing/batch_size"),
      startIndex = int(defaults.startIndex, "start_index", "processing/start_index"),
      maxPages = int(defaults.maxPages, "max_pages", "search/max_pages"),
      // explicit null (the reference's TARGET_YEARS = None) and absent
      // both mean "all years" — at() skips nulls
      targetYears = at("target_years", "extraction/target_years")
        .map(_.elements().asScala.map(_.asInt()).toSeq),
      maxNameLength = int(defaults.maxNameLength, "max_name_length"))
  }
}
