package graft.sources

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper

/** Pipeline configuration, mirroring the reference's config.yaml
  * surface (input column names, entity filtering, matching thresholds,
  * output paths — config.yaml:16-119) as a JSON document. JSON instead
  * of YAML keeps the library dependency-free (Jackson ships inside
  * Spark); the reference's YAML maps 1:1.
  */
case class GraftConfig(
    companyColumn: String = "company_name",
    regColumn: Option[String] = None,
    filterEntities: Boolean = true,
    entityMarkers: Seq[String] = graft.functions.ThaiEntities.entityMarkers,
    idPattern: String = graft.functions.ThaiEntities.regNumberPattern,
    similarityThreshold: Double = 0.95,
    /** Matching-stage stopword guard: tokens in more than this many
      * names are dropped from the similarity index (skew-safe at
      * corpus scale; None = uncapped). */
    maxTokenFreq: Option[Long] = Some(100000L),
    outputPath: String = "out/records",
    notFoundPath: String = "out/not_found")

object GraftConfig {

  /** Parse from a JSON string; absent keys keep defaults. */
  def fromJson(json: String): GraftConfig = {
    val node = new ObjectMapper().readTree(json)
    def str(k: String, d: String) = if (node.has(k)) node.get(k).asText() else d
    def opt(k: String) = if (node.has(k) && !node.get(k).isNull) Some(node.get(k).asText()) else None
    def bool(k: String, d: Boolean) = if (node.has(k)) node.get(k).asBoolean() else d
    def dbl(k: String, d: Double) = if (node.has(k)) node.get(k).asDouble() else d
    def seq(k: String, d: Seq[String]) =
      if (node.has(k)) node.get(k).elements().asScala.map(_.asText()).toSeq else d
    val defaults = GraftConfig()
    GraftConfig(
      companyColumn = str("company_column", defaults.companyColumn),
      regColumn = opt("reg_column"),
      filterEntities = bool("filter_entities", defaults.filterEntities),
      entityMarkers = seq("entity_markers", defaults.entityMarkers),
      idPattern = str("id_pattern", defaults.idPattern),
      similarityThreshold = dbl("similarity_threshold", defaults.similarityThreshold),
      maxTokenFreq =
        if (node.has("max_token_freq"))
          Option(node.get("max_token_freq")).filterNot(_.isNull).map { n =>
            require(n.isIntegralNumber && n.asLong() > 0,
              s"max_token_freq must be a positive integer, got '${n.asText()}' " +
                "(a cap of 0 would silently empty the similarity index)")
            n.asLong()
          }
        else defaults.maxTokenFreq,
      outputPath = str("output_path", defaults.outputPath),
      notFoundPath = str("not_found_path", defaults.notFoundPath))
  }

  def fromFile(path: String): GraftConfig =
    fromJson(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), java.nio.charset.StandardCharsets.UTF_8))
}
