package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{HtmlText, PRound, ThaiEntities}
import graft.pipeline.{CorpusCurationPipeline, EntityMatchPipeline}
import graft.sources.GraftConfig

/** The reference's END-TO-END workflow as two oracle-checked queries
  * (scraper_v2.py main + process_company_chunk, 1438-1811): ingest →
  * existing/exact/similarity match cascade → financial extraction →
  * long-format records + the not-found side output. A user of the
  * reference switches by calling [[EntityMatchPipeline.run]] with
  * their own tables — this block proves the whole composition against
  * DuckDB, not just the stages.
  *
  * Synthetic world from the part/lineitem tables:
  *  - registry: one entity per distinct part name, reg-number id
  *    `'0' + zero-padded min partkey` (the reference's `^0\d{12}$`);
  *  - companies (5 rows per entity): one with a valid reg id
  *    (existing path), one as partnership spelling (exact core path,
  *    search strategy 1), one with a filler parenthetical (exact after
  *    filler cleaning, search strategy 3), one first-word-only
  *    (similarity path, strategy 'fallback'), one nonexistent
  *    (not-found path);
  *  - financials: lineitem rolled up per (reg id, ship year),
  *    withholding partkeys ≡ 0 (mod 10) so ~10% of matched entities
  *    exercise the "No revenue data" side output.
  */
object PipelineQ {

  /** Per-(session, dir) memo for the CURATION capstone: its two
    * queries share ONE built Result, so a Verify/Bench pass runs the
    * eager components fixpoint once, not once per query (the round-4
    * double-fixpoint), and the run's localCheckpoint keeps the labels
    * readable after the harness clearCache()s between queries.
    *
    * The entity-match pipeline is NOT memoized: its Result relies on
    * plain `.cache()` marks that a harness clearCache() would strip
    * from a memoized copy, leaving every later consumer to re-run the
    * whole cascade uncached (measured: pipeline_notfound 3.4 → 5.9 s).
    * Rebuilding it per query re-registers the caches — the pre-round-5
    * behavior. */
  private val curationMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), CorpusCurationPipeline.Result]

  private def result(s: SparkSession, dir: String): EntityMatchPipeline.Result = {
    // cache: this dim-sized frame (one row per distinct entity name)
    // feeds the registry plus all four synthetic company groups — six
    // consumers would otherwise each re-aggregate the part scan.
    // CACHE CONTRACT: the returned Result is lazy, so this method
    // cannot unpersist (the cache must outlive the caller's action).
    // The Verify/Bench harnesses clearCache() after materializing each
    // query; any other caller owns the session and should do the same
    // (or let Spark's LRU storage eviction reclaim the few MB).
    val reg0 = Tables.part(s, dir).groupBy(col("p_name"))
      .agg(min(col("p_partkey")).as("pk"))
      .select(col("p_name"),
        concat(lit("0"), lpad(col("pk").cast("string"), 12, "0")).as("rid"))
      .cache()
    val registry = reg0.select(col("rid").as("fid"),
      concat(lit("บริษัท "), col("p_name"), lit(" จำกัด")).as("rname"))
    val nul = lit(null).cast("string")
    val companies = reg0.select(
        concat(lit("บริษัท "), col("p_name"), lit(" จำกัด")).as("name"),
        col("rid").as("reg"))
      .unionByName(reg0.select(
        concat(lit("ห้างหุ้นส่วนจำกัด "), col("p_name")).as("name"), nul.as("reg")))
      .unionByName(reg0.select(
        concat(lit("บริษัท "), col("p_name"), lit(" (ประเทศไทย) จำกัด")).as("name"),
        nul.as("reg")))
      .unionByName(reg0.select(
        concat(lit("บริษัท "), split(col("p_name"), " ").getItem(0), lit(" จำกัด")).as("name"),
        nul.as("reg")))
      .unionByName(reg0.select(
        concat(lit("บริษัท ไม่มีจริง"), col("rid"), lit(" จำกัด")).as("name"),
        nul.as("reg")))
      // two planted error-channel rows (scraper_v2.py:1534-1545): a
      // name too long for the browser form ("Browser error") and a
      // name normalizing to an empty core (exception passthrough)
      .unionByName {
        import s.implicits._
        Seq((errLongName, null.asInstanceOf[String]),
          (errEmptyCoreName, null.asInstanceOf[String])).toDF("name", "reg")
      }
    val financials = Tables.lineitem(s, dir)
      .filter(col("l_partkey") % 10 =!= 0)
      .groupBy(
        concat(lit("0"), lpad(col("l_partkey").cast("string"), 12, "0")).as("fid"),
        year(col("l_shipdate")).as("year"))
      .agg(sum(col("l_quantity")).as("qty"),
        sum(col("l_extendedprice")).as("revenue"))
    EntityMatchPipeline.run(
      companies, registry, financials,
      GraftConfig(companyColumn = "name", regColumn = Some("reg"),
        similarityThreshold = 0.3),
      idCol = "fid", registryNameCol = "rname", yearCol = "year",
      measureCols = Seq("qty", "revenue"),
      prefixes = ThaiEntities.allPrefixes,
      suffixes = ThaiEntities.legalSuffixes,
      fillers = Seq("\\(ประเทศไทย\\)"),
      partnershipPrefixes = ThaiEntities.partnershipPrefixes,
      partnershipShortPrefix = ThaiEntities.partnershipShortPrefix,
      publicMarker = ThaiEntities.publicMarker,
      noSpaceReplacements = ThaiEntities.noSpaceReplacements)
  }

  /** Planted error-channel rows — shared by the synthetic company
    * list and the pipeline_notfound oracle so the two cannot drift.
    * The long name exceeds GraftConfig.maxNameLength (255); the other
    * normalizes to an empty core. */
  private val errLongName =
    "บริษัท " + ("ยาวเกินขนาดฟอร์ม" * 20) + " จำกัด"
  private val errEmptyCoreName = "บริษัท จำกัด"

  /** Mixture weights for the curation capstone (permyriad keep rates
    * per language) — distinct from Curation's sample_weighted map so
    * the two oracle replays can't mask each other. */
  private val mixWeights = Map(
    "en" -> 8000, "de" -> 2500, "zh" -> 10000, "fr" -> 5000, "es" -> 7500)

  /** Curation-capstone parameters, passed explicitly to
    * [[CorpusCurationPipeline.run]] AND interpolated into the oracle
    * SQL — one source, so a default change on either side cannot make
    * the two silently diverge until the next verify run. */
  private val curBudget = 256L
  private val curThreshold = 0.5

  /** The LLM-side capstone input: the documents table with planted
    * exact and near copies carrying their language (the lang-aware
    * twin of [[Corpus.plantedDocs]]), so every stage of the curation
    * chain has work to do. */
  private def curation(s: SparkSession, dir: String): CorpusCurationPipeline.Result =
    curationMemo.computeIfAbsent((s, dir), _ => buildCuration(s, dir))

  private def buildCuration(s: SparkSession, dir: String): CorpusCurationPipeline.Result = {
    val d = Tables.documents(s, dir)
      .select(col("doc_id").as("id"), col("lang"), col("text"))
    val planted = d
      .unionByName(d.filter(col("id") % 25 === 0)
        .select((col("id") + 1000000).as("id"), col("lang"), col("text")))
      .unionByName(d.filter(col("id") % 50 === 0)
        .select((col("id") + 2000000).as("id"), col("lang"),
          regexp_replace(col("text"), "^\\S+\\s+", "").as("text")))
    CorpusCurationPipeline.run(planted, "id", "lang", "text", mixWeights,
      budget = curBudget, threshold = curThreshold)
  }

  /** Deterministic HTML page per document — the response-record body
    * for the crawl capstone and the html_main_text fixture. Real
    * boilerplate shapes around the document text as the single
    * content block: a nav (short AND link-dense — both rules drop
    * it), a related-links block (long enough but link-dense — only
    * the density rule drops it), a footer (link-dense), and
    * style/script noise removed outright. */
  private def htmlPage: org.apache.spark.sql.Column = concat(
    lit("<html><head><title>doc "), col("doc_id").cast("string"),
    lit("</title><style>body { color: #222; }</style>" +
      "<script>var tracker = 'x';</script></head><body>" +
      "<nav><a href=\"/\">home</a> <a href=\"/tags\">tags</a> " +
      "<a href=\"/about\">about</a></nav>" +
      "<div class=\"content\">"),
    col("text"),
    lit("</div><div class=\"related\"><a href=\"/r/1\">related one</a> " +
      "<a href=\"/r/2\">related two</a> <a href=\"/r/3\">related three</a></div>" +
      "<footer><a href=\"/terms\">terms</a> <a href=\"/privacy\">privacy</a> " +
      "<a href=\"/contact\">contact</a> (c) example</footer></body></html>"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipeline_records" -> { (s, dir) =>
      result(s, dir).records
        .select(col("name"), col("matched_id"), col("match_type"),
          col("search_strategy"), col("year"), col("field"),
          PRound.pround(col("value"), 2).as("value"))
        .orderBy(col("name"), col("year"), col("field"))
    },

    "pipeline_notfound" -> { (s, dir) =>
      result(s, dir).notFound.orderBy(col("name"))
    },

    // The curated-and-packed corpus: every doc that survives exact
    // dedup, near dedup, the quality gates, and mixture sampling,
    // with its context-window bin.
    "pipeline_curate" -> { (s, dir) =>
      curation(s, dir).packed
        .select(col("id"), col("lang"), col("n_tok"), col("bin"))
        .orderBy(col("id"))
    },

    // The curation run's report: one row per stage with cumulative
    // survivor counts and token volume.
    "pipeline_curate_report" -> { (s, dir) =>
      curation(s, dir).report.orderBy(col("stage_ord"))
    },

    // MULTIMODAL curation capstone (round 16 — the media twin of
    // pipeline_curate, composing the round's decoded-PCM and
    // decoded-pixel gates end to end): per doc, the audio asset
    // passes when at least half its 16-sample frames carry speech
    // energy (the mm_audio_vad decision, BIGINT-exact) and the image
    // asset survives EXACT perceptual-hash dedup (48-bit dHash
    // groups, min doc_id keeps — planted pairs collide by
    // construction); kept = both gates. Scale shape: both gates are
    // row-local decodes; the only shuffles are one fixed-width-key
    // groupBy (phash) and the id joins. The oracle replays the VAD
    // formula AND the phash formula analytically, then the same
    // group-min.
    "pipeline_media" -> { (s, dir) =>
      import s.implicits._
      val ids = Tables.documents(s, dir).select(col("doc_id"))
        .as[java.lang.Long]
      val audio = graft.operators.WavCodec.vadStats(
          graft.operators.WavCodec.synthWavs(ids), frame = 16,
          meanSqThr = 16384L * 16384L).toDF()
        .select(col("id").as("doc_id"),
          (col("nSpeech") * 2 >= col("nFrames")).as("audio_ok"))
      val sigs = graft.operators.PngCodec.pngPHash(
          graft.operators.PngCodec.synthPngs(ids)).toDF()
        .select(col("id").as("doc_id"), col("phash"))
      val keepers = sigs.groupBy(col("phash"))
        .agg(min(col("doc_id")).as("keep_id"))
      val image = sigs.join(keepers, Seq("phash"))
        .select(col("doc_id"),
          (col("doc_id") === col("keep_id")).as("image_keep"))
      audio.join(image, Seq("doc_id"))
        .select(col("doc_id"), col("audio_ok"), col("image_keep"),
          (col("audio_ok") && col("image_keep")).as("kept"))
        .orderBy(col("doc_id"))
    },

    // HTML MAIN-CONTENT extraction (VERDICT r12 #2): the boilerplate-
    // removal step between a fetched page and the langid/quality gates
    // — block-text-density heuristic over pages synthesized with real
    // boilerplate shapes (nav/related/footer link blocks, style+script
    // noise) around the document text as the single content block.
    // Entirely codegen'd regex/HOF Column work (functions.HtmlText),
    // row-local: the only shuffle is the presentation sort.
    "html_main_text" -> { (s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"), htmlPage.as("html"))
        .select(col("doc_id"),
          HtmlText.mainText(col("html")).as("main_text"),
          length(col("html")).cast("long").as("n_chars_raw"))
        .withColumn("n_chars_main", length(col("main_text")).cast("long"))
        .orderBy(col("doc_id"))
    },

    // The CRAWL capstone (round 12; upgraded round 13 to start from
    // RESPONSE records — real crawls begin at fetched HTML, not WET
    // conversions): HTTP responses carrying synthesized HTML pages,
    // framed as WARC response records and parsed by the REAL
    // sources.Warc record splitter (Content-Length framed); the HTTP
    // message head is stripped at the first blank line, the page goes
    // through HtmlText.mainText boilerplate removal, and the EXTRACTED
    // text through the language-ID and quality gates, exact dedup
    // among survivors (skew-proof groupBy-min, never a text-keyed
    // window), and a per-predicted-language funnel census. The oracle
    // replays extraction + gates + dedup from the synthesized page
    // (the WARC round-trip's byte fidelity is ingest_warc's md5-proven
    // contract).
    // The crawl-FRONTIER capstone: sitemap discovery → URL
    // canonicalization dedup → robots politeness gate → per-source
    // funnel census (discovered → canonical → allowed/blocked).
    // Composes the verified pieces through their REAL interchange
    // shapes: the URLs come OUT of the assembled sitemap XML (regex
    // parse, never the synthesis inputs), dedup keys on
    // UrlFns.canonicalize (scheme/host case, default ports, utm
    // params all planted), and the robots verdict is the
    // longest-match struct argmax over broadcast per-host rules (the
    // RFC 9309 tie-break, Allow at equal length). Scale shape: one
    // groupBy(source) assembles sitemaps, the parse fans back out
    // row-locally, rules ride broadcast, and the two census aggs are
    // the only other shuffles.
    "pipeline_frontier" -> { (s, dir) =>
      val k = col("doc_id")
      val scheme = when(k % 2 === 0, lit("http")).otherwise(lit("HTTPS"))
      val host = concat(col("source"),
        when(k % 4 < 2, lit(".Example.COM")).otherwise(lit(".example.com")))
      val port = when(k % 3 === 0,
          when(k % 2 === 0, lit(":80")).otherwise(lit(":443")))
        .otherwise(lit(""))
      val path = concat(lit("/docs/"), (k % 7).cast("string"),
        when(k % 5 === 0, lit("/priv")).otherwise(lit("")),
        when(k % 3 === 0, lit("/x.html")).otherwise(lit("")))
      val query = when(k % 2 === 0,
          concat(lit("?utm_source=feed&id="), (k % 5).cast("string")))
        .otherwise(concat(lit("?id="), (k % 5).cast("string")))
      val loc = concat(scheme, lit("://"), host, port, path, query)
      val urls = Tables.documents(s, dir)
        .select(col("source"),
          concat(lit("<url><loc>"), loc, lit("</loc></url>")).as("e"))
        .groupBy(col("source"))
        .agg(array_join(sort_array(collect_list(col("e"))), "").as("xml"))
        .select(col("source"), explode(regexp_extract_all(col("xml"),
          lit("<loc>([^<]*)</loc>"), lit(1))).as("url"))
      val dedup = urls
        .select(col("source"),
          graft.functions.UrlFns.canonicalize(col("url")).as("canon"))
        .groupBy(col("source"), col("canon"))
        .agg(count(lit(1)).as("n_variants"))
      val hosts = Tables.documents(s, dir).select(col("source")).distinct()
      val rules = hosts.select(col("source"), explode(array(
          struct(lit("disallow").as("verdict"), lit("/docs/3").as("rp")),
          struct(lit("allow").as("verdict"), lit("/docs/3/x.html").as("rp")),
          struct(lit("disallow").as("verdict"), lit("/docs/5/priv").as("rp"))))
          .as("r"))
        .select(col("source").as("rsource"), col("r.verdict").as("verdict"),
          col("r.rp").as("rp"))
        .unionByName(hosts
          .filter(conv(substring(md5(col("source")), 32, 1), 16, 10)
            .cast("int") % 4 === 0)
          .select(col("source").as("rsource"),
            lit("disallow").as("verdict"), lit("/").as("rp")))
      val cpath = regexp_extract(col("canon"), "^[a-z]+://[^/]+(/[^?#]*)", 1)
      dedup.withColumn("cpath", cpath)
        .join(broadcast(rules),
          col("source") === col("rsource") &&
            col("cpath").startsWith(col("rp")), "left")
        .groupBy(col("source"), col("canon"), col("n_variants"))
        .agg(max(when(col("rp").isNotNull,
          struct(length(col("rp")).as("l"),
            (col("verdict") === "allow").cast("int").as("a")))).as("best"))
        .groupBy(col("source"))
        .agg(sum(col("n_variants")).as("n_discovered"),
          count(lit(1)).as("n_canonical"),
          sum((col("best").isNull || col("best.a") === 1).cast("long"))
            .as("n_allowed"),
          sum((col("best").isNotNull && col("best.a") === 0).cast("long"))
            .as("n_blocked"))
        .orderBy(col("source"))
    },

    "pipeline_crawl" -> { (s, dir) =>
      import graft.functions.TextAnalysis
      val crlf = "\r\n"
      val http = concat(
        lit("HTTP/1.1 200 OK" + crlf + "Content-Type: text/html" +
          crlf + crlf),
        htmlPage)
      val blob = concat(
        lit("WARC/1.0" + crlf + "WARC-Type: response" + crlf +
          "WARC-Record-ID: <urn:graft:"),
        col("doc_id").cast("string"),
        lit(">" + crlf + "WARC-Date: 2024-01-01T00:00:00Z" + crlf +
          "Content-Type: application/http;msgtype=response" + crlf +
          "Content-Length: "),
        length(http.cast("binary")).cast("string"),
        lit(crlf + crlf), http, lit(crlf + crlf)).cast("binary")
      val recs = graft.sources.Warc.explodeBlobs(
        Tables.documents(s, dir).select(col("doc_id"), blob.as("warc")),
        "doc_id", "warc")
      // HTTP head ends at the first blank line (anchored lazy match —
      // replaces once in both engines); the body is the HTML page
      val body = regexp_replace(col("payload").cast("string"),
        "(?s)^.*?\r\n\r\n", "")
      // the scored frame fans out (winners + the funnel census) —
      // cut it so the build+parse+extract chain evaluates ONCE
      // (Materialize discipline: a frame referenced twice re-runs its
      // subtree)
      val scored = graft.operators.Materialize.cut(
        recs.filter(col("warc_type") === "response")
          .select(col("doc_id"), HtmlText.mainText(body).as("text"))
          .select(col("doc_id"), col("text"),
            // langIdHof: mainText's HOFs already force this projection
            // out of WholeStageCodegen — let-bound scores are the
            // cheaper form under interpreted eval (no CSE there)
            TextAnalysis.langIdHof(col("text")).as("lang_pred"),
            (TextAnalysis.qualityScore(col("text")) >= 0.5).cast("int")
              .as("q_pass")))
      val winners = scored.filter(col("q_pass") === 1)
        .groupBy(md5(col("text")).as("h"))
        .agg(min(col("doc_id")).as("doc_id"))
        .select(col("doc_id"), lit(1).as("keeper"))
      scored.join(winners, Seq("doc_id"), "left")
        .groupBy(col("lang_pred"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("q_pass").cast("long")).as("n_quality_pass"),
          sum(coalesce(col("keeper"), lit(0)).cast("long")).as("n_kept"),
          sum(when(coalesce(col("keeper"), lit(0)) === 1,
            length(col("text")).cast("long")).otherwise(0L)).as("chars_kept"))
        .orderBy(col("lang_pred"))
    })

  // -------------------------------------------------------------- oracles

  /** Expected-value CTEs: the synthetic company groups reduce to known
    * cores (registry core = p_name), so the oracle states the cascade's
    * expected inputs directly and re-runs the join/precedence/melt
    * logic — independent derivation rather than regex replay. */
  /** Expected exact-path strategies, derived from the searchTerms
    * order on each synthetic spelling (see the group comments):
    * partnership rows surface on variant 1 (the prefix-stripped base
    * equals p_name, always contained in the registry name); filler
    * rows on variant 3 (base and core keep the parenthetical; the
    * filler-cleaned core is the first contained variant); single-word
    * first-word rows on variant 1. The nonexistent group never
    * exact-matches, so its xstrat is never read. */
  private val cascadeCtes =
    """reg0 AS (
      |  SELECT p_name, '0' || lpad(CAST(min(p_partkey) AS VARCHAR), 12, '0') AS rid
      |  FROM part GROUP BY p_name),
      |existing AS (
      |  SELECT 'บริษัท ' || p_name || ' จำกัด' AS name, rid AS matched_id,
      |    'existing' AS match_type, '' AS search_strategy,
      |    0 AS prio, CAST(NULL AS DOUBLE) AS j
      |  FROM reg0),
      |unmatched AS (
      |  SELECT 'ห้างหุ้นส่วนจำกัด ' || p_name AS name, p_name AS core,
      |    '1' AS xstrat FROM reg0
      |  UNION ALL
      |  SELECT 'บริษัท ' || p_name || ' (ประเทศไทย) จำกัด', p_name, '3' FROM reg0
      |  UNION ALL
      |  SELECT DISTINCT 'บริษัท ' || split_part(p_name, ' ', 1) || ' จำกัด',
      |    split_part(p_name, ' ', 1), '1' FROM reg0
      |  UNION ALL
      |  SELECT 'บริษัท ไม่มีจริง' || rid || ' จำกัด', 'ไม่มีจริง' || rid, NULL
      |  FROM reg0),
      |exact AS (
      |  SELECT u.name, r.rid AS matched_id, 'exact' AS match_type,
      |    u.xstrat AS search_strategy, 1 AS prio, CAST(NULL AS DOUBLE) AS j
      |  FROM unmatched u JOIN reg0 r ON u.core = r.p_name),
      |utok AS (
      |  SELECT name, len(list_distinct(string_split(core, ' '))) AS n,
      |    unnest(list_distinct(string_split(core, ' '))) AS tok
      |  FROM unmatched),
      |rtok AS (
      |  SELECT rid, len(list_distinct(string_split(p_name, ' '))) AS n,
      |    unnest(list_distinct(string_split(p_name, ' '))) AS tok
      |  FROM reg0),
      |fuzzy AS (
      |  SELECT a.name, b.rid AS matched_id,
      |    'similarity_' || CAST(round(count(*)
      |      / (any_value(a.n) + any_value(b.n) - count(*)) * 100, 0) AS INT) ||
      |      '%' AS match_type,
      |    'fallback' AS search_strategy,
      |    2 AS prio,
      |    count(*) / (any_value(a.n) + any_value(b.n) - count(*)) AS j
      |  FROM utok a JOIN rtok b ON a.tok = b.tok
      |  GROUP BY a.name, b.rid
      |  HAVING count(*) / (any_value(a.n) + any_value(b.n) - count(*)) >= 0.3),
      |matched AS (
      |  SELECT name, matched_id, match_type, search_strategy FROM (
      |    SELECT *, row_number() OVER (PARTITION BY name
      |      ORDER BY prio, j DESC NULLS LAST, matched_id) AS rk
      |    FROM (SELECT * FROM existing UNION ALL
      |          SELECT * FROM exact UNION ALL
      |          SELECT * FROM fuzzy))
      |  WHERE rk = 1)""".stripMargin

  /** Curation-capstone CTE chain: planted lang-carrying corpus →
    * exact-survivor relation → the shared minhash/components chain
    * ([[Corpus.componentCtesFrom]]) → annotated flags, mirroring
    * [[graft.pipeline.CorpusCurationPipeline.run]] stage for stage.
    * Needs WITH RECURSIVE (component closure). */
  private val curationCtes: String = {
    val rate = mixWeights.toSeq.sortBy(_._1)
      .map { case (l, r) => s"WHEN lang = '$l' THEN $r" }
      .mkString("CASE ", " ", " ELSE 10000 END")
    s"""corpusl AS (
       |  SELECT doc_id AS id, lang, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 1000000, lang, text FROM documents WHERE doc_id % 25 = 0
       |  UNION ALL
       |  SELECT doc_id + 2000000, lang, regexp_replace(text, '^\\S+\\s+', '')
       |  FROM documents WHERE doc_id % 50 = 0),
       |exk AS (SELECT md5(text) AS h, min(id) AS mid FROM corpusl GROUP BY 1),
       |ex AS (
       |  SELECT c.id, c.text FROM corpusl c
       |  JOIN exk ON md5(c.text) = exk.h AND c.id = exk.mid),
       |${Corpus.componentCtesFrom("ex", curThreshold)},
       |annt AS (
       |  SELECT id, lang, text, ${Curation.toksSql} AS tk,
       |    (id = min(id) OVER (PARTITION BY md5(text))) AS ke
       |  FROM corpusl),
       |ann AS (
       |  SELECT id, lang, ke,
       |    (id NOT IN (SELECT node FROM comp WHERE node <> component)) AS kn,
       |    CAST(len(tk) AS INT) AS n_tok,
       |    COALESCE(
       |      len(tk) BETWEEN 30 AND 10000
       |      AND (CASE WHEN len(tk) > 0 THEN
       |            CAST(length(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE)
       |              / len(tk) END) BETWEEN 3.0 AND 10.0
       |      AND (CASE WHEN len(tk) > 0 THEN
       |            CAST(len(list_distinct(tk)) AS DOUBLE) / len(tk) END) >= 0.35
       |      AND (list_contains(tk, 'the') OR list_contains(tk, 'a')),
       |      false) AS pq,
       |    (${Curation.slotSql("id")} < $rate) AS km
       |  FROM annt)""".stripMargin
  }

  /** One report branch per stage, cumulative flag conjunction. */
  private val curationReportSql: String = {
    val conds = Seq("true", "ke", "ke AND kn", "ke AND kn AND pq",
      "ke AND kn AND pq AND km")
    val branches = CorpusCurationPipeline.stages.zip(conds).zipWithIndex.map {
      case ((stage, cond), i) =>
        val ord = if (i == 0) "CAST(0 AS INT) AS stage_ord" else s"$i"
        val as = (a: String) => if (i == 0) s" AS $a" else ""
        s"""SELECT $ord, '$stage'${as("stage")},
           |    CAST(count(*) AS BIGINT)${as("n_docs")},
           |    COALESCE(CAST(sum(n_tok) AS BIGINT), 0)${as("n_tokens")}
           |  FROM ann WHERE $cond""".stripMargin
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH RECURSIVE $curationCtes
       |SELECT * FROM (
       |  $branches)
       |ORDER BY stage_ord""".stripMargin
  }

  /** Shared CTE chain of the HTML pair: page synthesis (the htmlPage
    * twin — `||` kept at end-of-line, the nested-stripMargin rule) →
    * block split → per-block (text, anchor-chars) structs → density
    * filter → joined main text. Final tables: `pages(doc_id, html)`,
    * `hmain(doc_id, main_text)`. */
  private val htmlExtractCtes =
    """pages AS (
      |  SELECT doc_id,
      |    '<html><head><title>doc ' || CAST(doc_id AS VARCHAR) ||
      |    '</title><style>body { color: #222; }</style>' ||
      |    '<script>var tracker = ''x'';</script></head><body>' ||
      |    '<nav><a href="/">home</a> <a href="/tags">tags</a> ' ||
      |    '<a href="/about">about</a></nav>' ||
      |    '<div class="content">' || text || '</div>' ||
      |    '<div class="related"><a href="/r/1">related one</a> ' ||
      |    '<a href="/r/2">related two</a> <a href="/r/3">related three</a></div>' ||
      |    '<footer><a href="/terms">terms</a> <a href="/privacy">privacy</a> ' ||
      |    '<a href="/contact">contact</a> (c) example</footer></body></html>'
      |    AS html
      |  FROM documents),
      |hblocks AS (
      |  SELECT doc_id, html,
      |    list_filter(
      |      list_transform(
      |        string_split_regex(
      |          regexp_replace(regexp_replace(html,
      |            '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
      |            '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
      |          '(?i)</?(?:div|p|h[1-6]|li|ul|ol|table|tr|td|th|nav|header|footer|article|section|main|aside)(?:[^>]*)>|<br */?>'),
      |        b -> struct_pack(
      |          t := trim(regexp_replace(regexp_replace(b, '<[^>]+>', ' ', 'g'),
      |            '\s+', ' ', 'g')),
      |          lc := coalesce(list_aggregate(list_transform(
      |            regexp_extract_all(b, '(?is)<a[^>]*>(.*?)</a>', 1),
      |            a -> length(trim(regexp_replace(a, '\s+', ' ', 'g')))),
      |            'sum'), 0))),
      |      s -> length(s.t) >= 25 AND s.lc * 2 <= length(s.t)) AS kept
      |  FROM pages),
      |hmain AS (
      |  SELECT doc_id, html,
      |    trim(regexp_replace(array_to_string(
      |      list_transform(kept, s -> s.t), ' '), '\s+', ' ', 'g'))
      |      AS main_text
      |  FROM hblocks)""".stripMargin

  def oracle: Map[String, String] = Map(
    // the two media gates replayed analytically: mm_audio_vad's
    // BIGINT-exact speech decision and the synthPngs phash formula,
    // then the same exact-hash group-min the Spark side runs
    "pipeline_media" -> {
      val gExprs = for (r <- 0 to 5; c <- 0 to 8) yield {
        val x = 2 * c; val y = 2 * r
        val p = 2 * (x % 16) + 1
        val h = s"md5(CAST(doc_id // 2 AS VARCHAR) || '-$y')"
        def nib(pos: Int) =
          s"(strpos('0123456789abcdef', substr($h, $pos, 1)) - 1)"
        s"((16 * ${nib(p)} + ${nib(p + 1)}) % 200 + (doc_id % 2))"
      }
      val bits = (47 to 0 by -1).map { kk =>
        val r = kk >> 3; val c = kk & 7
        val i1 = r * 9 + c + 1
        s"(CASE WHEN g[$i1] > g[${i1 + 1}] THEN ${1L << kk} ELSE 0 END)"
      }.mkString(" + ")
      s"""WITH j AS (
         |  SELECT doc_id,
         |    unnest(generate_series(0, CAST(doc_id % 48 + 15 AS INT))) AS j
         |  FROM documents),
         |b AS (
         |  SELECT doc_id, j,
         |    md5(CAST(doc_id AS VARCHAR) || '-' || CAST(j // 16 AS VARCHAR))
         |      AS d
         |  FROM j),
         |s AS (
         |  SELECT doc_id, j,
         |    ((strpos('0123456789abcdef', substr(d, 2 * (j % 16) + 1, 1))
         |        - 1) * 16
         |      + strpos('0123456789abcdef', substr(d, 2 * (j % 16) + 2, 1))
         |        - 1 - 128) * 256 AS v
         |  FROM b),
         |fr AS (
         |  SELECT doc_id, j // 16 AS k, sum(CAST(v AS BIGINT) * v) AS ss,
         |    count(*) AS c
         |  FROM s GROUP BY 1, 2),
         |agg AS (
         |  SELECT doc_id, count(*) AS n_frames,
         |    CAST(sum((ss >= 268435456 * c)::INT) AS BIGINT) AS n_speech
         |  FROM fr GROUP BY doc_id),
         |mm AS (
         |  SELECT doc_id, [${gExprs.mkString(", ")}] AS g FROM documents),
         |sigs AS (
         |  SELECT doc_id, CAST($bits AS BIGINT) AS phash FROM mm),
         |keep AS (
         |  SELECT phash, min(doc_id) AS keep_id FROM sigs GROUP BY phash)
         |SELECT a.doc_id,
         |  (a.n_speech * 2 >= a.n_frames) AS audio_ok,
         |  (sg.doc_id = k.keep_id) AS image_keep,
         |  ((a.n_speech * 2 >= a.n_frames) AND sg.doc_id = k.keep_id)
         |    AS kept
         |FROM agg a
         |JOIN sigs sg ON sg.doc_id = a.doc_id
         |JOIN keep k ON k.phash = sg.phash
         |ORDER BY a.doc_id""".stripMargin
    },

    "html_main_text" ->
      s"""WITH $htmlExtractCtes
         |SELECT doc_id, main_text,
         |  CAST(length(html) AS BIGINT) AS n_chars_raw,
         |  CAST(length(main_text) AS BIGINT) AS n_chars_main
         |FROM hmain ORDER BY doc_id""".stripMargin,
    "pipeline_curate" ->
      s"""WITH RECURSIVE $curationCtes,
         |cur AS (SELECT id, lang, n_tok FROM ann WHERE ke AND kn AND pq AND km),
         |packed AS (
         |  SELECT id, lang, n_tok,
         |    (sum(n_tok) OVER (PARTITION BY lang ORDER BY id
         |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok)
         |      // $curBudget AS bin
         |  FROM cur)
         |SELECT id, lang, n_tok, CAST(bin AS BIGINT) AS bin
         |FROM packed ORDER BY id""".stripMargin,

    "pipeline_curate_report" -> curationReportSql,

    // the analytic inverse of the whole frontier chain: the expected
    // CANONICAL url is stated directly (lowercased scheme/host,
    // default ports stripped, utm params dropped — the
    // url_canon_dedup contract; the sitemap XML round-trip in between
    // is what the Spark side proves), then dedup + the RFC 9309
    // longest-match argmax replay
    "pipeline_frontier" ->
      """WITH canon AS (
        |  SELECT source,
        |    (CASE WHEN doc_id % 2 = 0 THEN 'http' ELSE 'https' END)
        |      || '://' || lower(source) || '.example.com'
        |      || '/docs/' || CAST(doc_id % 7 AS VARCHAR)
        |      || (CASE WHEN doc_id % 5 = 0 THEN '/priv' ELSE '' END)
        |      || (CASE WHEN doc_id % 3 = 0 THEN '/x.html' ELSE '' END)
        |      || '?id=' || CAST(doc_id % 5 AS VARCHAR) AS canon,
        |    '/docs/' || CAST(doc_id % 7 AS VARCHAR)
        |      || (CASE WHEN doc_id % 5 = 0 THEN '/priv' ELSE '' END)
        |      || (CASE WHEN doc_id % 3 = 0 THEN '/x.html' ELSE '' END)
        |      AS cpath
        |  FROM documents),
        |dedup AS (
        |  SELECT source, canon, max(cpath) AS cpath, count(*) AS n_variants
        |  FROM canon GROUP BY source, canon),
        |hosts AS (SELECT DISTINCT source FROM documents),
        |rules AS (
        |  SELECT source, 'disallow' AS verdict, '/docs/3' AS rp FROM hosts
        |  UNION ALL
        |  SELECT source, 'allow', '/docs/3/x.html' FROM hosts
        |  UNION ALL
        |  SELECT source, 'disallow', '/docs/5/priv' FROM hosts
        |  UNION ALL
        |  SELECT source, 'disallow', '/'
        |  FROM hosts
        |  WHERE (strpos('0123456789abcdef', substr(md5(source), 32, 1)) - 1)
        |    % 4 = 0),
        |winner AS (
        |  SELECT d.source, d.canon, d.n_variants,
        |    max(CASE WHEN r.rp IS NOT NULL THEN struct_pack(
        |      l := length(r.rp),
        |      a := CASE WHEN r.verdict = 'allow' THEN 1 ELSE 0 END) END)
        |      AS best
        |  FROM dedup d LEFT JOIN rules r
        |    ON r.source = d.source AND starts_with(d.cpath, r.rp)
        |  GROUP BY d.source, d.canon, d.n_variants)
        |SELECT source, CAST(sum(n_variants) AS BIGINT) AS n_discovered,
        |  count(*) AS n_canonical,
        |  CAST(sum(CASE WHEN best IS NULL
        |    OR struct_extract(best, 'a') = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_allowed,
        |  CAST(sum(CASE WHEN best IS NOT NULL
        |    AND struct_extract(best, 'a') = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_blocked
        |FROM winner GROUP BY source ORDER BY source""".stripMargin,

    // extraction + gates + dedup replayed from the synthesized page
    // (WARC byte fidelity is ingest_warc's md5-proven contract; the
    // HTTP-head strip is a framing no-op on the page body); langid
    // CASE generated in marker order — the Spark tie-break (first
    // language reaching the max)
    "pipeline_crawl" -> {
      import graft.functions.TextAnalysis
      val scores = TextAnalysis.langMarkers.map { case (lang, m) =>
        s"len(regexp_extract_all(lower(text), '\\b(${m.mkString("|")})\\b')) AS s_$lang"
      }.mkString(",\n    ")
      val langs = TextAnalysis.langMarkers.map(_._1)
      val g = s"greatest(${langs.map("s_" + _).mkString(", ")})"
      val pred = langs.map(l => s"WHEN s_$l = $g THEN '$l'").mkString(" ")
      s"""WITH $htmlExtractCtes,
         |lscored AS (
         |  SELECT doc_id, text,
         |    $scores
         |  FROM (SELECT doc_id, main_text AS text FROM hmain)),
         |qstats AS (
         |  SELECT doc_id, text, CASE $pred END AS lang_pred,
         |    CAST(len([x for x in string_split(trim(regexp_replace(text,
         |      '\\s+', ' ', 'g')), ' ') if x <> '']) AS DOUBLE) AS n_words,
         |    CAST(length(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE) AS n_chars,
         |    CAST(len(regexp_extract_all(lower(text),
         |      '\\b(the|a|of|and|to|in)\\b')) AS DOUBLE) AS stop
         |  FROM lscored),
         |scored AS (
         |  SELECT doc_id, text, lang_pred,
         |    CASE WHEN round(
         |      least(CASE WHEN n_words > 0 THEN stop / n_words ELSE 0 END * 2, 1.0) * 0.4
         |        + least((CASE WHEN n_words > 0 THEN n_chars / n_words ELSE 0 END) / 8.0, 1.0) * 0.3
         |        + least(n_words / 100.0, 1.0) * 0.3, 4) >= 0.5
         |      THEN 1 ELSE 0 END AS q_pass
         |  FROM qstats),
         |winners AS (
         |  SELECT min(doc_id) AS doc_id FROM scored
         |  WHERE q_pass = 1 GROUP BY md5(text))
         |SELECT s.lang_pred, count(*) AS n_docs,
         |  CAST(sum(s.q_pass) AS BIGINT) AS n_quality_pass,
         |  CAST(sum(CASE WHEN w.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_kept,
         |  CAST(sum(CASE WHEN w.doc_id IS NOT NULL THEN length(s.text)
         |    ELSE 0 END) AS BIGINT) AS chars_kept
         |FROM scored s LEFT JOIN winners w ON w.doc_id = s.doc_id
         |GROUP BY s.lang_pred ORDER BY s.lang_pred""".stripMargin
    },

    "pipeline_records" ->
      s"""WITH $cascadeCtes,
         |fin AS (
         |  SELECT '0' || lpad(CAST(l_partkey AS VARCHAR), 12, '0') AS fid,
         |    CAST(year(l_shipdate) AS INT) AS year,
         |    sum(l_quantity) AS qty, sum(l_extendedprice) AS revenue
         |  FROM lineitem WHERE l_partkey % 10 <> 0 GROUP BY 1, 2),
         |joined AS (
         |  SELECT m.name, m.matched_id, m.match_type, m.search_strategy,
         |    f.year, f.qty, f.revenue
         |  FROM matched m JOIN fin f ON m.matched_id = f.fid),
         |recs AS (
         |  SELECT name, matched_id, match_type, search_strategy, year,
         |    'qty' AS field, qty AS value FROM joined
         |  UNION ALL
         |  SELECT name, matched_id, match_type, search_strategy, year,
         |    'revenue', revenue
         |  FROM joined)
         |SELECT name, matched_id, match_type, search_strategy, year, field,
         |  round(value, 2) AS value
         |FROM recs WHERE value IS NOT NULL
         |ORDER BY name, year, field""".stripMargin,

    "pipeline_notfound" ->
      s"""WITH $cascadeCtes,
         |allnames AS (
         |  SELECT name FROM existing UNION SELECT name FROM unmatched),
         |fin AS (
         |  SELECT DISTINCT '0' || lpad(CAST(l_partkey AS VARCHAR), 12, '0') AS fid
         |  FROM lineitem WHERE l_partkey % 10 <> 0)
         |SELECT a.name, '' AS matched_id, '' AS match_type,
         |  '' AS search_strategy, 'No search results' AS reason
         |FROM allnames a LEFT JOIN matched m ON a.name = m.name
         |WHERE m.name IS NULL
         |UNION ALL
         |SELECT m.name, m.matched_id, m.match_type, m.search_strategy,
         |  'No revenue data'
         |FROM matched m LEFT JOIN fin f ON m.matched_id = f.fid
         |WHERE f.fid IS NULL
         |UNION ALL
         |SELECT '$errLongName', '', '', '', 'Browser error'
         |UNION ALL
         |SELECT '$errEmptyCoreName', '', '', '',
         |  'Error: empty core name: ''$errEmptyCoreName'''
         |ORDER BY name""".stripMargin)
}
