package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.PRound
import graft.operators.Reshape

/** Blocks E + F — reshaping, cleaning, and side outputs
  * (SURVEY.md §2.E/§2.F).
  *
  * The reference's core output shape is the long-format fact record
  * `(entity, field, year, value)` (scraper_v2.py:1520-1532), produced
  * from wide tables; the not-found CSV is its anti-join side output
  * (scraper_v2.py:1404-1420).
  */
object ReshapeQ {

  private val years = 1995 to 2001

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // scraper_v2.py:1205-1230 — wide year-columned table → long
    // (field, value) records.
    "reshape_unpivot" -> { (s, dir) =>
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax"))
      Reshape.melt(li, Seq("l_orderkey", "l_linenumber"),
          Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
        .select(col("l_orderkey"), col("l_linenumber"), col("field"),
          PRound.pround(col("value"), 2).as("value"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("field"))
    },

    // README.md:188-239 — the inverse: long facts → wide per-year
    // columns. Explicit pivot domain → pure conditional aggregation.
    "reshape_pivot" -> { (s, dir) =>
      val o = Tables.orders(s, dir)
        .select(col("o_custkey"), year(col("o_orderdate")).as("y"), col("o_totalprice"))
      val wide = Reshape.pivotOn(o, Seq("o_custkey"), "y", years,
        c => PRound.pround(coalesce(sum(c), lit(0.0)), 2), "o_totalprice", "y")
      wide.orderBy(col("o_custkey"))
    },

    // scraper_v2.py:1217-1228 — numeric parsing with placeholder
    // skipping. Dirty strings are synthesized deterministically from
    // order columns, then cleaned back.
    "clean_numeric" -> { (s, dir) =>
      val dirty = when(col("o_orderstatus") === "P", lit("-"))
        .otherwise(concat(lit("$"), col("o_totalprice").cast("string")))
      Tables.orders(s, dir)
        .select(col("o_orderkey"), dirty.as("raw"))
        .select(col("o_orderkey"), col("raw"),
          PRound.pround(Reshape.cleanNumeric(col("raw")), 2).as("parsed"))
        .orderBy(col("o_orderkey"))
    },

    // Semi-structured props extraction (the reference's config-driven
    // field maps applied to JSON instead of DOM tables).
    "json_extract" -> { (s, dir) =>
      Tables.events(s, dir)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
          PRound.pround(avg(col("k")), 4).as("avg_k"))
        .orderBy(col("event_type"))
    },

    // scraper_v2.py:1136-1230 — DOM-table extraction: synthesize the
    // financial-table HTML the reference scrapes, then parse it back
    // with the distributed HTML extractor (sources.HtmlTable).
    "scrape_html_table" -> { (s, dir) =>
      val html = concat(
        lit("<table><tr><th>field</th><th>value</th></tr>"),
        lit("<tr><td>brand</td><td>"), col("p_brand"), lit("</td></tr>"),
        lit("<tr><td>price</td><td>$"), col("p_retailprice").cast("string"),
        lit("</td></tr></table>"))
      val pages = Tables.part(s, dir).select(col("p_partkey"), html.as("html"))
      graft.sources.HtmlTable.extractRows(pages, "html")
        .filter(col("row_idx") > 0) // drop the header row
        .select(col("p_partkey"), col("row_idx"),
          col("cells").getItem(0).as("field"),
          col("cells").getItem(1).as("raw_value"),
          PRound.pround(Reshape.cleanNumeric(col("cells").getItem(1)), 2).as("num_value"))
        .orderBy(col("p_partkey"), col("row_idx"))
    },

    // The reference's link-scraping step (result rows carry hrefs into
    // pagination, scraper_v2.py:885-966) as distributed multi-value
    // regex extraction — every href per page, in document order.
    "scrape_links" -> { (s, dir) =>
      val html = concat(
        lit("<div><a href=\"/company/"), col("o_orderkey").cast("string"), lit("\">c</a>"),
        when(col("o_orderstatus") === "F",
          concat(lit("<a href='/archive/"), col("o_custkey").cast("string"), lit("'>a</a>")))
          .otherwise(lit("")),
        lit("</div>"))
      Tables.orders(s, dir)
        .select(col("o_orderkey"), html.as("html"))
        .select(col("o_orderkey"),
          posexplode(regexp_extract_all(col("html"),
            lit("href=[\"']([^\"']+)[\"']"), lit(1))).as(Seq("pos", "href")))
        .select(col("o_orderkey"), (col("pos") + 1).as("link_idx"), col("href"))
        .orderBy(col("o_orderkey"), col("link_idx"))
    },

    // XML sitemap ingestion — the crawl-frontier companion to
    // crawl_robots_filter (sitemaps are how a crawler DISCOVERS the
    // frontier robots.txt then filters): one sitemap per source is
    // assembled from that source's docs (sorted-entry concat, so the
    // aggregation is deterministic), then parsed BACK with the
    // scrape_links regex discipline — <loc>, optional <lastmod>,
    // optional <priority> extracted per entry; every output column
    // comes from the EXTRACTED lists, never the synthesis inputs.
    // Scale shape: one groupBy(source) assembles, everything after is
    // row-local HOF work on the |sources|-row frame.
    "sitemap_extract" -> { (s, dir) =>
      val k = col("doc_id")
      val lastmod = concat(lit("<lastmod>2020-"),
        lpad((k % 12 + 1).cast("string"), 2, "0"), lit("-"),
        lpad((k % 28 + 1).cast("string"), 2, "0"), lit("</lastmod>"))
      val entry = concat(lit("<url><loc>https://"), col("source"),
        lit(".example.com/docs/"), (k % 7).cast("string"), lit("</loc>"),
        when(k % 3 === 0, lastmod).otherwise(lit("")),
        when(k % 2 === 0, concat(lit("<priority>0."),
          (k % 9 + 1).cast("string"), lit("</priority>")))
          .otherwise(lit("")),
        lit("</url>"))
      Tables.documents(s, dir)
        .select(col("source"), entry.as("e"))
        .groupBy(col("source"))
        .agg(concat(lit("<?xml version=\"1.0\"?><urlset>"),
          array_join(sort_array(collect_list(col("e"))), ""),
          lit("</urlset>")).as("xml"))
        .select(col("source"),
          regexp_extract_all(col("xml"),
            lit("<loc>([^<]*)</loc>"), lit(1)).as("locs"),
          regexp_extract_all(col("xml"),
            lit("<lastmod>([^<]*)</lastmod>"), lit(1)).as("lms"),
          regexp_extract_all(col("xml"),
            lit("<priority>([^<]*)</priority>"), lit(1)).as("prs"))
        .select(col("source"),
          size(col("locs")).cast("long").as("n_urls"),
          size(array_distinct(col("locs"))).cast("long").as("n_distinct_urls"),
          size(col("lms")).cast("long").as("n_lastmod"),
          array_max(col("lms")).as("max_lastmod"),
          size(col("prs")).cast("long").as("n_priority"),
          array_min(col("locs")).as("first_url"))
        .orderBy(col("source"))
    },

    // scraper_v2.py:1404-1420 — the not-found side output as a
    // left-anti join. The "found" set is the most recent order year
    // only, so the side output is non-empty (mirroring the reference,
    // whose not-found CSV routinely has rows): customers who placed no
    // order in 1998 land here.
    "notfound_anti" -> { (s, dir) =>
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir)
        .filter(year(col("o_orderdate")) === 1998)
        .select(col("o_custkey"))
      c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))
    },

    // scraper_v2.py:1520-1532 — assembled long-format fact records:
    // per (entity, year), measures melted into (field, value) rows.
    "records_long" -> { (s, dir) =>
      val perYear = Tables.orders(s, dir)
        .groupBy(col("o_custkey"), year(col("o_orderdate")).as("y"))
        .agg(PRound.pround(sum(col("o_totalprice")), 2).as("total_revenue"),
          count(lit(1)).cast("double").as("order_count"))
      Reshape.melt(perYear, Seq("o_custkey", "y"),
          Seq("total_revenue", "order_count"))
        .orderBy(col("o_custkey"), col("y"), col("field"))
    })

  def oracle: Map[String, String] = Map(
    "reshape_unpivot" ->
      """SELECT l_orderkey, l_linenumber, field, round(value, 2) AS value
        |FROM (
        |  SELECT l_orderkey, l_linenumber, 'l_quantity' AS field,
        |         l_quantity AS value FROM lineitem
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
        |  FROM lineitem
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
        |  FROM lineitem
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem)
        |ORDER BY l_orderkey, l_linenumber, field""".stripMargin,

    "reshape_pivot" -> {
      val cols = years.map(y =>
        s"round(coalesce(sum(CASE WHEN year(o_orderdate) = $y THEN o_totalprice END), 0), 2) AS y$y")
        .mkString(",\n  ")
      s"""SELECT o_custkey,
         |  $cols
         |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin
    },

    "clean_numeric" ->
      """WITH raws AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderstatus = 'P' THEN '-'
        |         ELSE '$' || CAST(o_totalprice AS VARCHAR) END AS raw
        |  FROM orders)
        |SELECT o_orderkey, raw,
        |  CASE WHEN trim(raw) IN ('-', '', '0.00') THEN NULL
        |       ELSE round(TRY_CAST(regexp_replace(trim(raw), '[$,]', '', 'g')
        |                       AS DOUBLE), 2) END AS parsed
        |FROM raws ORDER BY o_orderkey""".stripMargin,

    "json_extract" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
        |  round(avg(CAST(json_extract_string(props, '$.k') AS INT)), 4) AS avg_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "scrape_html_table" ->
      """WITH pages AS (
        |  SELECT p_partkey,
        |    '<table><tr><th>field</th><th>value</th></tr>'
        |    || '<tr><td>brand</td><td>' || p_brand || '</td></tr>'
        |    || '<tr><td>price</td><td>$' || CAST(p_retailprice AS VARCHAR)
        |    || '</td></tr></table>' AS html
        |  FROM part),
        |rows_ AS (
        |  SELECT p_partkey,
        |    unnest(regexp_extract_all(html, '(?si)<tr[^>]*>(.*?)</tr>', 1)) AS r,
        |    generate_subscripts(regexp_extract_all(html,
        |      '(?si)<tr[^>]*>(.*?)</tr>', 1), 1) - 1 AS row_idx
        |  FROM pages),
        |cellified AS (
        |  SELECT p_partkey, row_idx,
        |    [trim(regexp_replace(x, '<[^>]*>', '', 'g')) for x in
        |     regexp_extract_all(r, '(?si)<t[dh][^>]*>(.*?)</t[dh]>', 1)] AS cells
        |  FROM rows_ WHERE row_idx > 0)
        |SELECT p_partkey, CAST(row_idx AS INT) AS row_idx,
        |  cells[1] AS field, cells[2] AS raw_value,
        |  CASE WHEN trim(cells[2]) IN ('-', '', '0.00') THEN NULL
        |       ELSE round(TRY_CAST(regexp_replace(trim(cells[2]), '[$,]', '', 'g')
        |                       AS DOUBLE), 2) END AS num_value
        |FROM cellified ORDER BY p_partkey, row_idx""".stripMargin,

    "scrape_links" ->
      """WITH pages AS (
        |  SELECT o_orderkey,
        |    '<div><a href="/company/' || o_orderkey || '">c</a>'
        |    || CASE WHEN o_orderstatus = 'F'
        |            THEN '<a href=''/archive/' || o_custkey || '''>a</a>'
        |            ELSE '' END
        |    || '</div>' AS html
        |  FROM orders)
        |SELECT o_orderkey,
        |  CAST(generate_subscripts(regexp_extract_all(html,
        |    'href=["'']([^"'']+)["'']', 1), 1) AS INT) AS link_idx,
        |  unnest(regexp_extract_all(html,
        |    'href=["'']([^"'']+)["'']', 1)) AS href
        |FROM pages ORDER BY o_orderkey, link_idx""".stripMargin,

    "sitemap_extract" ->
      """WITH e AS (
        |  SELECT source,
        |    '<url><loc>https://' || source || '.example.com/docs/' ||
        |    CAST(doc_id % 7 AS VARCHAR) || '</loc>' ||
        |    (CASE WHEN doc_id % 3 = 0 THEN '<lastmod>2020-' ||
        |      lpad(CAST(doc_id % 12 + 1 AS VARCHAR), 2, '0') || '-' ||
        |      lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0') || '</lastmod>'
        |     ELSE '' END) ||
        |    (CASE WHEN doc_id % 2 = 0 THEN '<priority>0.' ||
        |      CAST(doc_id % 9 + 1 AS VARCHAR) || '</priority>'
        |     ELSE '' END) ||
        |    '</url>' AS e
        |  FROM documents),
        |xml AS (
        |  SELECT source, '<?xml version="1.0"?><urlset>' ||
        |    string_agg(e, '' ORDER BY e) || '</urlset>' AS xml
        |  FROM e GROUP BY source),
        |x AS (
        |  SELECT source,
        |    regexp_extract_all(xml, '<loc>([^<]*)</loc>', 1) AS locs,
        |    regexp_extract_all(xml, '<lastmod>([^<]*)</lastmod>', 1) AS lms,
        |    regexp_extract_all(xml, '<priority>([^<]*)</priority>', 1) AS prs
        |  FROM xml)
        |SELECT source, CAST(len(locs) AS BIGINT) AS n_urls,
        |  CAST(len(list_distinct(locs)) AS BIGINT) AS n_distinct_urls,
        |  CAST(len(lms) AS BIGINT) AS n_lastmod,
        |  list_aggregate(lms, 'max') AS max_lastmod,
        |  CAST(len(prs) AS BIGINT) AS n_priority,
        |  list_aggregate(locs, 'min') AS first_url
        |FROM x ORDER BY source""".stripMargin,

    "notfound_anti" ->
      """SELECT c_custkey, c_name, c_mktsegment
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND year(o_orderdate) = 1998)
        |ORDER BY c_custkey""".stripMargin,

    "records_long" ->
      """WITH per_year AS (
        |  SELECT o_custkey, year(o_orderdate) AS y,
        |    round(sum(o_totalprice), 2) AS total_revenue,
        |    CAST(count(*) AS DOUBLE) AS order_count
        |  FROM orders GROUP BY 1, 2)
        |SELECT o_custkey, y, field, value FROM (
        |  SELECT o_custkey, y, 'total_revenue' AS field,
        |         total_revenue AS value FROM per_year
        |  UNION ALL
        |  SELECT o_custkey, y, 'order_count', order_count FROM per_year)
        |ORDER BY o_custkey, y, field""".stripMargin)
}
