package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextNorm

/** Block A — ingestion & validation (SURVEY.md §2.A).
  *
  * Re-expresses the reference's input pipeline
  * (scraper_v2.py:458-577): entity filtering, id validation, and
  * dedup-with-preference (keep the record carrying the strongest
  * evidence — there, a reg number; here, the latest timestamp) as
  * single-shuffle groupBy/max_by aggregations.
  */
object Ingest {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // scraper_v2.py:507-520 — `if company_name not in companies or
    // reg_number:` → one record per key, preferring the most recent
    // evidence. max_by is a single map-side-combinable aggregate: one
    // shuffle keyed on user_id, no window, no self-join.
    "ingest_dedup_pref" -> { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("user_id"))
        .agg(
          max_by(col("event_id"), col("ts")).as("last_event_id"),
          max_by(col("event_type"), col("ts")).as("last_event_type"),
          count(lit(1)).as("n_records"))
        .orderBy(col("user_id"))
    },

    // scraper_v2.py:513 — reg-number format gate `^0\d{12}$`,
    // generalized to the test entities' name format.
    "ingest_validate" -> { (s, dir) =>
      Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_name"),
          TextNorm.isValidId(col("c_name"), "^Customer#[0-9]{9}$").as("valid"))
        .orderBy(col("c_custkey"))
    },

    // scraper_v2.py:517 — substring entity filter (the Thai-entity
    // predicate analog). Predicate is pushed into the parquet scan.
    "ingest_filter_entity" -> { (s, dir) =>
      Tables.customer(s, dir)
        .filter(col("c_mktsegment").isin("FURNITURE", "BUILDING") &&
          col("c_name").contains("Customer"))
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))
    },

    // The validation gate as a SUITE: ingest_validate checks one
    // format rule row-by-row; this runs the whole load-admission
    // checklist (nulls, key uniqueness, value range, enum membership,
    // freshness) in ONE scan of the batch — operators.Expectations
    // compiles every check into the same agg, so ten checks cost the
    // same pass as one. The range and freshness bounds are set tight
    // enough to FAIL (violations > 0) so both report branches are
    // exercised; the other three pass.
    // The SPLIT half of the load gate: quality_expectations counts,
    // this ROUTES — each offending row lands in quarantine with the
    // first failing check's name (the operational bad-record path:
    // admitted rows flow on, quarantined rows get triaged by reason).
    // One map-side projection over the same scan; reason precedence
    // is the suite order, identical in both engines' CASE chains.
    "ingest_quarantine" -> { (s, dir) =>
      import graft.operators.Expectations._
      val flagged = quarantine(Tables.orders(s, dir), Seq(
        inRangeRow("o_totalprice", lit(0.0), lit(200000.0)),
        inSetRow("o_orderstatus", Seq("O", "F", "P")),
        atMostRow("o_orderdate", lit("1997-12-31").cast("date"))))
      flagged.filter(col("reason").isNotNull)
        .select(col("o_orderkey"), col("o_orderstatus"),
          graft.functions.PRound.pround(col("o_totalprice"), 2)
            .as("o_totalprice"),
          col("o_orderdate"), col("reason"))
        .orderBy(col("o_orderkey"))
    },

    "quality_expectations" -> { (s, dir) =>
      import graft.operators.Expectations._
      report(Tables.orders(s, dir), Seq(
        notNull("o_custkey"),
        unique("o_orderkey"),
        inRange("o_totalprice", lit(0.0), lit(200000.0)),
        inSet("o_orderstatus", Seq("O", "F", "P")),
        atMost("o_orderdate", lit("1997-12-31").cast("date"))))
        .orderBy(col("check_name"))
    },

    // The CommonCrawl ingestion shape (VERDICT r11 #2): synthesize a
    // 3-record WARC archive per document (warcinfo + response + WET
    // conversion) with exact Content-Length framing — the response
    // payload embeds a literal "WARC/1.0" line, so any
    // delimiter-scanning splitter would shred it — then parse BACK
    // with the real sources.Warc record splitter and census the
    // records. Oracle = the analytic inverse over octet lengths +
    // md5 of the conversion payload (proves payload bytes round-trip
    // exactly). The gzip multi-member leg and the binaryFile path
    // read are WarcSpec's surface (non-SQL).
    "ingest_warc" -> { (s, dir) =>
      val crlf = "\r\n"
      def hdr(typ: String, serial: String, uri: Option[Column],
              ctype: String, payload: Column): Column = {
        val base = concat(
          lit("WARC/1.0" + crlf + "WARC-Type: " + typ + crlf +
            "WARC-Record-ID: <urn:graft:"),
          col("doc_id").cast("string"),
          lit("-" + serial + ">" + crlf +
            "WARC-Date: 2024-01-01T00:00:00Z" + crlf))
        val withUri = uri.map(u =>
          concat(base, lit("WARC-Target-URI: "), u, lit(crlf))).getOrElse(base)
        concat(withUri,
          lit("Content-Type: " + ctype + crlf + "Content-Length: "),
          length(payload.cast("binary")).cast("string"), lit(crlf + crlf),
          payload, lit(crlf + crlf))
      }
      val uri = concat(lit("http://example.com/doc/"),
        col("doc_id").cast("string"))
      val respPayload = concat(
        lit("HTTP/1.1 200 OK" + crlf + "Content-Type: text/html" +
          crlf + crlf + "<html>"),
        substring(col("text"), 1, 40),
        lit(crlf + "WARC/1.0 embedded trap" + crlf + "</html>"))
      val blob = concat(
        hdr("warcinfo", "0", None, "application/warc-fields",
          lit("software: graft" + crlf)),
        hdr("response", "1", Some(uri), "application/http", respPayload),
        hdr("conversion", "2", Some(uri), "text/plain", col("text"))
      ).cast("binary")
      val recs = graft.sources.Warc.explodeBlobs(
        Tables.documents(s, dir).select(col("doc_id"), blob.as("warc")),
        "doc_id", "warc")
      recs.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_records"),
          sum(col("content_length")).as("payload_bytes"),
          max(when(col("warc_type") === "response", col("target_uri")))
            .as("response_uri"),
          max(when(col("warc_type") === "conversion", col("content_length")))
            .as("conversion_bytes"),
          max(when(col("warc_type") === "conversion", md5(col("payload"))))
            .as("conv_md5"))
        .orderBy(col("doc_id"))
    },

    // Avro object-container ingest census (round 14, VERDICT r13 #6 —
    // the WARC style: synthesize REAL containers, parse back, census):
    // per doc 1 + doc_id%3 records through sources.Avro's zero-dep
    // encoder — multi-byte zigzag varints (n grows with doc_id), a
    // NEGATIVE long (z, the zigzag sign path), a nullable double in
    // BOTH union branch orders (["null",double] on even docs,
    // ["double","null"] on odd), a bytes payload, 2-row blocks so
    // multi-block sync framing is exercised, and ALL THREE codecs
    // cycling by doc_id % 3 (null / deflate / snappy — raw-block
    // snappy with the CRC32 trailer, VERDICT r14 #5). The decoder
    // round-trip is what the Spark side proves; the oracle is the
    // analytic inverse.
    "ingest_avro" -> { (s, dir) =>
      import s.implicits._
      val recs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .flatMap { case (docId, text) =>
          val m = (docId % 3 + 1).toInt
          val scoreType =
            if (docId % 2 == 0) """["null", "double"]"""
            else """["double", "null"]"""
          val schema =
            s"""{"type": "record", "name": "r", "fields": [
               |  {"name": "name", "type": "string"},
               |  {"name": "n", "type": "long"},
               |  {"name": "z", "type": "long"},
               |  {"name": "score", "type": $scoreType},
               |  {"name": "payload", "type": "bytes"}]}""".stripMargin
          val rows = (0 until m).map { j =>
            Array[Any](s"doc$docId-r$j", docId * 10 + j, -(docId + j),
              if (j % 2 == 0) (docId % 100) * 0.25 + j else null,
              (text.take(20) + "-" + j).getBytes("UTF-8"))
          }
          val codec = Array("null", "deflate", "snappy").apply((docId % 3).toInt)
          val blob = graft.sources.Avro.encodeWithCodec(schema, rows,
            codec, blockRows = 2)
          val (_, parsed) = graft.sources.Avro.parseContainer(blob)
          parsed.map(r => (docId, r(0).asInstanceOf[String],
            r(1).asInstanceOf[Long], r(2).asInstanceOf[Long],
            Option(r(3)).map(_.asInstanceOf[Double]),
            r(4).asInstanceOf[Array[Byte]]))
        }
        .toDF("doc_id", "name", "n", "z", "score", "payload")
      recs.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_records"),
          sum(col("n")).as("sum_n"),
          sum(col("z")).as("sum_z"),
          sum(col("score").isNull.cast("long")).as("n_null_score"),
          graft.functions.PRound.pround(
            sum(coalesce(col("score"), lit(0.0))), 6).as("score_sum"),
          max(md5(col("payload"))).as("payload_md5"))
        .orderBy(col("doc_id"))
    },

    // PDF text-extraction census (round 15, VERDICT r14 #3 — the one
    // ubiquitous training-data source with zero coverage until now;
    // the WARC/Avro style: synthesize REAL files, parse them BACK):
    // per doc a 2-page PDF, page 1 carrying sanitized doc text via
    // two Tj shows with a Td line break, page 2 exercising
    // literal-string ESCAPES (\( \) \\), a TJ array with kern
    // numbers, T-star and the next-line-show quote operator — then
    // extracted back with the real parser (xref walk, object graph,
    // content tokenizer). Round 16 mixes CONTAINERS by doc_id % 3:
    // classic-xref raw, classic-xref FlateDecode, and the modern
    // PDF 1.5 shape (dicts in an /ObjStm, xref as a /Type /XRef
    // STREAM with W-fields + PNG predictor 12) — all three must
    // extract identical text, so the one oracle gates them all. md5
    // of each page's extracted text makes any decode drift a hash
    // mismatch.
    "ingest_pdf" -> { (s, dir) =>
      import s.implicits._
      val recs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .map { case (id, text) =>
          val clean = text.toLowerCase
            .replaceAll("[^a-z0-9 ]", " ").take(60)
          val p1 = s"BT /F1 12 Tf 50 700 Td " +
            s"(${graft.sources.Pdf.escape(s"doc $id: $clean")}) Tj " +
            s"0 -14 Td (line two ${id % 7}) Tj ET"
          val p2 = s"BT /F1 10 Tf 50 700 Td (p2 \\(id=$id\\) \\\\ q:) Tj " +
            s"[ (a) -120 (b${id % 10}) ] TJ T* (tail) ' ET"
          val pdf = id % 3 match {
            case 0 => graft.sources.Pdf.build(Seq(p1, p2), deflate = false)
            case 1 =>
              // alternate classic FlateDecode with the email-safe
              // [/ASCII85Decode /FlateDecode] CHAIN (round 16)
              if (id % 6 == 1)
                graft.sources.Pdf.build(Seq(p1, p2), filter = "a85flate")
              else graft.sources.Pdf.build(Seq(p1, p2), deflate = true)
            case _ => graft.sources.Pdf.buildXref(Seq(p1, p2),
              deflate = true)
          }
          val pages = graft.sources.Pdf.extract(pdf)
          (id, pages.length, pages(0).text, pages(1).text)
        }
        .toDF("doc_id", "n_pages", "p1", "p2")
      recs.select(col("doc_id"),
          col("n_pages").cast("long").as("n_pages"),
          length(col("p1")).cast("long").as("p1_chars"),
          length(col("p2")).cast("long").as("p2_chars"),
          md5(col("p1")).as("p1_md5"),
          md5(col("p2")).as("p2_md5"))
        .orderBy(col("doc_id"))
    },

    // PDF text FIDELITY (round 16, VERDICT r15 #4 — subset-font PDFs
    // extract garbage under byte passthrough): one page, two remapped
    // fonts. Line 1 writes every byte SHIFTED +1 under a font whose
    // /Encoding /Differences maps code → the true glyph name (AGL
    // subset), so only a parser that honors the encoding recovers the
    // text; line 2 writes the plain bytes under a font whose
    // /ToUnicode CMap bfranges a–z → A–Z (digits/space identity), so
    // the oracle's analytic inverse is upper(target) — DuckDB's own
    // upper() replays the CMap.
    "ingest_pdf_unicode" -> { (s, dir) =>
      import s.implicits._
      val cmap = "2 beginbfrange\n<61> <7a> <0041>\n<30> <39> <0030>\n" +
        "endbfrange\n1 beginbfchar\n<20> <0020>\nendbfchar"
      val recs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .map { case (id, text) =>
          val target = (s"doc $id " + text.toLowerCase
            .replaceAll("[^a-z0-9 ]", " ")).take(24)
          val shifted = target.map(c => (c + 1).toChar)
          val diffs = target.distinct.map(c =>
            (c + 1, graft.sources.Pdf.glyphName(c)))
          val pdf = graft.sources.Pdf.buildWithFonts(
            s"BT /F1 12 Tf 50 700 Td " +
              s"(${graft.sources.Pdf.escape(shifted)}) Tj " +
              s"T* /F2 12 Tf (${graft.sources.Pdf.escape(target)}) Tj ET",
            diffs, cmap)
          val pages = graft.sources.Pdf.extract(pdf)
          (id, pages.length, pages.head.text)
        }
        .toDF("doc_id", "n_pages", "text")
      recs.select(col("doc_id"),
          col("n_pages").cast("long").as("n_pages"),
          length(col("text")).cast("long").as("text_chars"),
          md5(col("text")).as("text_md5"))
        .orderBy(col("doc_id"))
    })

  def oracle: Map[String, String] = Map(
    // analytic inverse of the synthesized 3-record archive: the
    // parser's census must equal what the builder framed. Byte lengths
    // on both sides (DuckDB strlen = bytes; Spark length(binary)) —
    // text is multi-byte-safe.
    "ingest_warc" ->
      """SELECT doc_id,
        |  CAST(3 AS BIGINT) AS n_records,
        |  CAST(strlen('software: graft' || e'\r\n') +
        |    strlen('HTTP/1.1 200 OK' || e'\r\n' ||
        |      'Content-Type: text/html' || e'\r\n' || e'\r\n' ||
        |      '<html>' || substr(text, 1, 40) || e'\r\n' ||
        |      'WARC/1.0 embedded trap' || e'\r\n' || '</html>') +
        |    strlen(text) AS BIGINT) AS payload_bytes,
        |  'http://example.com/doc/' || CAST(doc_id AS VARCHAR) AS response_uri,
        |  CAST(strlen(text) AS BIGINT) AS conversion_bytes,
        |  md5(text) AS conv_md5
        |FROM documents ORDER BY doc_id""".stripMargin,

    // analytic inverse of the synthesized containers: the parser's
    // census must equal what the encoder framed (varints, unions in
    // both branch orders, deflate for odd docs, 2-row blocks)
    "ingest_avro" ->
      """WITH recs AS (
        |  SELECT doc_id, text,
        |    unnest(range(0, CAST(doc_id % 3 + 1 AS BIGINT))) AS j
        |  FROM documents)
        |SELECT doc_id, count(*) AS n_records,
        |  CAST(sum(doc_id * 10 + j) AS BIGINT) AS sum_n,
        |  CAST(sum(-(doc_id + j)) AS BIGINT) AS sum_z,
        |  CAST(sum(CASE WHEN j % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_null_score,
        |  round(sum(CASE WHEN j % 2 = 0
        |    THEN (doc_id % 100) * CAST(0.25 AS DOUBLE) + j
        |    ELSE CAST(0 AS DOUBLE) END), 6) AS score_sum,
        |  max(md5(substr(text, 1, 20) || '-' || CAST(j AS VARCHAR)))
        |    AS payload_md5
        |FROM recs GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // analytic inverse of the planted 2-page PDF: page 1 = two Tj
    // shows joined by the Td newline; page 2 = escape-decoded literal
    // + TJ strings + T* newline + the quote show. chr(92) = backslash
    "ingest_pdf" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    'doc ' || doc_id || ': ' ||
        |      substr(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
        |        1, 60) || chr(10) || 'line two ' || (doc_id % 7) AS p1,
        |    'p2 (id=' || doc_id || ') ' || chr(92) || ' q:ab' ||
        |      (doc_id % 10) || chr(10) || 'tail' AS p2
        |  FROM documents)
        |SELECT doc_id, CAST(2 AS BIGINT) AS n_pages,
        |  CAST(length(p1) AS BIGINT) AS p1_chars,
        |  CAST(length(p2) AS BIGINT) AS p2_chars,
        |  md5(p1) AS p1_md5, md5(p2) AS p2_md5
        |FROM t ORDER BY doc_id""".stripMargin,

    // analytic inverse of the two planted font maps: the
    // /Differences line decodes back to the target and the
    // /ToUnicode line is DuckDB's own upper() (a–z → A–Z bfrange,
    // digits/space identity)
    "ingest_pdf_unicode" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    substr('doc ' || doc_id || ' ' ||
        |      regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
        |      1, 24) AS tgt
        |  FROM documents)
        |SELECT doc_id, CAST(1 AS BIGINT) AS n_pages,
        |  CAST(length(tgt || chr(10) || upper(tgt)) AS BIGINT)
        |    AS text_chars,
        |  md5(tgt || chr(10) || upper(tgt)) AS text_md5
        |FROM t ORDER BY doc_id""".stripMargin,

    "ingest_dedup_pref" ->
      """SELECT user_id,
        |  max_by(event_id, ts) AS last_event_id,
        |  max_by(event_type, ts) AS last_event_type,
        |  count(*) AS n_records
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "ingest_validate" ->
      """SELECT c_custkey, c_name,
        |  regexp_matches(c_name, '^Customer#[0-9]{9}$') AS valid
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "ingest_filter_entity" ->
      """SELECT c_custkey, c_name, c_mktsegment
        |FROM customer
        |WHERE c_mktsegment IN ('FURNITURE', 'BUILDING')
        |  AND c_name LIKE '%Customer%'
        |ORDER BY c_custkey""".stripMargin,

    "ingest_quarantine" ->
      """SELECT o_orderkey, o_orderstatus,
        |  round(o_totalprice, 2) AS o_totalprice, o_orderdate,
        |  CASE
        |    WHEN o_totalprice < 0 OR o_totalprice > 200000
        |      THEN 'range_o_totalprice'
        |    WHEN o_orderstatus NOT IN ('O','F','P')
        |      THEN 'set_o_orderstatus'
        |    WHEN o_orderdate > DATE '1997-12-31'
        |      THEN 'at_most_o_orderdate'
        |  END AS reason
        |FROM orders
        |WHERE o_totalprice < 0 OR o_totalprice > 200000
        |  OR o_orderstatus NOT IN ('O','F','P')
        |  OR o_orderdate > DATE '1997-12-31'
        |ORDER BY o_orderkey""".stripMargin,

    "quality_expectations" ->
      """WITH a AS (
        |  SELECT count(*) AS n_rows,
        |    coalesce(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END), 0)
        |      AS v_null,
        |    count(o_orderkey) - count(DISTINCT o_orderkey) AS v_uniq,
        |    coalesce(sum(CASE WHEN o_totalprice < 0
        |      OR o_totalprice > 200000 THEN 1 ELSE 0 END), 0) AS v_range,
        |    coalesce(sum(CASE WHEN o_orderstatus NOT IN ('O','F','P')
        |      THEN 1 ELSE 0 END), 0) AS v_set,
        |    coalesce(sum(CASE WHEN o_orderdate > DATE '1997-12-31'
        |      THEN 1 ELSE 0 END), 0) AS v_fresh
        |  FROM orders)
        |SELECT check_name, n_rows,
        |  CAST(violations AS BIGINT) AS violations,
        |  violations = 0 AS passed
        |FROM (
        |  SELECT 'not_null_o_custkey' AS check_name, n_rows,
        |    v_null AS violations FROM a
        |  UNION ALL SELECT 'unique_o_orderkey', n_rows, v_uniq FROM a
        |  UNION ALL SELECT 'range_o_totalprice', n_rows, v_range FROM a
        |  UNION ALL SELECT 'set_o_orderstatus', n_rows, v_set FROM a
        |  UNION ALL SELECT 'at_most_o_orderdate', n_rows, v_fresh FROM a)
        |ORDER BY check_name""".stripMargin)
}
