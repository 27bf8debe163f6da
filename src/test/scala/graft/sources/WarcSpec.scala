package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.file.{Files, Paths}
import java.util.zip.GZIPOutputStream

import graft.SparkSpec

class WarcSpec extends SparkSpec {

  private val Crlf = "\r\n"

  /** Hand-framed record bytes with exact Content-Length. */
  private def rec(typ: String, id: String, uri: Option[String],
                  payload: Array[Byte], extra: String = ""): Array[Byte] = {
    val hdr = new StringBuilder()
      .append("WARC/1.0").append(Crlf)
      .append("WARC-Type: ").append(typ).append(Crlf)
      .append("WARC-Record-ID: <").append(id).append(">").append(Crlf)
      .append("WARC-Date: 2024-01-01T00:00:00Z").append(Crlf)
    uri.foreach(u => hdr.append("WARC-Target-URI: ").append(u).append(Crlf))
    hdr.append(extra)
      .append("Content-Length: ").append(payload.length).append(Crlf)
      .append(Crlf)
    hdr.toString.getBytes("UTF-8") ++ payload ++ (Crlf + Crlf).getBytes("UTF-8")
  }

  /** The adversarial fixture: payload CONTAINS a full WARC header
    * block — only Content-Length framing survives it. */
  private val trapPayload =
    ("no-split" + Crlf + "WARC/1.0" + Crlf + "WARC-Type: response" +
      Crlf + Crlf + "tail").getBytes("UTF-8")

  private def archive: Array[Byte] =
    rec("warcinfo", "urn:a:0", None, s"software: graft$Crlf".getBytes("UTF-8")) ++
      rec("response", "urn:a:1", Some("http://x.test/p"), trapPayload,
        // folded continuation line (RFC 822): joins with a space
        extra = s"WARC-Concurrent-To: <urn:a:0>$Crlf  <urn:a:9>$Crlf") ++
      rec("conversion", "urn:a:2", Some("http://x.test/p"),
        "extracted text กข".getBytes("UTF-8"))

  test("parseRecords: Content-Length framing survives embedded WARC headers") {
    val rs = Warc.parseRecords(archive)
    assert(rs.map(_.warcType) == Seq("warcinfo", "response", "conversion"))
    assert(rs.map(_.recordIdx) == Seq(0, 1, 2))
    assert(rs(1).payload.sameElements(trapPayload))
    assert(rs(1).targetUri == "http://x.test/p")
    assert(rs(0).targetUri == null)
    // multi-byte payload round-trips byte-exact
    assert(new String(rs(2).payload, "UTF-8") == "extracted text กข")
    assert(rs(2).contentLength == rs(2).payload.length.toLong)
  }

  test("parseRecords: gzip multi-member (CommonCrawl member-per-record) auto-detected") {
    // each record its own gzip member, members concatenated — the
    // layout that makes .warc.gz non-splittable but per-record seekable
    val out = new ByteArrayOutputStream()
    for (r <- Seq(
        rec("response", "urn:g:0", Some("http://x.test/a"), "aaa".getBytes),
        rec("conversion", "urn:g:1", Some("http://x.test/b"), "bbbb".getBytes))) {
      val g = new GZIPOutputStream(out); g.write(r); g.finish()
    }
    val rs = Warc.parseRecords(out.toByteArray)
    assert(rs.map(_.warcType) == Seq("response", "conversion"))
    assert(rs.map(_.contentLength) == Seq(3L, 4L))
    assert(new String(rs(1).payload, "UTF-8") == "bbbb")
  }

  test("parseRecords: truncation and missing Content-Length fail loudly") {
    val full = rec("response", "urn:t:0", None, "0123456789".getBytes)
    val cut = java.util.Arrays.copyOfRange(full, 0, full.length - 8)
    val e1 = intercept[IllegalArgumentException](Warc.parseRecords(cut))
    assert(e1.getMessage.contains("truncated"))
    val noLen = ("WARC/1.0" + Crlf + "WARC-Type: response" + Crlf + Crlf)
      .getBytes("UTF-8")
    val e2 = intercept[IllegalArgumentException](Warc.parseRecords(noLen))
    assert(e2.getMessage.contains("Content-Length"))
    val junk = "HTTP/1.1 200 OK\r\n\r\n".getBytes("UTF-8")
    val e3 = intercept[IllegalArgumentException](Warc.parseRecords(junk))
    assert(e3.getMessage.contains("version line"))
  }

  test("readStream: segment files are parsed as they arrive — stream ≡ batch read") {
    val dir = Files.createTempDirectory("graft-warc-stream").toString
    Files.write(Paths.get(s"$dir/seg-0.warc"), archive)
    val q = Warc.readStream(spark, s"$dir/*.warc*")
      .writeStream.format("memory").queryName("warcstream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("warcstream").count() == 3)
      // a new segment lands (gzipped — same parse through both codecs)
      val gz = new ByteArrayOutputStream()
      val g = new GZIPOutputStream(gz); g.write(archive); g.finish()
      Files.write(Paths.get(s"$dir/seg-1.warc.gz"), gz.toByteArray)
      q.processAllAvailable()
      val rows = spark.table("warcstream")
      assert(rows.count() == 6)
      assert(rows.select("warc_type").distinct().count() == 3)
      // stream output ≡ the batch read over the same directory
      val batch = Warc.read(spark, s"$dir/*.warc*")
        .select("path", "record_idx", "record_id").collect().toSet
      assert(rows.select("path", "record_idx", "record_id")
        .collect().toSet == batch.map(identity))
    } finally q.stop()
  }

  test("read: distributed binaryFile read over plain + gzipped archives") {
    val dir = Files.createTempDirectory("graft-warc").toString
    Files.write(Paths.get(s"$dir/seg-0.warc"), archive)
    val gz = new ByteArrayOutputStream()
    val g = new GZIPOutputStream(gz); g.write(archive); g.finish()
    Files.write(Paths.get(s"$dir/seg-1.warc.gz"), gz.toByteArray)
    val df = Warc.read(spark, s"$dir/*.warc*").cache()
    try {
      assert(df.count() == 6) // 3 records × 2 files
      // per-file attribution and identical parse through both codecs
      val byFile = df.groupBy("path").count().collect()
        .map(r => r.getString(0).split('/').last -> r.getLong(1)).toMap
      assert(byFile == Map("seg-0.warc" -> 3L, "seg-1.warc.gz" -> 3L))
      val conv = df.filter(df("warc_type") === "conversion")
        .select("content_length").distinct().collect()
      assert(conv.map(_.getLong(0)).toSeq == Seq(
        "extracted text กข".getBytes("UTF-8").length.toLong))
    } finally df.unpersist()
  }
}
