package graft.sources

import java.util.zip.{Deflater, Inflater}

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Zero-dependency PDF TEXT extractor (VERDICT r14 #3) — the one
  * ubiquitous training-data source the repo had no surface for. The
  * Xls/Warc/Avro contract style: a well-defined subset parsed for
  * real, everything outside it failing loudly naming the offender.
  *
  * Contract:
  *  - classic cross-reference TABLES (with /Prev incremental-update
  *    chains, newest entry wins); cross-reference STREAMS (PDF 1.5+)
  *    and object streams (/ObjStm) fail loudly;
  *  - unencrypted only (/Encrypt in the trailer fails loudly);
  *  - content streams raw or /FlateDecode (zlib-wrapped per the spec;
  *    predictors via /DecodeParms are out of contract, as is any
  *    other filter — named in the failure);
  *  - text via the BT/ET text-object operators: Tj, TJ (kern numbers
  *    skipped), ' and " (next-line shows), with Td, TD, T-star and Tm
  *    starting a new line in the assembled text; literal strings decode the
  *    full escape set (\n \r \t \b \f \( \) \\ \ddd octal + escaped
  *    newlines), hex strings decode nibble pairs; bytes map Latin-1
  *    (simple fonts — CID/ToUnicode CMap remapping is out of scope,
  *    documented, not silently wrong: the bytes come through as
  *    written).
  *
  * A builder exists so specs and the `ingest_pdf` oracle fixture
  * exercise the parser on REAL xref offsets / object framing / zlib
  * streams (the Avro.encode discipline).
  *
  * Scale shape: [[read]] is binaryFile → flatMap whole-file pages
  * (the Warc/Avro pattern) — row-local distributed decode, zero
  * shuffle; parallelism = the file census, which is how document
  * dumps ship PDFs anyway.
  */
object Pdf {

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"PDF: $msg")

  // ----------------------------------------------------------- values

  private sealed trait V
  private case class VNum(d: Double) extends V { def i: Int = d.toInt }
  private case class VName(n: String) extends V
  private case class VStr(s: String) extends V
  private case class VArr(xs: Vector[V]) extends V
  private case class VDict(m: Map[String, V]) extends V
  private case class VRef(num: Int, gen: Int) extends V
  private case class VBool(b: Boolean) extends V
  private case object VNull extends V
  private case class VStream(dict: VDict, data: Array[Byte]) extends V

  // ------------------------------------------------------------ lexer

  private def isWs(c: Int): Boolean =
    c == ' ' || c == '\t' || c == '\r' || c == '\n' || c == '\f' || c == 0
  private def isDelim(c: Int): Boolean =
    c == '(' || c == ')' || c == '<' || c == '>' || c == '[' || c == ']' ||
      c == '{' || c == '}' || c == '/' || c == '%'

  private final class Lex(val b: Array[Byte], var p: Int) {
    def ws(): Unit = {
      var go = true
      while (go) {
        while (p < b.length && isWs(b(p) & 0xFF)) p += 1
        if (p < b.length && b(p) == '%') { // comment to EOL
          while (p < b.length && b(p) != '\n' && b(p) != '\r') p += 1
        } else go = false
      }
    }
    def peek: Int = if (p < b.length) b(p) & 0xFF else -1
    def keyword(): String = {
      ws()
      val s = p
      while (p < b.length && !isWs(b(p) & 0xFF) && !isDelim(b(p) & 0xFF)) p += 1
      if (p == s) fail(s"expected keyword at $p")
      new String(b, s, p - s, "ISO-8859-1")
    }
    def expect(kw: String): Unit = {
      val got = keyword()
      if (got != kw) fail(s"expected '$kw', got '$got' at $p")
    }

    private def name(): VName = { // at '/'
      p += 1
      val sb = new StringBuilder
      while (p < b.length && !isWs(b(p) & 0xFF) && !isDelim(b(p) & 0xFF)) {
        val c = b(p) & 0xFF
        if (c == '#' && p + 2 < b.length) {
          sb.append(Integer.parseInt(
            new String(b, p + 1, 2, "US-ASCII"), 16).toChar)
          p += 3
        } else { sb.append(c.toChar); p += 1 }
      }
      VName(sb.toString)
    }

    private def literalString(): VStr = { // at '('
      p += 1
      val sb = new StringBuilder
      var depth = 1
      while (depth > 0) {
        if (p >= b.length) fail("unterminated literal string")
        val c = b(p) & 0xFF; p += 1
        c match {
          case '(' => depth += 1; sb.append('(')
          case ')' => depth -= 1; if (depth > 0) sb.append(')')
          case '\\' =>
            if (p >= b.length) fail("dangling escape in string")
            val e = b(p) & 0xFF; p += 1
            e match {
              case 'n' => sb.append('\n')
              case 'r' => sb.append('\r')
              case 't' => sb.append('\t')
              case 'b' => sb.append('\b')
              case 'f' => sb.append('\f')
              case '(' => sb.append('(')
              case ')' => sb.append(')')
              case '\\' => sb.append('\\')
              case '\r' => if (p < b.length && b(p) == '\n') p += 1 // line cont.
              case '\n' => () // line continuation
              case d if d >= '0' && d <= '7' =>
                var v = d - '0'; var k = 0
                while (k < 2 && p < b.length &&
                    b(p) >= '0' && b(p) <= '7') {
                  v = v * 8 + (b(p) - '0'); p += 1; k += 1
                }
                sb.append((v & 0xFF).toChar)
              case other => sb.append(other.toChar) // spec: drop backslash
            }
          case other => sb.append(other.toChar)
        }
      }
      VStr(sb.toString)
    }

    private def hexString(): VStr = { // at '<', not '<<'
      p += 1
      val hx = new StringBuilder
      while (p < b.length && b(p) != '>') {
        val c = b(p) & 0xFF
        if (!isWs(c)) {
          if (Character.digit(c, 16) < 0) fail(s"bad hex-string digit at $p")
          hx.append(c.toChar)
        }
        p += 1
      }
      if (p >= b.length) fail("unterminated hex string")
      p += 1
      if (hx.length % 2 == 1) hx.append('0')
      val sb = new StringBuilder
      var i = 0
      while (i < hx.length) {
        sb.append(Integer.parseInt(hx.substring(i, i + 2), 16).toChar)
        i += 2
      }
      VStr(sb.toString)
    }

    def number(): VNum = {
      ws()
      val s = p
      if (p < b.length && (b(p) == '+' || b(p) == '-')) p += 1
      while (p < b.length &&
          ((b(p) >= '0' && b(p) <= '9') || b(p) == '.')) p += 1
      if (p == s) fail(s"expected number at $p")
      VNum(new String(b, s, p - s, "US-ASCII").toDouble)
    }

    /** Parse one value. `refs` enables "N G R" indirect-ref lookahead
      * (content streams have no refs, so their lexer disables it). */
    def value(refs: Boolean): V = {
      ws()
      peek match {
        case -1 => fail("unexpected end of input")
        case '/' => name()
        case '(' => literalString()
        case '<' =>
          if (p + 1 < b.length && b(p + 1) == '<') { // dict
            p += 2
            val m = mutable.LinkedHashMap.empty[String, V]
            ws()
            while (!(peek == '>' && p + 1 < b.length && b(p + 1) == '>')) {
              if (peek != '/') fail(s"expected name key at $p")
              val VName(k) = name(): @unchecked
              m(k) = value(refs)
              ws()
            }
            p += 2
            VDict(m.toMap)
          } else hexString()
        case '[' =>
          p += 1
          val xs = Vector.newBuilder[V]
          ws()
          while (peek != ']') { xs += value(refs); ws() }
          p += 1
          VArr(xs.result())
        case c if c == '+' || c == '-' || c == '.' || (c >= '0' && c <= '9') =>
          val n = number()
          if (refs && n.d == math.floor(n.d) && n.d >= 0) {
            // lookahead for "G R"
            val save = p
            ws()
            if (peek >= '0' && peek <= '9') {
              val g = number()
              ws()
              if (peek == 'R' &&
                  (p + 1 >= b.length || isWs(b(p + 1) & 0xFF) ||
                    isDelim(b(p + 1) & 0xFF))) {
                p += 1
                return VRef(n.i, g.i)
              }
            }
            p = save
          }
          n
        case 't' | 'f' | 'n' =>
          keyword() match {
            case "true" => VBool(true)
            case "false" => VBool(false)
            case "null" => VNull
            case other => fail(s"unexpected keyword '$other'")
          }
        case other => fail(f"unexpected byte 0x$other%02X at $p")
      }
    }
  }

  // ------------------------------------------------------------ xref

  private final class Doc(bytes: Array[Byte]) {
    if (bytes.length < 8 ||
        !new String(bytes, 0, 5, "US-ASCII").startsWith("%PDF-"))
      fail("missing %PDF header")

    // offsets from the classic xref table chain (newest first wins)
    private val offsets = mutable.Map.empty[Int, Long]
    val trailer: Map[String, V] = {
      val tailAt = math.max(0, bytes.length - 2048)
      val tail = new String(bytes, tailAt,
        bytes.length - tailAt, "ISO-8859-1")
      val sx = tail.lastIndexOf("startxref")
      if (sx < 0) fail("no startxref")
      val lx = new Lex(bytes, tailAt + sx)
      lx.expect("startxref")
      var xrefAt = lx.number().d.toLong
      var first: Map[String, V] = null
      while (xrefAt >= 0) {
        if (xrefAt >= bytes.length) fail(s"startxref $xrefAt past EOF")
        val l = new Lex(bytes, xrefAt.toInt)
        l.ws()
        if (l.peek >= '0' && l.peek <= '9')
          fail("cross-reference stream (PDF 1.5+) out of contract")
        l.expect("xref")
        l.ws()
        while (l.peek >= '0' && l.peek <= '9') { // subsections
          val start = l.number().i
          l.ws()
          val n = l.number().i
          for (k <- 0 until n) {
            l.ws()
            val off = l.number().d.toLong
            l.ws()
            l.number() // generation
            l.ws()
            val tpe = l.keyword()
            if (tpe != "n" && tpe != "f") fail(s"bad xref entry type '$tpe'")
            if (tpe == "n" && !offsets.contains(start + k))
              offsets(start + k) = off
          }
          l.ws()
        }
        l.expect("trailer")
        val t = l.value(refs = true) match {
          case VDict(m) => m
          case _ => fail("trailer is not a dictionary")
        }
        if (first == null) first = t
        xrefAt = t.get("Prev") match {
          case Some(VNum(d)) => d.toLong
          case _ => -1L
        }
      }
      if (first.contains("Encrypt")) fail("encrypted PDF out of contract")
      first
    }

    private val cache = mutable.Map.empty[Int, V]

    def resolve(v: V): V = v match {
      case VRef(num, _) => resolve(objectAt(num))
      case other => other
    }

    private def objectAt(num: Int): V = cache.getOrElseUpdate(num, {
      val off = offsets.getOrElse(num, fail(s"object $num not in xref"))
      if (off < 0 || off >= bytes.length) fail(s"object $num offset $off invalid")
      val l = new Lex(bytes, off.toInt)
      l.ws()
      val gotNum = l.number().i
      if (gotNum != num) fail(s"xref points at object $gotNum, wanted $num")
      l.ws(); l.number() // generation
      l.expect("obj")
      val v = l.value(refs = true)
      l.ws()
      // stream?
      val save = l.p
      val kw = try l.keyword() catch { case _: IllegalArgumentException => "" }
      if (kw == "stream") {
        val dict = v match {
          case d: VDict => d
          case _ => fail(s"stream object $num without a dictionary")
        }
        if (dict.m.get("Type").contains(VName("ObjStm")))
          fail("object stream (/ObjStm, PDF 1.5+) out of contract")
        // EOL after 'stream': CRLF or LF
        var dp = l.p
        if (dp < bytes.length && bytes(dp) == '\r') dp += 1
        if (dp < bytes.length && bytes(dp) == '\n') dp += 1
        val len = resolve(dict.m.getOrElse("Length",
          fail(s"stream object $num without /Length"))) match {
          case VNum(d) => d.toInt
          case _ => fail(s"stream object $num /Length not a number")
        }
        if (dp + len > bytes.length) fail(s"stream object $num truncated")
        val data = java.util.Arrays.copyOfRange(bytes, dp, dp + len)
        VStream(dict, data)
      } else { l.p = save; v }
    })

    def decodeStream(s: VStream): Array[Byte] = {
      if (s.dict.m.contains("DecodeParms") || s.dict.m.contains("DP"))
        fail("stream predictors (/DecodeParms) out of contract")
      s.dict.m.get("Filter") match {
        case None => s.data
        case Some(VName("FlateDecode")) | Some(VArr(Vector(VName("FlateDecode")))) =>
          val inf = new Inflater() // zlib-wrapped per the PDF spec
          inf.setInput(s.data)
          val out = new java.io.ByteArrayOutputStream(s.data.length * 4)
          val buf = new Array[Byte](8192)
          while (!inf.finished()) {
            val got = inf.inflate(buf)
            if (got == 0 && !inf.finished())
              fail(if (inf.needsDictionary())
                "FlateDecode stream requires a preset dictionary"
              else "truncated FlateDecode stream")
            out.write(buf, 0, got)
          }
          inf.end()
          out.toByteArray
        case Some(VName(other)) => fail(s"filter /$other out of contract")
        case Some(VArr(xs)) =>
          fail(s"filter chain ${xs.collect { case VName(n) => "/" + n }
            .mkString("[", " ", "]")} out of contract")
        case Some(other) => fail(s"malformed /Filter $other")
      }
    }
  }

  // ----------------------------------------------------- text assembly

  /** Extracted page text. */
  final case class PageText(page: Int, text: String)

  private def contentText(content: Array[Byte]): String = {
    val l = new Lex(content, 0)
    val out = new StringBuilder
    val operands = mutable.ArrayBuffer.empty[V]
    def newline(): Unit =
      if (out.nonEmpty && out.last != '\n') out.append('\n')
    def show(v: V): Unit = v match {
      case VStr(s) => out.append(s)
      case VArr(xs) => xs.foreach { // TJ: strings shown, kern numbers skipped
        case VStr(s) => out.append(s)
        case _: VNum => ()
        case other => fail(s"bad TJ element $other")
      }
      case other => fail(s"bad show operand $other")
    }
    l.ws()
    while (l.peek != -1) {
      val c = l.peek
      if (c == '/' || c == '(' || c == '<' || c == '[' ||
          c == '+' || c == '-' || c == '.' || (c >= '0' && c <= '9')) {
        operands += l.value(refs = false)
      } else {
        val op = l.keyword()
        op match {
          case "Tj" => show(operands.lastOption.getOrElse(fail("Tj without operand")))
          case "TJ" => show(operands.lastOption.getOrElse(fail("TJ without operand")))
          case "'" =>
            newline()
            show(operands.lastOption.getOrElse(fail("' without operand")))
          case "\"" =>
            newline()
            show(operands.lastOption.getOrElse(fail("\" without operand")))
          case "Td" | "TD" | "T*" | "Tm" => newline()
          case _ => () // positioning/state/path operators: no text effect
        }
        operands.clear()
      }
      l.ws()
    }
    out.toString
  }

  /** Parse a PDF and extract per-page text within the contract. */
  def extract(pdf: Array[Byte]): Seq[PageText] = {
    val doc = new Doc(pdf)
    val root = doc.resolve(doc.trailer.getOrElse("Root",
      fail("trailer has no /Root"))) match {
      case VDict(m) => m
      case _ => fail("/Root is not a dictionary")
    }
    val pages = mutable.ArrayBuffer.empty[Map[String, V]]
    def walk(v: V): Unit = doc.resolve(v) match {
      case VDict(m) => m.get("Type") match {
        case Some(VName("Pages")) =>
          doc.resolve(m.getOrElse("Kids", fail("/Pages without /Kids"))) match {
            case VArr(kids) => kids.foreach(walk)
            case _ => fail("/Kids is not an array")
          }
        case Some(VName("Page")) => pages += m
        case other => fail(s"unexpected page-tree node type $other")
      }
      case _ => fail("page-tree node is not a dictionary")
    }
    walk(root.getOrElse("Pages", fail("catalog has no /Pages")))
    pages.zipWithIndex.map { case (pg, i) =>
      val streams = pg.get("Contents").map(doc.resolve) match {
        case None => Seq.empty[VStream]
        case Some(s: VStream) => Seq(s)
        case Some(VArr(xs)) => xs.map(doc.resolve).map {
          case s: VStream => s
          case other => fail(s"page content ref resolves to $other")
        }
        case Some(other) => fail(s"page /Contents resolves to $other")
      }
      val content = streams.map(doc.decodeStream)
        .foldLeft(Array.empty[Byte])(_ ++ _)
      PageText(i + 1, contentText(content))
    }.toSeq
  }

  // ---------------------------------------------------------- builder

  /** Build a real classic-xref PDF whose page k shows `pages(k)` as
    * its raw content stream (caller writes the BT/Tj/ET operators).
    * `deflate` FlateDecode-compresses every content stream (zlib).
    * Exact byte offsets in the xref table — the part a hand-rolled
    * fixture usually fakes and this one does for real. */
  def build(pages: Seq[String], deflate: Boolean = false): Array[Byte] = {
    require(pages.nonEmpty, "at least one page")
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    val offsets = mutable.Map.empty[Int, Int]
    w("%PDF-1.4\n%âãÏÓ\n")
    val nPages = pages.length
    // object numbers: 1 catalog, 2 pages, 3 font, then per page k
    // (0-based): 4+2k page, 5+2k content
    def obj(num: Int)(body: => Unit): Unit = {
      offsets(num) = out.size()
      w(s"$num 0 obj\n"); body; w("\nendobj\n")
    }
    obj(1)(w("<< /Type /Catalog /Pages 2 0 R >>"))
    obj(2) {
      val kids = (0 until nPages).map(k => s"${4 + 2 * k} 0 R").mkString(" ")
      w(s"<< /Type /Pages /Kids [ $kids ] /Count $nPages >>")
    }
    obj(3)(w("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"))
    for ((content, k) <- pages.zipWithIndex) {
      obj(4 + 2 * k)(w(s"<< /Type /Page /Parent 2 0 R " +
        s"/MediaBox [ 0 0 612 792 ] " +
        s"/Resources << /Font << /F1 3 0 R >> >> " +
        s"/Contents ${5 + 2 * k} 0 R >>"))
      val raw = content.getBytes("ISO-8859-1")
      val data =
        if (!deflate) raw
        else {
          val d = new Deflater() // zlib wrapper — PDF FlateDecode
          d.setInput(raw); d.finish()
          val o = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](8192)
          while (!d.finished()) o.write(buf, 0, d.deflate(buf))
          d.end()
          o.toByteArray
        }
      offsets(5 + 2 * k) = out.size()
      w(s"${5 + 2 * k} 0 obj\n<< /Length ${data.length}" +
        (if (deflate) " /Filter /FlateDecode" else "") + " >>\nstream\n")
      out.write(data, 0, data.length)
      w("\nendstream\nendobj\n")
    }
    val xrefAt = out.size()
    val maxObj = 3 + 2 * nPages
    w(s"xref\n0 ${maxObj + 1}\n")
    w(f"${0}%010d ${65535}%05d f \n")
    for (n <- 1 to maxObj) w(f"${offsets(n)}%010d ${0}%05d n \n")
    w(s"trailer\n<< /Size ${maxObj + 1} /Root 1 0 R >>\n" +
      s"startxref\n$xrefAt\n%%EOF\n")
    out.toByteArray
  }

  /** Escape a string for a PDF literal string. */
  def escape(s: String): String =
    s.flatMap {
      case '(' => "\\("
      case ')' => "\\)"
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case c => c.toString
    }

  // ----------------------------------------------------- Spark surface

  /** Distributed read: every PDF under `path` → (path, page, text)
    * rows. binaryFile → row-local extract, zero shuffle. */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, bytes) =>
        extract(bytes).map(pt => (p, pt.page, pt.text))
      }
      .toDF("path", "page", "text")
  }

  /** Streaming read — the continuous-ingest twin of [[read]] (the
    * Warc/Avro readStream shape): new `.pdf` files landing under
    * `path` extract as they arrive; out-of-contract files fail loudly
    * inside the task, exactly like batch. Stateless append mode. */
  def readStream(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val binarySchema = StructType(Seq(
      StructField("path", StringType),
      StructField("modificationTime", TimestampType),
      StructField("length", LongType),
      StructField("content", BinaryType)))
    spark.readStream.format("binaryFile").schema(binarySchema).load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, bytes) =>
        extract(bytes).map(pt => (p, pt.page, pt.text))
      }
      .toDF("path", "page", "text")
  }
}
