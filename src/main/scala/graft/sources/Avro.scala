package graft.sources

import java.util.zip.{Deflater, Inflater}

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Zero-dependency Avro OBJECT CONTAINER reader (VERDICT r13 #6) —
  * data lakes hand analytics engines `.avro` as often as parquet, and
  * the repo's zero-dep-parser discipline (Xls CFB, Warc framing, PNG
  * scanlines) extends naturally: the container is header magic +
  * a metadata map carrying the schema JSON + sync-marker-framed data
  * blocks of zigzag-varint-encoded records.
  *
  * Contract (fail-LOUDLY outside it, the Warc discipline):
  *  - codecs `null`, `deflate` (raw DEFLATE, no zlib wrapper —
  *    `Inflater(nowrap)`) and `snappy` (raw-block [[Snappy]] + the
  *    4-byte big-endian CRC32-of-uncompressed trailer the Avro spec
  *    mandates — the default codec of most export jobs);
  *  - a top-level RECORD schema whose fields are the primitive types
  *    boolean / int / long / float / double / string / bytes, plus
  *    the two-branch nullable union `["null", prim]` (either order)
  *    — the shape warehouse handoff tables actually use. Nested
  *    records/arrays/maps/enums/fixed fail fast with the offending
  *    type in the message.
  *  - every data block's trailing sync marker must equal the header's
  *    (framing corruption surfaces immediately, not as garbage rows).
  *
  * The schema JSON is parsed by a ~60-line recursive-descent parser —
  * no jackson/json4s coupling, same spirit as the Xlsx XML scanner.
  * An encoder exists so specs and the `ingest_avro` oracle fixture
  * exercise the decoder on REAL varint/union/deflate byte streams.
  *
  * Scale shape: `read` is the binaryFile → flatMap whole-file pattern
  * ([[Warc.read]]): one schema probe on the driver, then row-local
  * distributed decode, zero shuffle. Avro blocks are NOT split within
  * a file here (binaryFile's whole-file contract) — the splittable
  * path at 100 TB is many container files, which is how crawl/export
  * jobs write them anyway.
  */
object Avro {

  final case class Field(name: String, tpe: String, nullable: Boolean,
                         nullFirst: Boolean)

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"Avro: $msg")

  // ------------------------------------------------------- JSON (schema)

  /** Minimal recursive-descent JSON parser: objects → mutable.LinkedHashMap,
    * arrays → List, strings/booleans/null/numbers(Double). Enough for
    * Avro schema documents; not a general-purpose parser. */
  private final class Json(s: String) {
    private var i = 0
    private def ws(): Unit =
      while (i < s.length && s.charAt(i).isWhitespace) i += 1
    private def expect(lit: String): Unit = {
      if (!s.startsWith(lit, i)) fail(s"schema JSON: expected $lit at $i")
      i += lit.length
    }
    def parse(): Any = {
      ws()
      if (i >= s.length) fail("schema JSON: unexpected end")
      s.charAt(i) match {
        case '{' => obj()
        case '[' => arr()
        case '"' => str()
        case 't' => expect("true"); true
        case 'f' => expect("false"); false
        case 'n' => expect("null"); null
        case _ => num()
      }
    }
    private def obj(): mutable.LinkedHashMap[String, Any] = {
      val m = mutable.LinkedHashMap.empty[String, Any]
      i += 1; ws()
      if (s.charAt(i) == '}') { i += 1; return m }
      while (true) {
        ws()
        val k = str(); ws(); expect(":")
        m(k) = parse(); ws()
        s.charAt(i) match {
          case ',' => i += 1
          case '}' => i += 1; return m
          case c => fail(s"schema JSON: unexpected '$c' in object at $i")
        }
      }
      m
    }
    private def arr(): List[Any] = {
      val b = List.newBuilder[Any]
      i += 1; ws()
      if (s.charAt(i) == ']') { i += 1; return b.result() }
      while (true) {
        b += parse(); ws()
        s.charAt(i) match {
          case ',' => i += 1
          case ']' => i += 1; return b.result()
          case c => fail(s"schema JSON: unexpected '$c' in array at $i")
        }
      }
      b.result()
    }
    private def str(): String = {
      if (s.charAt(i) != '"') fail(s"schema JSON: expected string at $i")
      i += 1
      val sb = new StringBuilder
      while (s.charAt(i) != '"') {
        val c = s.charAt(i)
        if (c == '\\') {
          i += 1
          s.charAt(i) match {
            case '"' => sb += '"'
            case '\\' => sb += '\\'
            case '/' => sb += '/'
            case 'b' => sb += '\b'
            case 'f' => sb += '\f'
            case 'n' => sb += '\n'
            case 'r' => sb += '\r'
            case 't' => sb += '\t'
            case 'u' =>
              sb += Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar
              i += 4
            case e => fail(s"schema JSON: bad escape \\$e")
          }
        } else sb += c
        i += 1
      }
      i += 1
      sb.toString
    }
    private def num(): Double = {
      val start = i
      while (i < s.length && "+-0123456789.eE".indexOf(s.charAt(i)) >= 0) i += 1
      s.substring(start, i).toDouble
    }
  }

  private val Prims =
    Set("boolean", "int", "long", "float", "double", "string", "bytes")

  /** Parse the schema JSON into the supported field list. */
  def parseSchema(json: String): Seq[Field] = {
    val root = new Json(json).parse() match {
      case m: mutable.LinkedHashMap[String @unchecked, Any @unchecked] => m
      case _ => fail("schema must be a JSON object")
    }
    if (root.get("type") != Some("record"))
      fail(s"unsupported top-level type ${root.get("type")} (record only)")
    val fields = root.get("fields") match {
      case Some(l: List[Any @unchecked]) => l
      case _ => fail("record schema without fields array")
    }
    fields.map {
      case f: mutable.LinkedHashMap[String @unchecked, Any @unchecked] =>
        val name = f.getOrElse("name", fail("field without name")).toString
        f.getOrElse("type", fail(s"field $name without type")) match {
          case p: String if Prims(p) => Field(name, p, nullable = false,
            nullFirst = false)
          case p: String => fail(s"field $name: unsupported type $p")
          case List("null", p: String) if Prims(p) =>
            Field(name, p, nullable = true, nullFirst = true)
          case List(p: String, "null") if Prims(p) =>
            Field(name, p, nullable = true, nullFirst = false)
          case other => fail(s"field $name: unsupported type $other")
        }
      case other => fail(s"malformed field entry $other")
    }
  }

  // ----------------------------------------------------------- varints

  private def zigzag(n: Long): Long = (n << 1) ^ (n >> 63)
  private def unzigzag(v: Long): Long = (v >>> 1) ^ -(v & 1L)

  private def writeLong(out: java.io.ByteArrayOutputStream, n: Long): Unit = {
    var v = zigzag(n)
    while ((v & ~0x7FL) != 0) {
      out.write(((v & 0x7F) | 0x80).toInt)
      v >>>= 7
    }
    out.write(v.toInt)
  }

  /** Cursor over a byte array — decode state for one block. */
  private final class Cur(val b: Array[Byte], var p: Int) {
    def u8(): Int = {
      if (p >= b.length) fail(s"truncated varint/scalar at byte $p")
      val v = b(p) & 0xFF; p += 1; v
    }
    def long(): Long = {
      var v = 0L; var shift = 0; var x = u8()
      while ((x & 0x80) != 0) {
        v |= (x & 0x7FL) << shift; shift += 7
        if (shift > 63) fail(s"varint too long at byte $p")
        x = u8()
      }
      v |= (x & 0x7FL) << shift
      unzigzag(v)
    }
    def bytes(n: Int): Array[Byte] = {
      if (n < 0 || p + n > b.length)
        fail(s"truncated byte run at $p (want $n, have ${b.length - p})")
      val r = java.util.Arrays.copyOfRange(b, p, p + n); p += n; r
    }
  }

  private def decodeValue(c: Cur, tpe: String): Any = tpe match {
    case "boolean" => c.u8() match {
      case 0 => false
      case 1 => true
      case v => fail(s"boolean byte $v")
    }
    case "int" =>
      val v = c.long()
      if (v < Int.MinValue || v > Int.MaxValue) fail(s"int overflow $v")
      v.toInt
    case "long" => c.long()
    case "float" =>
      val b = c.bytes(4)
      java.lang.Float.intBitsToFloat((b(0) & 0xFF) | ((b(1) & 0xFF) << 8) |
        ((b(2) & 0xFF) << 16) | ((b(3) & 0xFF) << 24))
    case "double" =>
      val b = c.bytes(8)
      java.lang.Double.longBitsToDouble(
        (0 until 8).map(i => (b(i) & 0xFFL) << (8 * i)).reduce(_ | _))
    case "string" => new String(c.bytes(c.long().toInt), "UTF-8")
    case "bytes" => c.bytes(c.long().toInt)
  }

  private def encodeValue(out: java.io.ByteArrayOutputStream, tpe: String,
                          v: Any): Unit = tpe match {
    case "boolean" => out.write(if (v.asInstanceOf[Boolean]) 1 else 0)
    case "int" => writeLong(out, v.asInstanceOf[Int].toLong)
    case "long" => writeLong(out, v.asInstanceOf[Long])
    case "float" =>
      val bits = java.lang.Float.floatToIntBits(v.asInstanceOf[Float])
      (0 until 4).foreach(i => out.write((bits >>> (8 * i)) & 0xFF))
    case "double" =>
      val bits = java.lang.Double.doubleToLongBits(v.asInstanceOf[Double])
      (0 until 8).foreach(i => out.write(((bits >>> (8 * i)) & 0xFF).toInt))
    case "string" =>
      val b = v.asInstanceOf[String].getBytes("UTF-8")
      writeLong(out, b.length.toLong); out.write(b, 0, b.length)
    case "bytes" =>
      val b = v.asInstanceOf[Array[Byte]]
      writeLong(out, b.length.toLong); out.write(b, 0, b.length)
  }

  // --------------------------------------------------------- container

  private val Magic = Array[Byte]('O', 'b', 'j', 1)

  /** Parse one container: (fields, rows) with each row an Array[Any]
    * in schema field order (null for null union branches). */
  def parseContainer(bytes: Array[Byte]): (Seq[Field], Seq[Array[Any]]) =
    try parseContainerImpl(bytes) catch {
      // hostile-input gate (round 16, FuzzSpec): corrupted meta/blocks
      // surface as the loud contract failure, never a JVM artifact
      case e: NumberFormatException =>
        fail(s"malformed container (${e.getMessage})")
      case e: IllegalArgumentException => throw e
      case e @ (_: IndexOutOfBoundsException | _: NegativeArraySizeException |
          _: java.io.IOException | _: java.util.zip.DataFormatException |
          _: NoSuchElementException | _: UnsupportedOperationException) =>
        fail(s"malformed/truncated container " +
          s"(${e.getClass.getSimpleName}: ${e.getMessage})")
    }

  private def parseContainerImpl(bytes: Array[Byte]): (Seq[Field], Seq[Array[Any]]) = {
    if (bytes.length < 4 || !java.util.Arrays.equals(
        java.util.Arrays.copyOfRange(bytes, 0, 4), Magic))
      fail("bad magic (not an Avro object container)")
    val c = new Cur(bytes, 4)
    val meta = mutable.Map.empty[String, Array[Byte]]
    var n = c.long()
    while (n != 0) {
      if (n < 0) { c.long(); n = -n } // block form: skip the byte size
      for (_ <- 0L until n) {
        val k = new String(c.bytes(c.long().toInt), "UTF-8")
        meta(k) = c.bytes(c.long().toInt)
      }
      n = c.long()
    }
    val schemaJson = meta.getOrElse("avro.schema", fail("no avro.schema"))
    val fields = parseSchema(new String(schemaJson, "UTF-8"))
    val codec = meta.get("avro.codec").map(new String(_, "UTF-8"))
      .getOrElse("null")
    if (codec != "null" && codec != "deflate" && codec != "snappy")
      fail(s"unsupported codec $codec (null/deflate/snappy only)")
    val sync = c.bytes(16)
    val rows = Seq.newBuilder[Array[Any]]
    while (c.p < bytes.length) {
      val rowCount = c.long()
      val byteSize = c.long()
      if (rowCount < 0 || byteSize < 0 || byteSize > Int.MaxValue)
        fail(s"bad block framing (rows=$rowCount bytes=$byteSize)")
      val raw = c.bytes(byteSize.toInt)
      val data =
        if (codec == "null") raw
        else if (codec == "snappy") {
          // Avro snappy: raw-format block + 4-byte BIG-endian CRC32
          // of the UNCOMPRESSED data
          if (raw.length < 4) fail("snappy block shorter than its CRC")
          val body = Snappy.uncompress(
            java.util.Arrays.copyOfRange(raw, 0, raw.length - 4))
          val crc = new java.util.zip.CRC32()
          crc.update(body, 0, body.length)
          val want = ((raw(raw.length - 4) & 0xFFL) << 24) |
            ((raw(raw.length - 3) & 0xFFL) << 16) |
            ((raw(raw.length - 2) & 0xFFL) << 8) |
            (raw(raw.length - 1) & 0xFFL)
          if (crc.getValue != want)
            fail(f"snappy block CRC mismatch (got 0x${crc.getValue}%08x, " +
              f"declared 0x$want%08x)")
          body
        }
        else {
          val inf = new Inflater(true) // raw deflate, no zlib wrapper
          inf.setInput(raw)
          val out = new java.io.ByteArrayOutputStream(raw.length * 4)
          val buf = new Array[Byte](8192)
          while (!inf.finished()) {
            val got = inf.inflate(buf)
            // zero progress without finishing = truncated input OR a
            // preset-dictionary stream (needsDictionary) — both are
            // out of contract; never spin silently
            if (got == 0 && !inf.finished())
              fail(if (inf.needsDictionary())
                "deflate block requires a preset dictionary"
              else "truncated deflate block")
            out.write(buf, 0, got)
          }
          inf.end()
          out.toByteArray
        }
      val bc = new Cur(data, 0)
      for (_ <- 0L until rowCount) {
        rows += fields.map { f =>
          if (!f.nullable) decodeValue(bc, f.tpe)
          else {
            val branch = bc.long()
            if (branch != 0 && branch != 1)
              fail(s"union branch $branch for field ${f.name}")
            val isNull = (branch == 0) == f.nullFirst
            if (isNull) null else decodeValue(bc, f.tpe)
          }
        }.toArray
      }
      if (bc.p != data.length)
        fail(s"block decoded ${bc.p} of ${data.length} bytes")
      if (!java.util.Arrays.equals(c.bytes(16), sync))
        fail(s"sync marker mismatch at byte ${c.p - 16}")
    }
    (fields, rows.result())
  }

  /** Encode rows (Array[Any] in field order, null allowed on nullable
    * fields) as one container — REAL varints/unions/sync framing for
    * specs and oracle fixtures. The sync marker derives from the
    * schema+codec (deterministic fixtures, the fixed-seed rule). */
  def encode(schemaJson: String, rows: Seq[Array[Any]],
             deflate: Boolean = false,
             blockRows: Int = 1000): Array[Byte] =
    encodeWithCodec(schemaJson, rows,
      if (deflate) "deflate" else "null", blockRows)

  /** [[encode]] with an explicit codec: null / deflate / snappy
    * (raw-block snappy + the big-endian CRC32 trailer the Avro spec
    * mandates). */
  def encodeWithCodec(schemaJson: String, rows: Seq[Array[Any]],
                      codec: String, blockRows: Int = 1000): Array[Byte] = {
    require(codec == "null" || codec == "deflate" || codec == "snappy",
      s"codec $codec")
    val fields = parseSchema(schemaJson)
    val out = new java.io.ByteArrayOutputStream()
    out.write(Magic, 0, 4)
    val meta = Seq(
      "avro.schema" -> schemaJson.getBytes("UTF-8"),
      "avro.codec" -> codec.getBytes("UTF-8"))
    writeLong(out, meta.size.toLong)
    for ((k, v) <- meta) {
      val kb = k.getBytes("UTF-8")
      writeLong(out, kb.length.toLong); out.write(kb, 0, kb.length)
      writeLong(out, v.length.toLong); out.write(v, 0, v.length)
    }
    writeLong(out, 0L)
    val sync = java.security.MessageDigest.getInstance("MD5")
      .digest((schemaJson + "#" + codec.head).getBytes("UTF-8"))
    out.write(sync, 0, 16)
    for (group <- rows.grouped(blockRows)) {
      val body = new java.io.ByteArrayOutputStream()
      for (r <- group) {
        require(r.length == fields.length,
          s"row arity ${r.length} != schema arity ${fields.length}")
        for ((f, v) <- fields.zip(r)) {
          if (!f.nullable) encodeValue(body, f.tpe, v)
          else if (v == null) writeLong(body, if (f.nullFirst) 0L else 1L)
          else {
            writeLong(body, if (f.nullFirst) 1L else 0L)
            encodeValue(body, f.tpe, v)
          }
        }
      }
      val raw = body.toByteArray
      val data = codec match {
        case "null" => raw
        case "snappy" =>
          val comp = Snappy.compress(raw)
          val crc = new java.util.zip.CRC32()
          crc.update(raw, 0, raw.length)
          val v = crc.getValue
          comp ++ Array(((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
            ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
        case _ =>
          val d = new Deflater(Deflater.DEFAULT_COMPRESSION, true)
          d.setInput(raw); d.finish()
          val o = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](8192)
          while (!d.finished()) o.write(buf, 0, d.deflate(buf))
          d.end()
          o.toByteArray
      }
      writeLong(out, group.size.toLong)
      writeLong(out, data.length.toLong)
      out.write(data, 0, data.length)
      out.write(sync, 0, 16)
    }
    out.toByteArray
  }

  private def sparkType(tpe: String): DataType = tpe match {
    case "boolean" => BooleanType
    case "int" => IntegerType
    case "long" => LongType
    case "float" => FloatType
    case "double" => DoubleType
    case "string" => StringType
    case "bytes" => BinaryType
  }

  /** Streaming read — the continuous-ingest twin of [[read]] (the
    * Warc.readStream shape): new `.avro` container files landing in
    * `path` decode as they arrive. A stream cannot probe a future
    * file, so the schema JSON is an explicit parameter; files whose
    * embedded schema disagrees fail loudly inside the task. */
  def readStream(spark: SparkSession, path: String,
                 schemaJson: String): DataFrame = {
    import spark.implicits._
    val fields = parseSchema(schemaJson)
    val schema = StructType(fields.map(f =>
      StructField(f.name, sparkType(f.tpe), nullable = f.nullable)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val binarySchema = StructType(Seq(
      StructField("path", StringType),
      StructField("modificationTime", TimestampType),
      StructField("length", LongType),
      StructField("content", BinaryType)))
    spark.readStream.format("binaryFile").schema(binarySchema).load(path)
      .select(col("content")).as[Array[Byte]]
      .flatMap { bytes =>
        val (got, rows) = parseContainer(bytes)
        if (got != fields)
          fail(s"schema mismatch in streamed file: $got vs $fields")
        rows.map(r => Row.fromSeq(r.toIndexedSeq))
      }(enc)
  }

  /** Distributed read: one schema probe on the driver (first file's
    * header), then binaryFile → row-local decode; files whose schema
    * disagrees with the probe fail loudly inside the task. Output:
    * the schema's columns, nullable per the union. */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val bf = spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
    val probe = bf.select(col("content")).as[Array[Byte]].head()
    val fields = parseContainer(probe)._1
    val schema = StructType(fields.map(f =>
      StructField(f.name, sparkType(f.tpe), nullable = f.nullable)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    bf.as[(String, Array[Byte])].flatMap { case (_, bytes) =>
      val (got, rows) = parseContainer(bytes)
      if (got != fields)
        fail(s"schema mismatch across files: $got vs $fields")
      rows.map(r => Row.fromSeq(r.toIndexedSeq))
    }(enc)
  }
}
