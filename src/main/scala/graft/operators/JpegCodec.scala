package graft.operators

import org.apache.spark.sql.Dataset

/** Zero-dependency JPEG codec (VERDICT r14 #1) — the PngCodec /
  * GifCodec discipline applied to the DOMINANT real-crawl image
  * format: a real encoder (grayscale baseline sequential, parameterized
  * Huffman tables, optional restart markers and COM segment) and a real
  * decoder for BOTH DCT-Huffman processes — baseline/extended
  * sequential (SOF0/SOF1) and PROGRESSIVE (SOF2, round 15: the full
  * scan algebra — interleaved and single-component DC scans,
  * spectral-band AC scans, successive approximation with EOB runs,
  * restarts inside any scan) — 1–3 components, sampling factors ≤ 2×2
  * incl. 4:2:0/4:2:2, DRI/RSTn, byte-stuffed entropy stream, canonical
  * Huffman, dequantize + separable double IDCT, emitting the LUMA
  * plane. In JPEG the Y channel IS luma, so chroma blocks in
  * interleaved scans are entropy-decoded (the bitstream must advance)
  * but never IDCT'd, and chroma-only progressive AC scans are skipped
  * wholesale (a scan's entropy segment is self-delimited by the next
  * marker).
  *
  * Out-of-contract shapes fail loudly naming the offender: lossless
  * (SOF3/7/11/15), differential (SOF5/6/13/14), arithmetic coding
  * (SOF9/10), hierarchical (DHP), 12-bit precision, 16-bit quant
  * tables, 4-component CMYK/Adobe, non-interleaved multi-scan in a
  * BASELINE frame, sampling factors > 2, truncated entropy data — a
  * corpus pipeline quarantines those rows upstream (the Xls/Warc/Avro
  * contract style).
  *
  * Like mm_phash_real (reference has no image path — this is the
  * mandated multimodal surface), the fixture plants BLOCK-CONSTANT
  * 72×48 images whose encode→decode round-trip is EXACT by
  * construction (flat 8×8 block ⇒ DC-only: DC = 8·(v−128); with
  * quant(DC) = 8 the quantizer divides exactly and the IDCT of a
  * DC-only block is the constant DC/8 — no loss anywhere), so the
  * DuckDB oracle replays the pixel formula analytically while the real
  * Huffman/marker/restart machinery runs in between.
  */
object JpegCodec {

  /** Decoded image: 8-bit luma plane (row-major) + geometry. */
  final case class Decoded(width: Int, height: Int, luma: Array[Int])

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"JPEG: $msg")

  // ----------------------------------------------------------- tables

  /** Natural-order index of zigzag position k (ISO 10918-1 fig. 5). */
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  /** A Huffman table spec: `bits(l)` = number of codes of length l
    * (1-based, l = 1..16), `vals` = symbols in canonical order. */
  final case class HuffSpec(bits: Array[Int], vals: Array[Int]) {
    require(bits.length == 17 && bits(0) == 0, "bits is 1-based [0..16]")
    require(bits.sum == vals.length, "bits/vals cardinality mismatch")
  }

  /** Annex K.3 luminance DC table (categories 0..11). */
  val StdDcLum: HuffSpec = HuffSpec(
    Array(0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0),
    Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11))

  /** Annex K.5 luminance AC table (162 run/size symbols). */
  val StdAcLum: HuffSpec = HuffSpec(
    Array(0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d),
    Array(
      0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
      0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
      0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
      0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0,
      0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16,
      0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
      0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
      0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
      0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
      0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
      0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
      0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
      0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
      0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7,
      0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
      0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5,
      0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4,
      0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
      0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea,
      0xf1, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
      0xf9, 0xfa))

  /** A DIFFERENT valid table from the same code-length profile:
    * symbols reversed within each length group (canonical code
    * assignment then maps each symbol to a different code). Encoding
    * the same coefficients with the reversed tables yields different
    * bytes that must decode identically — the fixture's entropy-layer
    * proof. */
  def reverseGroups(t: HuffSpec): HuffSpec = {
    val out = new Array[Int](t.vals.length)
    var p = 0
    for (l <- 1 to 16) {
      val n = t.bits(l)
      var i = 0
      while (i < n) { out(p + i) = t.vals(p + n - 1 - i); i += 1 }
      p += n
    }
    HuffSpec(t.bits.clone(), out)
  }

  /** Fixture quant table: DC step 8 (divides the flat-block DC
    * 8·(v−128) exactly — the lossless-round-trip key), AC steps 24
    * (irrelevant for flat blocks: their ACs quantize to 0). Natural
    * order. */
  val FixtureQuant: Array[Int] = Array.tabulate(64)(i => if (i == 0) 8 else 24)

  // --------------------------------------------------------- bit I/O

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var n = 0
    def write(bits: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((bits >> i) & 1); n += 1
        if (n == 8) {
          out.write(acc)
          if (acc == 0xFF) out.write(0) // byte stuffing
          acc = 0; n = 0
        }
        i -= 1
      }
    }
    /** Pad the trailing partial byte with 1-bits (F.1.2.3). */
    def flushOnes(): Unit = while (n != 0) write(1, 1)
  }

  private final class BitReader(val data: Array[Byte], var p: Int) {
    private var acc = 0
    private var n = 0
    def bit(): Int = {
      if (n == 0) {
        if (p >= data.length) fail("entropy data truncated")
        var b = data(p) & 0xFF; p += 1
        if (b == 0xFF) {
          if (p >= data.length) fail("entropy data truncated at 0xFF")
          val m = data(p) & 0xFF; p += 1
          if (m == 0x00) b = 0xFF
          else fail(f"marker 0xFF$m%02X inside entropy-coded segment")
        }
        acc = b; n = 8
      }
      n -= 1
      (acc >> n) & 1
    }
    def receive(len: Int): Int = {
      var v = 0; var i = 0
      while (i < len) { v = (v << 1) | bit(); i += 1 }
      v
    }
    /** Byte-align and consume the expected RSTm marker. */
    def expectRst(m: Int): Unit = {
      n = 0
      if (p + 2 > data.length) fail("truncated at restart marker")
      val b0 = data(p) & 0xFF; val b1 = data(p + 1) & 0xFF
      if (b0 != 0xFF || b1 != 0xD0 + m)
        fail(f"expected RST$m, got 0x$b0%02X$b1%02X")
      p += 2
    }
  }

  // ------------------------------------------------------------- DCT

  // COS(x)(u) = cos((2x+1)·u·π/16); CU(u) = 1/√2 for u=0 else 1
  private val Cos: Array[Array[Double]] = Array.tabulate(8, 8) { (x, u) =>
    math.cos((2 * x + 1) * u * math.Pi / 16)
  }
  private val Cu: Array[Double] =
    Array.tabulate(8)(u => if (u == 0) 1.0 / math.sqrt(2.0) else 1.0)

  /** Separable forward DCT of one level-shifted 8×8 block (doubles
    * in natural order), S(v·8+u) = C(u)C(v)/4 · Σ s·cos·cos. */
  private def fdct(in: Array[Double]): Array[Double] = {
    val tmp = new Array[Double](64)
    var y = 0
    while (y < 8) { // 1-D over rows
      var u = 0
      while (u < 8) {
        var s = 0.0; var x = 0
        while (x < 8) { s += in(y * 8 + x) * Cos(x)(u); x += 1 }
        tmp(y * 8 + u) = s * Cu(u) / 2
        u += 1
      }
      y += 1
    }
    val out = new Array[Double](64)
    var u = 0
    while (u < 8) { // 1-D over columns
      var v = 0
      while (v < 8) {
        var s = 0.0; var yy = 0
        while (yy < 8) { s += tmp(yy * 8 + u) * Cos(yy)(v); yy += 1 }
        out(v * 8 + u) = s * Cu(v) / 2
        v += 1
      }
      u += 1
    }
    out
  }

  /** Separable inverse DCT of one dequantized block (ints, natural
    * order) to clamped 8-bit samples. A DC-only block short-circuits
    * to its exact constant — both the fixture fast path and the exact
    * arithmetic the analytic oracle relies on. */
  private def idct(coef: Array[Int], nAc: Int, out: Array[Int]): Unit = {
    if (nAc == 0) {
      val v = clamp8(math.round(coef(0) / 8.0).toInt + 128)
      java.util.Arrays.fill(out, v)
      return
    }
    val tmp = new Array[Double](64)
    var v = 0
    while (v < 8) { // 1-D over coefficient rows
      var x = 0
      while (x < 8) {
        var s = 0.0; var u = 0
        while (u < 8) { s += Cu(u) / 2 * coef(v * 8 + u) * Cos(x)(u); u += 1 }
        tmp(v * 8 + x) = s
        x += 1
      }
      v += 1
    }
    var x = 0
    while (x < 8) { // 1-D over columns
      var yy = 0
      while (yy < 8) {
        var s = 0.0; var vv = 0
        while (vv < 8) { s += Cu(vv) / 2 * tmp(vv * 8 + x) * Cos(yy)(vv); vv += 1 }
        out(yy * 8 + x) = clamp8(math.round(s).toInt + 128)
        yy += 1
      }
      x += 1
    }
  }

  private def clamp8(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  // ---------------------------------------------------------- encode

  private def categoryOf(v: Int): Int =
    32 - Integer.numberOfLeadingZeros(math.abs(v))

  /** Encode an 8-bit grayscale image as baseline sequential JPEG
    * (JFIF): one component, the given quant table (natural order) and
    * Huffman specs, optional restart interval (MCUs) and COM segment.
    * Edge blocks pad by clamp-replication. */
  def encodeGray(w: Int, h: Int, px: Array[Byte], quant: Array[Int],
                 dcSpec: HuffSpec = StdDcLum, acSpec: HuffSpec = StdAcLum,
                 restartInterval: Int = 0,
                 comment: String = null): Array[Byte] = {
    require(w > 0 && h > 0 && px.length == w * h, "bad geometry")
    require(quant.length == 64 && quant.forall(q => q >= 1 && q <= 255),
      "quant table must be 64 byte-range steps")
    val out = new java.io.ByteArrayOutputStream(w * h / 2 + 1024)
    def marker(m: Int): Unit = { out.write(0xFF); out.write(m) }
    def seg(m: Int, body: Array[Byte]): Unit = {
      marker(m)
      val len = body.length + 2
      out.write(len >> 8); out.write(len & 0xFF); out.write(body, 0, body.length)
    }
    marker(0xD8) // SOI
    seg(0xE0, "JFIF".getBytes("US-ASCII") ++
      Array[Byte](0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    if (comment != null) seg(0xFE, comment.getBytes("US-ASCII"))
    seg(0xDB, (Array(0x00) ++ (0 until 64).map(k => quant(Zigzag(k))))
      .map(_.toByte)) // Pq=0 Tq=0, zigzag order
    seg(0xC0, Array(8, h >> 8, h & 0xFF, w >> 8, w & 0xFF, 1,
      1, 0x11, 0).map(_.toByte)) // SOF0: 8-bit, 1 comp, 1×1, quant 0
    def dht(cls: Int, spec: HuffSpec): Unit =
      seg(0xC4, (Array(cls << 4) ++ (1 to 16).map(spec.bits) ++ spec.vals)
        .map(_.toByte))
    dht(0, dcSpec); dht(1, acSpec)
    if (restartInterval > 0)
      seg(0xDD, Array(restartInterval >> 8, restartInterval & 0xFF)
        .map(_.toByte))
    seg(0xDA, Array(1, 1, 0x00, 0, 63, 0).map(_.toByte)) // SOS

    // canonical code assignment: (code, len) per symbol
    def codesOf(spec: HuffSpec): Array[(Int, Int)] = {
      val m = new Array[(Int, Int)](256)
      var code = 0; var p = 0
      for (l <- 1 to 16) {
        var i = 0
        while (i < spec.bits(l)) { m(spec.vals(p)) = (code, l); code += 1; p += 1; i += 1 }
        code <<= 1
      }
      m
    }
    val dcCodes = codesOf(dcSpec); val acCodes = codesOf(acSpec)
    val bw = new BitWriter(out)
    def emit(codes: Array[(Int, Int)], sym: Int): Unit = {
      val c = codes(sym)
      if (c == null) fail(s"symbol 0x${sym.toHexString} not in Huffman table")
      bw.write(c._1, c._2)
    }
    def emitMagnitude(v: Int, s: Int): Unit =
      if (s > 0) bw.write(if (v < 0) v + (1 << s) - 1 else v, s)

    val mcusX = (w + 7) / 8; val mcusY = (h + 7) / 8
    var pred = 0
    var rstIdx = 0
    var sinceRst = 0
    val in = new Array[Double](64)
    var my = 0
    var mcu = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && mcu > 0 && sinceRst == restartInterval) {
          bw.flushOnes()
          out.write(0xFF); out.write(0xD0 + rstIdx)
          rstIdx = (rstIdx + 1) & 7
          pred = 0; sinceRst = 0
        }
        var j = 0
        while (j < 64) {
          val x = math.min(mx * 8 + (j & 7), w - 1)
          val y = math.min(my * 8 + (j >> 3), h - 1)
          in(j) = (px(y * w + x) & 0xFF) - 128.0
          j += 1
        }
        val s = fdct(in)
        // quantize in zigzag order
        val q = new Array[Int](64)
        var k = 0
        while (k < 64) {
          q(k) = math.round(s(Zigzag(k)) / quant(Zigzag(k))).toInt
          k += 1
        }
        val diff = q(0) - pred; pred = q(0)
        val dcat = categoryOf(diff)
        emit(dcCodes, dcat); emitMagnitude(diff, dcat)
        var run = 0
        k = 1
        while (k < 64) {
          if (q(k) == 0) run += 1
          else {
            while (run > 15) { emit(acCodes, 0xF0); run -= 16 } // ZRL
            val sz = categoryOf(q(k))
            emit(acCodes, (run << 4) | sz); emitMagnitude(q(k), sz)
            run = 0
          }
          k += 1
        }
        if (run > 0) emit(acCodes, 0x00) // EOB
        sinceRst += 1
        mcu += 1
        mx += 1
      }
      my += 1
    }
    bw.flushOnes()
    marker(0xD9) // EOI
    out.toByteArray
  }

  /** Encode an 8-bit grayscale image as PROGRESSIVE JPEG (SOF2) in
    * the simplest legal progression — spectral selection only, no
    * successive approximation: scan 1 carries every block's DC (diff
    * coding, exactly the sequential scheme), scan 2 the full 1..63 AC
    * band (run/size coding with EOB0 block terminators). The
    * quantized coefficients are IDENTICAL to [[encodeGray]]'s, so a
    * progressive re-encode of the same pixels decodes bit-for-bit
    * equal to the baseline encoding — which is what the
    * mm_phash_jpeg_prog fixture proves in-engine. */
  def encodeGrayProgressive(w: Int, h: Int, px: Array[Byte],
                            quant: Array[Int],
                            dcSpec: HuffSpec = StdDcLum,
                            acSpec: HuffSpec = StdAcLum,
                            comment: String = null): Array[Byte] = {
    require(w > 0 && h > 0 && px.length == w * h, "bad geometry")
    val out = new java.io.ByteArrayOutputStream(w * h / 2 + 1024)
    def marker(m: Int): Unit = { out.write(0xFF); out.write(m) }
    def seg(m: Int, body: Array[Byte]): Unit = {
      marker(m)
      val len = body.length + 2
      out.write(len >> 8); out.write(len & 0xFF); out.write(body, 0, body.length)
    }
    marker(0xD8)
    seg(0xE0, "JFIF".getBytes("US-ASCII") ++
      Array[Byte](0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    if (comment != null) seg(0xFE, comment.getBytes("US-ASCII"))
    seg(0xDB, (Array(0x00) ++ (0 until 64).map(k => quant(Zigzag(k))))
      .map(_.toByte))
    seg(0xC2, Array(8, h >> 8, h & 0xFF, w >> 8, w & 0xFF, 1,
      1, 0x11, 0).map(_.toByte)) // SOF2
    def dht(cls: Int, spec: HuffSpec): Unit =
      seg(0xC4, (Array(cls << 4) ++ (1 to 16).map(spec.bits) ++ spec.vals)
        .map(_.toByte))
    dht(0, dcSpec); dht(1, acSpec)

    def codesOf(spec: HuffSpec): Array[(Int, Int)] = {
      val m = new Array[(Int, Int)](256)
      var code = 0; var p = 0
      for (l <- 1 to 16) {
        var i = 0
        while (i < spec.bits(l)) { m(spec.vals(p)) = (code, l); code += 1; p += 1; i += 1 }
        code <<= 1
      }
      m
    }
    val dcCodes = codesOf(dcSpec); val acCodes = codesOf(acSpec)

    // all blocks' quantized coefficients, zigzag order
    val bw = (w + 7) / 8; val bh = (h + 7) / 8
    val in = new Array[Double](64)
    val blocks = Array.tabulate(bh * bw) { b =>
      val mx = b % bw; val my = b / bw
      var j = 0
      while (j < 64) {
        val x = math.min(mx * 8 + (j & 7), w - 1)
        val y = math.min(my * 8 + (j >> 3), h - 1)
        in(j) = (px(y * w + x) & 0xFF) - 128.0
        j += 1
      }
      val s = fdct(in)
      Array.tabulate(64)(k => math.round(s(Zigzag(k)) / quant(Zigzag(k))).toInt)
    }

    // scan 1: DC, Ss=0 Se=0 Ah=0 Al=0
    seg(0xDA, Array(1, 1, 0x00, 0, 0, 0).map(_.toByte))
    var bwr = new BitWriter(out)
    def emit(codes: Array[(Int, Int)], sym: Int): Unit = {
      val c = codes(sym)
      if (c == null) fail(s"symbol 0x${sym.toHexString} not in Huffman table")
      bwr.write(c._1, c._2)
    }
    def emitMagnitude(v: Int, s: Int): Unit =
      if (s > 0) bwr.write(if (v < 0) v + (1 << s) - 1 else v, s)
    var pred = 0
    blocks.foreach { q =>
      val diff = q(0) - pred; pred = q(0)
      val dcat = categoryOf(diff)
      emit(dcCodes, dcat); emitMagnitude(diff, dcat)
    }
    bwr.flushOnes()

    // scan 2: AC band 1..63, Ah=0 Al=0 (EOB0 per block with trailing
    // zeros — the progressive EOBn family at run length 1)
    seg(0xDA, Array(1, 1, 0x00, 1, 63, 0).map(_.toByte))
    bwr = new BitWriter(out)
    blocks.foreach { q =>
      var run = 0
      var k = 1
      while (k < 64) {
        if (q(k) == 0) run += 1
        else {
          while (run > 15) { emit(acCodes, 0xF0); run -= 16 }
          val sz = categoryOf(q(k))
          emit(acCodes, (run << 4) | sz); emitMagnitude(q(k), sz)
          run = 0
        }
        k += 1
      }
      if (run > 0) emit(acCodes, 0x00) // EOB0
    }
    bwr.flushOnes()
    marker(0xD9)
    out.toByteArray
  }

  // ---------------------------------------------------------- decode

  private final class HuffDec(spec: (Array[Int], Array[Int])) {
    val (bits, vals) = spec
    val minCode = new Array[Int](17)
    val maxCode = Array.fill(17)(-1)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0; var p = 0
      for (l <- 1 to 16) {
        if (bits(l) > 0) {
          valPtr(l) = p; minCode(l) = code
          code += bits(l); p += bits(l)
          maxCode(l) = code - 1
        }
        code <<= 1
      }
    }
    def decode(br: BitReader): Int = {
      var code = br.bit(); var l = 1
      while (code > maxCode(l)) {
        if (l >= 16) fail("invalid Huffman code")
        code = (code << 1) | br.bit(); l += 1
      }
      vals(valPtr(l) + code - minCode(l))
    }
  }

  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  private case class Comp(id: Int, hs: Int, vs: Int, tq: Int)

  /** Decode a baseline OR progressive JPEG to its luma plane (= the Y
    * component, nearest-neighbor replicated to full geometry if
    * subsampled — which real files never do for Y). The decoder is
    * coefficient-buffered: every scan accumulates quantized-domain
    * coefficients for the FIRST frame component (Y); chroma blocks in
    * interleaved scans are entropy-decoded to keep the bitstream in
    * step, and chroma-only progressive AC scans are SKIPPED wholesale
    * (a scan's entropy segment is self-delimited by the next marker).
    * Dequantize + IDCT run once at the end. Progressive support
    * (round 15) covers the full SOF2 scan algebra: interleaved and
    * single-component DC scans, spectral-band AC scans, successive
    * approximation (Ah/Al) for both, EOB runs, and restart markers
    * inside any scan type. */
  def decode(jpeg: Array[Byte]): Decoded =
    try decodeImpl(jpeg) catch {
      // hostile-input gate (round 16, FuzzSpec): structural reads on
      // truncated/bit-flipped bytes must surface as the loud contract
      // failure, never an escaped JVM artifact
      case e: NumberFormatException =>
        fail(s"malformed stream (${e.getMessage})")
      case e: IllegalArgumentException => throw e
      case e @ (_: IndexOutOfBoundsException |
          _: NegativeArraySizeException) =>
        fail(s"malformed/truncated stream " +
          s"(${e.getClass.getSimpleName}: ${e.getMessage})")
    }

  private def decodeImpl(jpeg: Array[Byte]): Decoded = {
    if (jpeg.length < 4 || (jpeg(0) & 0xFF) != 0xFF || (jpeg(1) & 0xFF) != 0xD8)
      fail("missing SOI")
    var p = 2
    val quant = new Array[Array[Int]](4) // zigzag order
    val dcTabs = new Array[HuffDec](4)
    val acTabs = new Array[HuffDec](4)
    var restartInterval = 0
    var width = -1; var height = -1
    var comps: Array[Comp] = null
    var progressive = false
    var maxH = 1; var maxV = 1
    var mcusX = 0; var mcusY = 0
    var bwPad = 0; var bhPad = 0 // Y block grid, padded to MCU multiples
    var coefY: Array[Int] = null // quantized-domain coefficients, natural order
    var sawScan = false
    var orientation = 1 // Exif APP1 tag 0x0112, normalized after decode
    def u16(off: Int): Int = ((jpeg(off) & 0xFF) << 8) | (jpeg(off + 1) & 0xFF)

    /** Position of the next true marker at/after `from` (skips
      * stuffed 0x00, fill 0xFFs and RSTn inside entropy data). */
    def nextMarker(from: Int): Int = {
      var q = from
      while (true) {
        if (q + 2 > jpeg.length) fail("truncated inside scan")
        if ((jpeg(q) & 0xFF) != 0xFF) q += 1
        else {
          val m = jpeg(q + 1) & 0xFF
          if (m == 0xFF) q += 1 // fill byte
          else if (m == 0x00 || (m >= 0xD0 && m <= 0xD7)) q += 2
          else return q
        }
      }
      -1 // unreachable
    }

    /** Decode one SOS (header at `sosAt`, 2 past the marker); returns
      * the position of the next marker. */
    def decodeScan(sosAt: Int): Int = {
      val sosLen = u16(sosAt)
      val ns = jpeg(sosAt + 2) & 0xFF
      if (sosLen != 6 + 2 * ns) fail("bad SOS length")
      if (comps == null) fail("SOS before SOF")
      if (!progressive && ns != comps.length)
        fail(s"non-interleaved multi-scan out of contract " +
          s"($ns of ${comps.length} components in scan)")
      case class ScanComp(comp: Comp, compIdx: Int, dc: HuffDec, ac: HuffDec)
      val ss = jpeg(sosAt + 3 + 2 * ns) & 0xFF
      val se = jpeg(sosAt + 4 + 2 * ns) & 0xFF
      val ah = (jpeg(sosAt + 5 + 2 * ns) & 0xFF) >> 4
      val al = jpeg(sosAt + 5 + 2 * ns) & 0x0F
      val scan = Array.tabulate(ns) { i =>
        val o = sosAt + 3 + 2 * i
        val cid = jpeg(o) & 0xFF
        val ci = comps.indexWhere(_.id == cid)
        if (ci < 0) fail(s"scan component $cid not in frame")
        val td = (jpeg(o + 1) & 0xFF) >> 4; val ta = jpeg(o + 1) & 0x0F
        val needDc = ss == 0 && !(progressive && ah > 0)
        val needAc = se > 0
        if (needDc && dcTabs(td) == null) fail(s"DC Huffman table $td undefined")
        if (needAc && acTabs(ta) == null) fail(s"AC Huffman table $ta undefined")
        ScanComp(comps(ci), ci, dcTabs(td), acTabs(ta))
      }
      if (!progressive) {
        if (ss != 0 || se != 63 || ah != 0 || al != 0)
          fail("spectral selection in a baseline frame out of contract")
      } else {
        if (ss == 0 && se != 0) fail("progressive DC scan with Se != 0")
        if (ss > 0 && ns != 1) fail("interleaved progressive AC scan")
        if (ss > se || se > 63) fail(s"bad spectral band $ss..$se")
      }
      scan.foreach { sc =>
        if (quant(sc.comp.tq) == null) fail(s"quant table ${sc.comp.tq} undefined")
      }
      sawScan = true

      // chroma-only progressive AC scan: self-delimited — skip it
      if (progressive && ss > 0 && scan(0).compIdx != 0)
        return nextMarker(sosAt + sosLen)

      val br = new BitReader(jpeg, sosAt + sosLen)
      val preds = new Array[Int](comps.length)
      var eobrun = 0
      var rstIdx = 0
      var sinceRst = 0
      val p1 = 1 << al
      val m1 = -(1 << al)
      val scratch = new Array[Int](64) // non-kept baseline blocks land here

      def coefAt(compIdx: Int, colBlk: Int, rowBlk: Int): Array[Int] =
        if (compIdx == 0) coefY else scratch
      def coefOff(compIdx: Int, colBlk: Int, rowBlk: Int): Int =
        if (compIdx == 0) (rowBlk * bwPad + colBlk) * 64 else 0

      def applyCorrection(c: Array[Int], off: Int, idx: Int): Unit =
        if (c(off + idx) != 0 && br.bit() == 1 && (c(off + idx) & p1) == 0)
          c(off + idx) += (if (c(off + idx) >= 0) p1 else m1)

      /** One block of this scan for scan-component `sc` at block grid
        * (colBlk, rowBlk) of ITS component. */
      def decodeBlockUnit(sc: ScanComp, colBlk: Int, rowBlk: Int): Unit = {
        val keep = sc.compIdx == 0
        val c = coefAt(sc.compIdx, colBlk, rowBlk)
        val off = coefOff(sc.compIdx, colBlk, rowBlk)
        if (!keep && !progressive) java.util.Arrays.fill(scratch, 0)
        if (ss == 0 && (!progressive || ah == 0)) {
          // DC (baseline, or progressive DC initial)
          val dcat = sc.dc.decode(br)
          if (dcat > 11) fail(s"DC category $dcat invalid")
          val diff = extend(br.receive(dcat), dcat)
          preds(sc.compIdx) += diff
          c(off) = preds(sc.compIdx) << al // al = 0 for baseline
        } else if (ss == 0) {
          // progressive DC refinement: one raw bit per block
          if (br.bit() == 1) c(off) |= p1
        }
        if (!progressive && se == 63) {
          // baseline AC 1..63
          var k = 1
          while (k < 64) {
            val rs = sc.ac.decode(br)
            val r = rs >> 4; val sz = rs & 15
            if (sz == 0) {
              if (r == 15) k += 16 // ZRL
              else k = 64 // EOB
            } else {
              k += r
              if (k > 63) fail("AC run past end of block")
              c(off + Zigzag(k)) = extend(br.receive(sz), sz)
              k += 1
            }
          }
        } else if (progressive && ss > 0 && ah == 0) {
          // progressive AC initial (band ss..se, scaled by 2^al)
          if (eobrun > 0) eobrun -= 1
          else {
            var k = ss
            while (k <= se) {
              val rs = sc.ac.decode(br)
              val r = rs >> 4; val sz = rs & 15
              if (sz == 0) {
                if (r == 15) k += 16 // ZRL
                else {
                  eobrun = (1 << r) - 1 + (if (r > 0) br.receive(r) else 0)
                  k = se + 1
                }
              } else {
                k += r
                if (k > se) fail("AC run past end of band")
                c(off + Zigzag(k)) = extend(br.receive(sz), sz) << al
                k += 1
              }
            }
          }
        } else if (progressive && ss > 0) {
          // progressive AC refinement (G.1.2.3 / libjpeg algorithm)
          var k = ss
          if (eobrun == 0) {
            var brk = false
            while (k <= se && !brk) {
              val rs = sc.ac.decode(br)
              var r = rs >> 4; val sz = rs & 15
              var newval = 0
              if (sz != 0) {
                if (sz != 1) fail("AC refinement magnitude != 1")
                newval = if (br.bit() == 1) p1 else m1
              } else if (r != 15) {
                eobrun = (1 << r) + (if (r > 0) br.receive(r) else 0)
                brk = true
              }
              if (!brk) {
                var placed = false
                while (!placed && k <= se) {
                  val idx = Zigzag(k)
                  if (c(off + idx) != 0) applyCorrection(c, off, idx)
                  else if (r == 0) {
                    if (newval != 0) c(off + idx) = newval
                    placed = true
                  } else r -= 1
                  k += 1
                }
              }
            }
          }
          if (eobrun > 0) {
            while (k <= se) { applyCorrection(c, off, Zigzag(k)); k += 1 }
            eobrun -= 1
          }
        }
      }

      def maybeRestart(unit: Int): Unit =
        if (restartInterval > 0 && unit > 0 && sinceRst == restartInterval) {
          br.expectRst(rstIdx)
          rstIdx = (rstIdx + 1) & 7
          java.util.Arrays.fill(preds, 0)
          eobrun = 0
          sinceRst = 0
        }

      if (ns > 1) {
        // interleaved (spec: multi-component scans only): the MCU grid
        var mcu = 0
        val nMcus = mcusX * mcusY
        while (mcu < nMcus) {
          maybeRestart(mcu)
          val mx = mcu % mcusX; val my = mcu / mcusX
          var si = 0
          while (si < scan.length) {
            val sc = scan(si)
            var by = 0
            while (by < sc.comp.vs) {
              var bx = 0
              while (bx < sc.comp.hs) {
                decodeBlockUnit(sc, mx * sc.comp.hs + bx, my * sc.comp.vs + by)
                bx += 1
              }
              by += 1
            }
            si += 1
          }
          sinceRst += 1
          mcu += 1
        }
      } else {
        // single-component non-interleaved: the component's OWN block
        // grid, ceil(compW/8) × ceil(compH/8) (NOT padded to MCUs)
        val sc = scan(0)
        val compW = (width * sc.comp.hs + maxH - 1) / maxH
        val compH = (height * sc.comp.vs + maxV - 1) / maxV
        val bw = (compW + 7) / 8
        val bh = (compH + 7) / 8
        var unit = 0
        var rowBlk = 0
        while (rowBlk < bh) {
          var colBlk = 0
          while (colBlk < bw) {
            maybeRestart(unit)
            decodeBlockUnit(sc, colBlk, rowBlk)
            sinceRst += 1
            unit += 1
            colBlk += 1
          }
          rowBlk += 1
        }
      }
      nextMarker(br.p)
    }

    var eoi = false
    while (!eoi) {
      if (p + 2 > jpeg.length) fail("truncated before EOI")
      if ((jpeg(p) & 0xFF) != 0xFF) fail(f"expected marker at $p")
      var m = jpeg(p + 1) & 0xFF
      while (m == 0xFF) { // fill bytes
        p += 1
        if (p + 2 > jpeg.length) fail("truncated in marker fill bytes")
        m = jpeg(p + 1) & 0xFF
      }
      p += 2
      m match {
        case 0xC0 | 0xC1 | 0xC2 => // baseline / ext-sequential / progressive
          val len = u16(p)
          val prec = jpeg(p + 2) & 0xFF
          if (prec != 8) fail(s"$prec-bit precision out of contract")
          progressive = m == 0xC2
          height = u16(p + 3); width = u16(p + 5)
          val nf = jpeg(p + 7) & 0xFF
          if (nf == 4) fail("4-component (CMYK/Adobe) out of contract")
          if (nf < 1 || nf > 3) fail(s"$nf-component frame out of contract")
          if (len != 8 + 3 * nf) fail("bad SOF length")
          comps = Array.tabulate(nf) { i =>
            val o = p + 8 + 3 * i
            val c = Comp(jpeg(o) & 0xFF, (jpeg(o + 1) & 0xFF) >> 4,
              jpeg(o + 1) & 0x0F, jpeg(o + 2) & 0xFF)
            if (c.hs < 1 || c.hs > 2 || c.vs < 1 || c.vs > 2)
              fail(s"sampling factor ${c.hs}x${c.vs} out of contract")
            c
          }
          maxH = comps.map(_.hs).max; maxV = comps.map(_.vs).max
          mcusX = (width + 8 * maxH - 1) / (8 * maxH)
          mcusY = (height + 8 * maxV - 1) / (8 * maxV)
          bwPad = mcusX * comps(0).hs
          bhPad = mcusY * comps(0).vs
          coefY = new Array[Int](bwPad * bhPad * 64)
          p += len
        case 0xC3 | 0xC7 | 0xCB | 0xCF =>
          fail(f"lossless JPEG (SOF 0x$m%02X) out of contract")
        case 0xC5 | 0xC6 | 0xCD | 0xCE =>
          fail(f"differential JPEG (SOF 0x$m%02X) out of contract")
        case 0xC9 | 0xCA =>
          fail("arithmetic-coded JPEG out of contract")
        case 0xDE => fail("hierarchical JPEG (DHP) out of contract")
        case 0xDB => // DQT — possibly several tables per segment
          val len = u16(p); var q = p + 2
          while (q < p + len) {
            val pq = (jpeg(q) & 0xFF) >> 4; val tq = jpeg(q) & 0x0F
            if (pq != 0) fail("16-bit quant table out of contract")
            if (q + 65 > p + len) fail("truncated DQT")
            quant(tq) = Array.tabulate(64)(k => jpeg(q + 1 + k) & 0xFF)
            q += 65
          }
          p += len
        case 0xC4 => // DHT — possibly several tables per segment
          val len = u16(p); var q = p + 2
          while (q < p + len) {
            val cls = (jpeg(q) & 0xFF) >> 4; val id = jpeg(q) & 0x0F
            if (cls > 1 || id > 3) fail("bad DHT header")
            val bits = new Array[Int](17)
            var tot = 0
            for (l <- 1 to 16) { bits(l) = jpeg(q + l) & 0xFF; tot += bits(l) }
            if (q + 17 + tot > p + len) fail("truncated DHT")
            val vals = Array.tabulate(tot)(i => jpeg(q + 17 + i) & 0xFF)
            val t = new HuffDec((bits, vals))
            if (cls == 0) dcTabs(id) = t else acTabs(id) = t
            q += 17 + tot
          }
          p += len
        case 0xDD =>
          if (u16(p) != 4) fail("bad DRI length")
          restartInterval = u16(p + 2)
          p += 4
        case 0xDA => p = decodeScan(p)
        case 0xD9 => eoi = true
        case 0xDC => fail("DNL out of contract")
        case 0xE1 => // APP1: Exif orientation (round 16, VERDICT r15 #5)
          val len = u16(p)
          if (p + len > jpeg.length) fail("truncated APP1")
          parseExifOrientation(jpeg, p + 2, len - 2)
            .foreach(o => orientation = o)
          p += len
        case _ if m >= 0xE0 && m <= 0xEF => p += u16(p) // APPn
        case 0xFE => p += u16(p) // COM
        case other => fail(f"unexpected marker 0xFF$other%02X")
      }
    }
    if (comps == null) fail("missing SOF")
    if (!sawScan) fail("EOI before SOS")

    // dequantize + IDCT the Y blocks, assemble the padded plane, crop
    val y0 = comps(0)
    val qt = quant(y0.tq)
    val planeW = bwPad * 8
    val plane = new Array[Int](bwPad * 8 * bhPad * 8)
    val dq = new Array[Int](64)
    val block = new Array[Int](64)
    var rowBlk = 0
    while (rowBlk < bhPad) {
      var colBlk = 0
      while (colBlk < bwPad) {
        val off = (rowBlk * bwPad + colBlk) * 64
        var nAc = 0
        var k = 0
        while (k < 64) {
          val idx = Zigzag(k)
          dq(idx) = coefY(off + idx) * qt(k)
          if (idx != 0 && dq(idx) != 0) nAc += 1
          k += 1
        }
        idct(dq, nAc, block)
        val px0 = colBlk * 8; val py0 = rowBlk * 8
        var j = 0
        while (j < 64) {
          plane((py0 + (j >> 3)) * planeW + px0 + (j & 7)) = block(j)
          j += 1
        }
        colBlk += 1
      }
      rowBlk += 1
    }
    val luma = new Array[Int](width * height)
    var y = 0
    while (y < height) {
      val sy = y * y0.vs / maxV
      var x = 0
      while (x < width) {
        luma(y * width + x) = plane(sy * planeW + x * y0.hs / maxH)
        x += 1
      }
      y += 1
    }
    normalizeOrientation(Decoded(width, height, luma), orientation)
  }

  /** Exif orientation tag (0x0112) from an APP1 payload, or None when
    * the payload is not Exif (XMP also rides APP1). A payload that IS
    * Exif but structurally broken fails loudly; a present orientation
    * outside 1–8 fails loudly. */
  private def parseExifOrientation(b: Array[Byte], off: Int,
                                   n: Int): Option[Int] = {
    if (n < 6 || b(off) != 'E' || b(off + 1) != 'x' || b(off + 2) != 'i' ||
        b(off + 3) != 'f' || b(off + 4) != 0 || b(off + 5) != 0)
      return None
    val t = off + 6 // TIFF header
    if (n < 14) fail("truncated Exif TIFF header")
    val le = (b(t) & 0xFF, b(t + 1) & 0xFF) match {
      case ('I', 'I') => true
      case ('M', 'M') => false
      case _ => fail("bad Exif byte-order mark")
    }
    def u16(o: Int): Int = {
      if (o + 2 > off + n) fail("truncated Exif IFD")
      if (le) (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
      else ((b(o) & 0xFF) << 8) | (b(o + 1) & 0xFF)
    }
    def u32(o: Int): Long = {
      if (o + 4 > off + n) fail("truncated Exif IFD")
      if (le) (b(o) & 0xFFL) | ((b(o + 1) & 0xFFL) << 8) |
        ((b(o + 2) & 0xFFL) << 16) | ((b(o + 3) & 0xFFL) << 24)
      else ((b(o) & 0xFFL) << 24) | ((b(o + 1) & 0xFFL) << 16) |
        ((b(o + 2) & 0xFFL) << 8) | (b(o + 3) & 0xFFL)
    }
    if (u16(t + 2) != 42) fail("bad Exif TIFF magic")
    val ifd = t + u32(t + 4).toInt
    val count = u16(ifd)
    var i = 0
    while (i < count) {
      val e = ifd + 2 + 12 * i
      if (u16(e) == 0x0112) {
        if (u16(e + 2) != 3) fail("Exif orientation is not SHORT")
        val o = u16(e + 8) // SHORT value sits in the field's first 2 bytes
        if (o < 1 || o > 8) fail(s"Exif orientation $o out of range")
        return Some(o)
      }
      i += 1
    }
    None
  }

  /** Rotate/flip decoded luma so dHash sees the UPRIGHT image — the
    * to-display operation of Exif orientations 1–8 (5/7 are the
    * transpose/transverse diagonals; 5–8 swap width and height), so
    * rotated re-posts of one image collide in mm_phash_jpeg. */
  private def normalizeOrientation(d: Decoded, o: Int): Decoded = {
    if (o == 1) return d
    val (w, h) = (d.width, d.height)
    val swap = o >= 5
    val (nw, nh) = if (swap) (h, w) else (w, h)
    val out = new Array[Int](w * h)
    var y = 0
    while (y < nh) {
      var x = 0
      while (x < nw) {
        val (sx, sy) = o match {
          case 2 => (w - 1 - x, y) // flip horizontal
          case 3 => (w - 1 - x, h - 1 - y) // rotate 180
          case 4 => (x, h - 1 - y) // flip vertical
          case 5 => (y, x) // transpose
          case 6 => (y, h - 1 - x) // rotate 90 CW to display
          case 7 => (w - 1 - y, h - 1 - x) // transverse
          case 8 => (w - 1 - y, x) // rotate 270 CW to display
          case other => fail(s"Exif orientation $other out of range")
        }
        out(y * nw + x) = d.luma(sy * w + sx)
        x += 1
      }
      y += 1
    }
    Decoded(nw, nh, out)
  }

  /** Splice an APP1 Exif segment carrying orientation right after SOI
    * — the fixture hook for planting rotated re-posts ([[synthJpegs]])
    * and the spec hook for pinning all 8 orientations in both TIFF
    * byte orders. */
  def withExifOrientation(jpeg: Array[Byte], orientation: Int,
                          bigEndian: Boolean = false): Array[Byte] = {
    require(orientation >= 1 && orientation <= 8, s"orientation $orientation")
    require(jpeg.length >= 2 && (jpeg(0) & 0xFF) == 0xFF &&
      (jpeg(1) & 0xFF) == 0xD8, "not a JPEG")
    val tiff = new Array[Byte](26)
    def put16(o: Int, v: Int): Unit =
      if (bigEndian) { tiff(o) = (v >> 8).toByte; tiff(o + 1) = v.toByte }
      else { tiff(o) = v.toByte; tiff(o + 1) = (v >> 8).toByte }
    def put32(o: Int, v: Int): Unit =
      if (bigEndian) {
        tiff(o) = (v >> 24).toByte; tiff(o + 1) = (v >> 16).toByte
        tiff(o + 2) = (v >> 8).toByte; tiff(o + 3) = v.toByte
      } else {
        tiff(o) = v.toByte; tiff(o + 1) = (v >> 8).toByte
        tiff(o + 2) = (v >> 16).toByte; tiff(o + 3) = (v >> 24).toByte
      }
    tiff(0) = (if (bigEndian) 'M' else 'I').toByte
    tiff(1) = tiff(0)
    put16(2, 42); put32(4, 8) // magic, IFD0 at byte 8
    put16(8, 1) // one entry
    put16(10, 0x0112); put16(12, 3); put32(14, 1) // tag, SHORT, count
    put16(18, orientation) // value in the field's first 2 bytes
    put32(22, 0) // no next IFD
    val payload = "Exif".getBytes("US-ASCII") ++ Array[Byte](0, 0) ++ tiff
    val out = new java.io.ByteArrayOutputStream(jpeg.length + 40)
    out.write(jpeg, 0, 2)
    out.write(0xFF); out.write(0xE1)
    val len = payload.length + 2
    out.write(len >> 8); out.write(len & 0xFF)
    out.write(payload, 0, payload.length)
    out.write(jpeg, 2, jpeg.length - 2)
    out.toByteArray
  }

  // ----------------------------------------------------- Spark surface

  final case class JpegSig(id: Long, width: Int, height: Int, phash: Long)

  /** Decode + perceptual-hash a JPEG payload column — mapPartitions,
    * row-local, zero shuffle (the PngCodec.pngPHash shape; the 48-bit
    * dHash convention is shared so banding machinery is too). */
  def jpegPHash(ds: Dataset[Multimodal.MediaRow]): Dataset[JpegSig] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      rows.map { r =>
        val d = decode(r.blob)
        JpegSig(r.id, d.width, d.height,
          PngCodec.dHash48Pixels(PngCodec.Decoded(d.width, d.height, d.luma)))
      }
    }
  }

  /** Analytic 72×48 BLOCK-CONSTANT grayscale fixture: every 8×8 block
    * of doc `id` is the flat value
    *   v(bx, by) = (byte bx of md5("j(id÷2)-by")) mod 200 + id mod 2
    * — flat blocks are DC-only, and with [[FixtureQuant]]'s DC step 8
    * the encode→decode round-trip is EXACT (see object doc), so the
    * DuckDB oracle replays the block formula as decoded luma. Pairs
    * sharing id÷2 differ by a uniform +1 (dHash gradient signs
    * identical → hamming 0) AND by the ENTIRE entropy layer: even ids
    * encode with the Annex K tables, odd ids with the group-reversed
    * tables plus restart interval 3 and a COM segment — different
    * bytes, same pixels, which is the decode proof. Ids with
    * id % 6 == 5 additionally ship as ROTATED RE-POSTS (round 16,
    * VERDICT r15 #5): pixels stored 90° CW with an Exif APP1
    * orientation-8 tag, so only the orientation-normalization path
    * can bring them back to their even partner (dHash is
    * orientation-sensitive; rotation keeps 8×8 blocks flat, so the
    * round-trip stays lossless and the analytic oracle is
    * container-blind). */
  def synthJpegs(ids: Dataset[java.lang.Long]): Dataset[Multimodal.MediaRow] = {
    import ids.sparkSession.implicits._
    val (bw, bh) = (9, 6) // blocks → 72×48 px; dHash cell (r,c) = block (c,r)
    ids.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { boxed =>
        val id = boxed.longValue()
        val rowDigest = Array.tabulate(bh)(by =>
          md.digest(s"j${id / 2}-$by".getBytes("US-ASCII")))
        val (w, h) = (bw * 8, bh * 8)
        val px = Array.tabulate(w * h) { j =>
          val bx = (j % w) / 8; val by = j / w / 8
          (((rowDigest(by)(bx) & 0xFF) % 200 + id % 2) & 0xFF).toByte
        }
        val blob =
          if (id % 2 == 0)
            encodeGray(w, h, px, FixtureQuant)
          else if (id % 6 == 5) {
            // stored = rotate90CW(upright): stored[x2,y2] (h wide)
            // = upright[y2, h-1-x2]; Exif 8 un-rotates on decode
            val rot = Array.tabulate(h * w) { j =>
              val x2 = j % h; val y2 = j / h
              px((h - 1 - x2) * w + y2)
            }
            withExifOrientation(
              encodeGray(h, w, rot, FixtureQuant,
                reverseGroups(StdDcLum), reverseGroups(StdAcLum),
                restartInterval = 3, comment = s"graft-$id"),
              orientation = 8)
          } else
            encodeGray(w, h, px, FixtureQuant,
              reverseGroups(StdDcLum), reverseGroups(StdAcLum),
              restartInterval = 3, comment = s"graft-$id")
        Multimodal.MediaRow(id, "image", blob)
      }
    }
  }

  /** [[synthJpegs]]'s PROGRESSIVE sibling (same block formula, same
    * planted pairs): even ids encode BASELINE, odd ids PROGRESSIVE
    * (the spectral-selection split — a multi-scan SOF2 stream) of the
    * +1-shifted pattern. The quantized coefficients are identical
    * either way, so decoded pixels match up to the uniform shift and
    * mm_phash_jpeg_prog shares mm_phash_jpeg's analytic oracle
    * VERBATIM — progressive ≡ baseline on decoded content IS the
    * proof the multi-scan decoder is judged by. */
  def synthJpegsProg(ids: Dataset[java.lang.Long]): Dataset[Multimodal.MediaRow] = {
    import ids.sparkSession.implicits._
    val (bw, bh) = (9, 6)
    ids.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { boxed =>
        val id = boxed.longValue()
        val rowDigest = Array.tabulate(bh)(by =>
          md.digest(s"j${id / 2}-$by".getBytes("US-ASCII")))
        val px = Array.tabulate(bw * 8 * bh * 8) { j =>
          val bx = (j % (bw * 8)) / 8; val by = j / (bw * 8) / 8
          (((rowDigest(by)(bx) & 0xFF) % 200 + id % 2) & 0xFF).toByte
        }
        val blob =
          if (id % 2 == 0)
            encodeGray(bw * 8, bh * 8, px, FixtureQuant)
          else
            encodeGrayProgressive(bw * 8, bh * 8, px, FixtureQuant,
              comment = s"prog-$id")
        Multimodal.MediaRow(id, "image", blob)
      }
    }
  }
}
