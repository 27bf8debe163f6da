package graft.operators

import java.io.ByteArrayInputStream

import javax.imageio.{ImageIO, ImageWriteParam}
import java.awt.image.BufferedImage

import org.scalatest.funsuite.AnyFunSuite

class JpegCodecSpec extends AnyFunSuite {

  // deterministic md5-mixed pixels (the PngCodecSpec discipline)
  private def md5Pixels(seed: String, w: Int, h: Int): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val rows = Array.tabulate(h)(y => md.digest(s"$seed-$y".getBytes("US-ASCII")))
    Array.tabulate(w * h) { j =>
      val x = j % w; val y = j / w
      rows(y)(x % 16)
    }
  }

  private def blockConstant(seed: String, bw: Int, bh: Int): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val rows = Array.tabulate(bh)(by => md.digest(s"$seed-$by".getBytes("US-ASCII")))
    Array.tabulate(bw * 8 * bh * 8) { j =>
      val bx = (j % (bw * 8)) / 8; val by = j / (bw * 8) / 8
      (((rows(by)(bx) & 0xFF) % 200) & 0xFF).toByte
    }
  }

  private def imageioDecodeGray(bytes: Array[Byte]): Array[Int] = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    assert(img != null, "imageio failed to decode")
    val r = img.getRaster
    Array.tabulate(img.getWidth * img.getHeight) { j =>
      r.getSample(j % img.getWidth, j / img.getWidth, 0)
    }
  }

  /** Raw Y band via readRaster — no YCbCr→RGB conversion. */
  private def imageioRawY(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    val rd = ImageIO.getImageReadersByFormatName("jpeg").next()
    rd.setInput(ImageIO.createImageInputStream(new ByteArrayInputStream(bytes)))
    val raster = rd.readRaster(0, null)
    val (w, h) = (raster.getWidth, raster.getHeight)
    (w, h, Array.tabulate(w * h)(j => raster.getSample(j % w, j / w, 0)))
  }

  private def imageioEncode(img: BufferedImage,
                            progressive: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
    val p = writer.getDefaultWriteParam
    if (progressive) p.setProgressiveMode(ImageWriteParam.MODE_DEFAULT)
    val ios = ImageIO.createImageOutputStream(out)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
    ios.close(); writer.dispose()
    out.toByteArray
  }

  private def maxAbsDiff(a: Array[Int], b: Array[Int]): Int = {
    assert(a.length == b.length, s"length ${a.length} vs ${b.length}")
    a.indices.map(i => math.abs(a(i) - b(i))).max
  }

  // ---------------------------------------------------- exact fixture

  test("block-constant images round-trip EXACTLY (DC-only + quant 8)") {
    val px = blockConstant("rt", 9, 6)
    val d = JpegCodec.decode(JpegCodec.encodeGray(72, 48, px, JpegCodec.FixtureQuant))
    assert(d.width == 72 && d.height == 48)
    assert(d.luma.toSeq == px.map(_ & 0xFF).toSeq)
  }

  test("reversed tables + restarts + COM: different bytes, identical pixels") {
    val px = blockConstant("ent", 9, 6)
    val std = JpegCodec.encodeGray(72, 48, px, JpegCodec.FixtureQuant)
    val alt = JpegCodec.encodeGray(72, 48, px, JpegCodec.FixtureQuant,
      JpegCodec.reverseGroups(JpegCodec.StdDcLum),
      JpegCodec.reverseGroups(JpegCodec.StdAcLum),
      restartInterval = 3, comment = "alt-leg")
    assert(!java.util.Arrays.equals(std, alt))
    assert(JpegCodec.decode(std).luma.toSeq == JpegCodec.decode(alt).luma.toSeq)
  }

  test("imageio decodes BOTH fixture encodings to the planted pixels") {
    val px = blockConstant("xio", 9, 6)
    for (alt <- Seq(false, true)) {
      val bytes =
        if (!alt) JpegCodec.encodeGray(72, 48, px, JpegCodec.FixtureQuant)
        else JpegCodec.encodeGray(72, 48, px, JpegCodec.FixtureQuant,
          JpegCodec.reverseGroups(JpegCodec.StdDcLum),
          JpegCodec.reverseGroups(JpegCodec.StdAcLum),
          restartInterval = 2, comment = "c")
      // DC-only blocks are IDCT-implementation-independent: exact
      assert(imageioDecodeGray(bytes).toSeq == px.map(_ & 0xFF).toSeq,
        s"alt=$alt")
    }
  }

  // ------------------------------------------------- general content

  test("general-content encode: our decode ≈ imageio decode of our bytes") {
    val (w, h) = (41, 23) // non-multiple-of-8 → edge-padded blocks
    val px = md5Pixels("gen", w, h)
    val flat16 = Array.fill(64)(16)
    val bytes = JpegCodec.encodeGray(w, h, px, flat16)
    val ours = JpegCodec.decode(bytes)
    assert(ours.width == w && ours.height == h)
    // float IDCT vs libjpeg integer IDCT: at most ±1 per sample
    assert(maxAbsDiff(ours.luma, imageioDecodeGray(bytes)) <= 1)
  }

  test("decodes an imageio-WRITTEN grayscale JPEG (independent encoder)") {
    val (w, h) = (40, 24)
    val px = md5Pixels("iw", w, h)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, px(y * w + x) & 0xFF)
    val bytes = imageioEncode(img)
    val ours = JpegCodec.decode(bytes)
    assert(ours.width == w && ours.height == h)
    assert(maxAbsDiff(ours.luma, imageioDecodeGray(bytes)) <= 1)
  }

  test("our progressive encoding decodes EXACTLY like the baseline one") {
    // spectral-selection-only progression: identical quantized
    // coefficients, so the decodes must match bit for bit — on
    // block-constant AND general content
    for ((seed, quant) <- Seq(("pflat", JpegCodec.FixtureQuant),
        ("pgen", Array.fill(64)(16)))) {
      val px =
        if (seed == "pflat") blockConstant(seed, 9, 6)
        else md5Pixels(seed, 72, 48)
      val base = JpegCodec.decode(JpegCodec.encodeGray(72, 48, px, quant))
      val progBytes = JpegCodec.encodeGrayProgressive(72, 48, px, quant,
        comment = "p")
      // really multi-scan SOF2
      assert(progBytes.sliding(2).exists(s =>
        (s(0) & 0xFF) == 0xFF && (s(1) & 0xFF) == 0xC2))
      assert(progBytes.sliding(2).count(s =>
        (s(0) & 0xFF) == 0xFF && (s(1) & 0xFF) == 0xDA) == 2)
      val prog = JpegCodec.decode(progBytes)
      assert(prog.luma.toSeq == base.luma.toSeq, seed)
      // and an INDEPENDENT decoder agrees on our progressive bytes
      assert(maxAbsDiff(imageioDecodeGray(progBytes), base.luma) <= 1, seed)
    }
  }

  test("decodes an imageio-WRITTEN PROGRESSIVE grayscale JPEG (SOF2)") {
    val (w, h) = (40, 24)
    val px = md5Pixels("prog", w, h)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, px(y * w + x) & 0xFF)
    val bytes = imageioEncode(img, progressive = true)
    // really progressive: SOF2 present, more than one scan
    assert(bytes.sliding(2).exists(s =>
      (s(0) & 0xFF) == 0xFF && (s(1) & 0xFF) == 0xC2))
    assert(bytes.sliding(2).count(s =>
      (s(0) & 0xFF) == 0xFF && (s(1) & 0xFF) == 0xDA) >= 3)
    val ours = JpegCodec.decode(bytes)
    assert(ours.width == w && ours.height == h)
    assert(maxAbsDiff(ours.luma, imageioDecodeGray(bytes)) <= 1)
  }

  test("decodes an imageio-WRITTEN progressive COLOR JPEG (chroma scans skipped)") {
    val (w, h) = (48, 32)
    val px = md5Pixels("pcol", w, h)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) {
      val v = px(y * w + x) & 0xFF
      img.setRGB(x, y, (v << 16) | (((v + 40) % 256) << 8) | ((v * 3 + 17) % 256))
    }
    val bytes = imageioEncode(img, progressive = true)
    val (rw, rh, rawY) = imageioRawY(bytes)
    assert(rw == w && rh == h)
    val ours = JpegCodec.decode(bytes)
    assert(maxAbsDiff(ours.luma, rawY) <= 1)
  }

  test("decodes an imageio-WRITTEN color JPEG (3-component, subsampled)") {
    val (w, h) = (48, 32)
    val px = md5Pixels("col", w, h)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) {
      val v = px(y * w + x) & 0xFF
      val r = v; val g = (v + 40) % 256; val b = (v * 3 + 17) % 256
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val bytes = imageioEncode(img)
    val (rw, rh, rawY) = imageioRawY(bytes)
    assert(rw == w && rh == h)
    val ours = JpegCodec.decode(bytes)
    // our luma IS the Y component — compare against the raw Y raster
    assert(maxAbsDiff(ours.luma, rawY) <= 1)
  }

  // ------------------------------------------------------ the fixture

  test("synthJpegs pairs: +1-shifted pixels, different entropy bytes") {
    val px0 = blockConstant("j7", 9, 6) // group 7 == ids 14/15 seed "j7-by"
    // replicate the fixture formula locally for ids 14 (even) and 15 (odd)
    val md = java.security.MessageDigest.getInstance("MD5")
    val rows = Array.tabulate(6)(by => md.digest(s"j7-$by".getBytes("US-ASCII")))
    def pxOf(id: Long) = Array.tabulate(72 * 48) { j =>
      val bx = (j % 72) / 8; val by = j / 72 / 8
      (((rows(by)(bx) & 0xFF) % 200 + id % 2) & 0xFF).toByte
    }
    val even = JpegCodec.encodeGray(72, 48, pxOf(14), JpegCodec.FixtureQuant)
    val odd = JpegCodec.encodeGray(72, 48, pxOf(15), JpegCodec.FixtureQuant,
      JpegCodec.reverseGroups(JpegCodec.StdDcLum),
      JpegCodec.reverseGroups(JpegCodec.StdAcLum),
      restartInterval = 3, comment = "graft-15")
    val dEven = JpegCodec.decode(even); val dOdd = JpegCodec.decode(odd)
    assert(dEven.luma.indices.forall(i => dOdd.luma(i) == dEven.luma(i) + 1))
    val hEven = PngCodec.dHash48Pixels(
      PngCodec.Decoded(72, 48, dEven.luma))
    val hOdd = PngCodec.dHash48Pixels(
      PngCodec.Decoded(72, 48, dOdd.luma))
    assert(hEven == hOdd) // uniform shift preserves gradient signs
    assert(px0 != null)
  }

  test("Exif orientations 1-8 normalize decoded luma to upright (II and MM)") {
    val (bw, bh) = (4, 3)
    val (w, h) = (bw * 8, bh * 8)
    val up = blockConstant("exif", bw, bh)
    val upright = up.map(_ & 0xFF).toSeq
    for (o <- 1 to 8; be <- Seq(false, true)) {
      // stored = inverse of orientation o's to-display op, so the
      // normalized decode must recover the upright image exactly
      // (block-constant pixels survive every flip/rotation losslessly)
      val (sw, sh) = if (o >= 5) (h, w) else (w, h)
      val stored = Array.tabulate(sw * sh) { j =>
        val x2 = j % sw; val y2 = j / sw
        val (x, y) = o match {
          case 1 => (x2, y2)
          case 2 => (w - 1 - x2, y2)
          case 3 => (w - 1 - x2, h - 1 - y2)
          case 4 => (x2, h - 1 - y2)
          case 5 => (y2, x2)
          case 6 => (w - 1 - y2, x2)
          case 7 => (w - 1 - y2, h - 1 - x2)
          case 8 => (y2, h - 1 - x2)
        }
        up(y * w + x)
      }
      val jpeg = JpegCodec.withExifOrientation(
        JpegCodec.encodeGray(sw, sh, stored, JpegCodec.FixtureQuant),
        o, bigEndian = be)
      val d = JpegCodec.decode(jpeg)
      assert(d.width == w && d.height == h, s"o=$o be=$be dims")
      assert(d.luma.toSeq == upright, s"o=$o be=$be pixels")
    }
  }

  test("rotated re-post (stored 90CW + Exif 8) collides at hamming 0") {
    val px = blockConstant("rot", 9, 6)
    val (w, h) = (72, 48)
    val plain = JpegCodec.decode(
      JpegCodec.encodeGray(w, h, px, JpegCodec.FixtureQuant))
    val rot = Array.tabulate(h * w) { j =>
      val x2 = j % h; val y2 = j / h
      px((h - 1 - x2) * w + y2)
    }
    val rePost = JpegCodec.decode(JpegCodec.withExifOrientation(
      JpegCodec.encodeGray(h, w, rot, JpegCodec.FixtureQuant), 8))
    assert(rePost.width == w && rePost.height == h)
    assert(rePost.luma.toSeq == plain.luma.toSeq)
    assert(PngCodec.dHash48Pixels(PngCodec.Decoded(w, h, rePost.luma)) ==
      PngCodec.dHash48Pixels(PngCodec.Decoded(w, h, plain.luma)))
  }

  test("broken Exif fails loudly; non-Exif APP1 is skipped") {
    val px = blockConstant("xb", 4, 3)
    val ok = JpegCodec.encodeGray(32, 24, px, JpegCodec.FixtureQuant)
    val tagged = JpegCodec.withExifOrientation(ok, 6)
    // corrupt the TIFF byte-order mark ('II' → 'ZZ')
    val bad = tagged.clone()
    assert(bad(12) == 'I' && bad(13) == 'I')
    bad(12) = 'Z'; bad(13) = 'Z'
    val e = intercept[IllegalArgumentException](JpegCodec.decode(bad))
    assert(e.getMessage.contains("byte-order"))
    // a non-Exif APP1 (XMP-style payload) must not disturb decode
    val xmp = "http://ns.example/xmp junk".getBytes("US-ASCII")
    val out = new java.io.ByteArrayOutputStream()
    out.write(ok, 0, 2)
    out.write(0xFF); out.write(0xE1)
    val len = xmp.length + 2
    out.write(len >> 8); out.write(len & 0xFF)
    out.write(xmp, 0, xmp.length)
    out.write(ok, 2, ok.length - 2)
    assert(JpegCodec.decode(out.toByteArray).luma.toSeq ==
      JpegCodec.decode(ok).luma.toSeq)
  }

  // --------------------------------------------------- failure matrix

  private def patched(bytes: Array[Byte])(f: (Array[Byte], Int) => Unit): Array[Byte] = {
    val b = bytes.clone()
    // locate the SOF0 marker
    val at = b.indices.dropRight(1)
      .find(i => (b(i) & 0xFF) == 0xFF && (b(i + 1) & 0xFF) == 0xC0)
      .getOrElse(fail("no SOF0 in fixture"))
    f(b, at)
    b
  }

  test("contract violations fail loudly, naming the offender") {
    val px = blockConstant("fm", 9, 6)
    val ok = JpegCodec.encodeGray(72, 48, px, JpegCodec.FixtureQuant)

    def msgOf(b: Array[Byte]): String =
      intercept[IllegalArgumentException](JpegCodec.decode(b)).getMessage

    assert(msgOf(ok.drop(1)).contains("SOI"))
    assert(msgOf(ok.dropRight(40)).contains("truncated"))
    // SOF0 → SOF2 retype: progressive is IN contract since round 15,
    // but a full-band Ss=0..63 scan is illegal in a progressive frame
    // and must still fail loudly
    assert(msgOf(patched(ok)((b, at) => b(at + 1) = 0xC2.toByte))
      .contains("progressive"))
    // arithmetic: SOF0 → SOF9
    assert(msgOf(patched(ok)((b, at) => b(at + 1) = 0xC9.toByte))
      .contains("arithmetic"))
    // 12-bit: precision byte is SOF payload byte 0 (marker+2 len bytes)
    assert(msgOf(patched(ok)((b, at) => b(at + 4) = 12.toByte))
      .contains("12-bit"))
    // CMYK: minimal SOI + 4-component SOF0
    val cmyk = Array[Int](0xFF, 0xD8, 0xFF, 0xC0, 0, 20, 8, 0, 8, 0, 8, 4,
      1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1, 4, 0x11, 1).map(_.toByte)
    assert(msgOf(cmyk).contains("CMYK"))
    // 16-bit quant table: DQT Pq nibble
    val dqtAt = ok.indices.dropRight(1)
      .find(i => (ok(i) & 0xFF) == 0xFF && (ok(i + 1) & 0xFF) == 0xDB).get
    val wideQ = ok.clone(); wideQ(dqtAt + 4) = 0x10.toByte
    assert(msgOf(wideQ).contains("16-bit"))
  }

  test("restart-marker stream with a corrupted RST fails loudly") {
    val px = blockConstant("rst", 9, 6)
    val bytes = JpegCodec.encodeGray(72, 48, px, JpegCodec.FixtureQuant,
      restartInterval = 4)
    // find the first RST0 (FFD0) after SOS and break its index
    val at = bytes.indices.dropRight(1)
      .find(i => (bytes(i) & 0xFF) == 0xFF && (bytes(i + 1) & 0xFF) == 0xD0)
      .getOrElse(fail("no RST0 emitted"))
    val broken = bytes.clone(); broken(at + 1) = 0xD5.toByte
    val msg = intercept[IllegalArgumentException](
      JpegCodec.decode(broken)).getMessage
    assert(msg.contains("RST"))
  }
}
