package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The real PNG pixel codec (VERDICT r12 #3). Round-trips pin every
  * filter type; javax.imageio provides an INDEPENDENT encoder
  * cross-check (decode bytes we did not produce); contract violations
  * fail loudly. Pure JVM, no Spark. */
class PngCodecSpec extends AnyFunSuite {

  // deterministic "noisy" pixels — every filter's delta path exercised
  private def grayPixels(w: Int, h: Int): Array[Byte] =
    Array.tabulate(w * h) { j =>
      val x = j % w; val y = j / w
      (((x * 31 + y * 57) ^ (x * y + 11)) % 256).toByte
    }

  test("gray round-trip is exact under each filter type and under cycling") {
    val (w, h) = (21, 9)
    val px = grayPixels(w, h)
    for (f <- 0 to 4) {
      val d = PngCodec.decode(PngCodec.encode(w, h, rgb = false, px, _ => f))
      assert(d.width == w && d.height == h, s"filter $f")
      assert(d.luma.toSeq == px.map(_ & 0xFF).toSeq, s"filter $f")
    }
    val cyc = PngCodec.decode(PngCodec.encode(w, h, rgb = false, px, _ % 5))
    assert(cyc.luma.toSeq == px.map(_ & 0xFF).toSeq)
  }

  test("RGB round-trip applies the integer BT.601 luma mix") {
    val (w, h) = (7, 5)
    val rgb = Array.tabulate(w * h * 3) { i =>
      ((i * 67 + 13) % 256).toByte
    }
    val d = PngCodec.decode(PngCodec.encode(w, h, rgb = true, rgb, _ % 5))
    val expected = (0 until w * h).map { j =>
      (299 * (rgb(3 * j) & 0xFF) + 587 * (rgb(3 * j + 1) & 0xFF) +
        114 * (rgb(3 * j + 2) & 0xFF)) / 1000
    }
    assert(d.luma.toSeq == expected)
  }

  test("decodes PNGs from an INDEPENDENT encoder (javax.imageio)") {
    val (w, h) = (33, 17)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val px = grayPixels(w, h)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, px(y * w + x) & 0xFF)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos))
    val d = PngCodec.decode(bos.toByteArray)
    assert(d.width == w && d.height == h)
    assert(d.luma.toSeq == px.map(_ & 0xFF).toSeq)
  }

  test("contract violations fail loudly, not silently") {
    val ok = PngCodec.encode(9, 6, rgb = false, grayPixels(9, 6), _ => 0)
    intercept[IllegalArgumentException](PngCodec.decode(ok.drop(1))) // signature
    intercept[IllegalArgumentException](PngCodec.decode(ok.dropRight(20))) // truncated
    // 16-bit depth: patch IHDR byte (offset 8+8+8 = 24) and expect a loud no
    val deep = ok.clone(); deep(24) = 16.toByte
    intercept[IllegalArgumentException](PngCodec.decode(deep))
    // palette color type WITHOUT a PLTE chunk — in-contract color type,
    // out-of-contract framing
    val pal = ok.clone(); pal(25) = 3.toByte
    intercept[IllegalArgumentException](PngCodec.decode(pal))
    // RGBA IS in contract — but retyping a grayscale image to color
    // type 6 makes the inflated raw length wrong for the declared
    // geometry, and THAT must fail loudly (framing, not type)
    val alpha = ok.clone(); alpha(25) = 6.toByte
    intercept[IllegalArgumentException](PngCodec.decode(alpha))
  }

  // --------------------------------------------- palette / sub-byte / Adam7

  // a deliberately NON-monotonic palette: luma(k) is a scramble of k,
  // so an "index passthrough" bug cannot pass the round-trip
  private def scrambledPalette(n: Int): Array[Int] =
    Array.tabulate(n) { k =>
      val v = (k * 37 + 11) % 200
      (v << 16) | (v << 8) | v
    }

  test("indexed round-trip at depths 1/2/4/8, flat and Adam7, all filters") {
    val (w, h) = (18, 12)
    for (bits <- Seq(1, 2, 4, 8); il <- Seq(false, true)) {
      val n = 1 << bits
      val idx = Array.tabulate(w * h)(j => ((j % w) * 7 + (j / w) * 3 + j / 5) % n)
      val pal = scrambledPalette(n)
      val png = PngCodec.encodeIndexed(w, h, bits, pal, idx, _ % 5, il)
      val d = PngCodec.decode(png)
      assert(d.width == w && d.height == h)
      val expected = idx.map(k => (k * 37 + 11) % 200)
      assert(d.luma.toSeq == expected.toSeq, s"bits=$bits il=$il")
    }
  }

  test("decodes indexed PNGs from an INDEPENDENT encoder at every depth") {
    val (w, h) = (19, 11) // deliberately non-multiples of 8 (ragged passes)
    for (bits <- Seq(1, 2, 4, 8)) {
      val n = 1 << bits
      val gray = Array.tabulate(n)(k => ((k * 37 + 11) % 200).toByte)
      val icm = new java.awt.image.IndexColorModel(bits, n, gray, gray, gray)
      val imgType =
        if (bits <= 4) java.awt.image.BufferedImage.TYPE_BYTE_BINARY
        else java.awt.image.BufferedImage.TYPE_BYTE_INDEXED
      val img = new java.awt.image.BufferedImage(w, h, imgType, icm)
      for (y <- 0 until h; x <- 0 until w)
        img.getRaster.setSample(x, y, 0, (x * 7 + y * 3) % n)
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "png", bos))
      val d = PngCodec.decode(bos.toByteArray)
      val expected = for (y <- 0 until h; x <- 0 until w)
        yield ((x * 7 + y * 3) % n * 37 + 11) % 200
      assert(d.luma.toSeq == expected, s"bits=$bits")
    }
  }

  test("decodes Adam7 PNGs written by an INDEPENDENT encoder (gray + indexed)") {
    import java.awt.image.BufferedImage
    def writeProgressive(img: BufferedImage): Array[Byte] = {
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("png").next()
      val param = writer.getDefaultWriteParam
      param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
      ios.close(); writer.dispose()
      bos.toByteArray
    }
    val (w, h) = (21, 13) // ragged Adam7 passes (empty/short sub-rows)
    val gimg = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val px = grayPixels(w, h)
    for (y <- 0 until h; x <- 0 until w)
      gimg.getRaster.setSample(x, y, 0, px(y * w + x) & 0xFF)
    val gpng = writeProgressive(gimg)
    assert((gpng(28) & 0xFF) == 1, "imageio wrote interlace=1")
    assert(PngCodec.decode(gpng).luma.toSeq == px.map(_ & 0xFF).toSeq)
    // indexed + Adam7 from imageio
    val n = 16
    val gray = Array.tabulate(n)(k => ((k * 37 + 11) % 200).toByte)
    val icm = new java.awt.image.IndexColorModel(4, n, gray, gray, gray)
    val iimg = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_BINARY, icm)
    for (y <- 0 until h; x <- 0 until w)
      iimg.getRaster.setSample(x, y, 0, (x * 7 + y * 3) % n)
    val ipng = writeProgressive(iimg)
    assert((ipng(28) & 0xFF) == 1)
    val expected = for (y <- 0 until h; x <- 0 until w)
      yield ((x * 7 + y * 3) % n * 37 + 11) % 200
    assert(PngCodec.decode(ipng).luma.toSeq == expected)
  }

  test("our palette/Adam7/sub-byte bytes decode identically in javax.imageio") {
    val (w, h) = (18, 12)
    def imageioLuma(png: Array[Byte]): Seq[Int] = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
      assert(img != null, "imageio refused our PNG")
      for (y <- 0 until h; x <- 0 until w) yield {
        val rgb = img.getRGB(x, y)
        (299 * ((rgb >> 16) & 0xFF) + 587 * ((rgb >> 8) & 0xFF) +
          114 * (rgb & 0xFF)) / 1000
      }
    }
    for (bits <- Seq(1, 2, 4, 8); il <- Seq(false, true)) {
      val n = 1 << bits
      val idx = Array.tabulate(w * h)(j => ((j % w) * 5 + (j / w) * 11) % n)
      val png = PngCodec.encodeIndexed(w, h, bits, scrambledPalette(n), idx, _ % 5, il)
      assert(imageioLuma(png) == PngCodec.decode(png).luma.toSeq,
        s"indexed bits=$bits il=$il")
    }
    // interlaced gray + RGB through the widened encode. The gray leg
    // reads RASTER samples (getRGB gamma-converts gray -> sRGB).
    val px = grayPixels(w, h)
    val gpng = PngCodec.encode(w, h, rgb = false, px, _ % 5, interlaced = true)
    val gimg = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(gpng))
    val graySamples = for (y <- 0 until h; x <- 0 until w)
      yield gimg.getRaster.getSample(x, y, 0)
    assert(graySamples == px.map(_ & 0xFF).toSeq)
    val rgbPx = Array.tabulate(w * h * 3)(i => ((i * 67 + 13) % 256).toByte)
    val cpng = PngCodec.encode(w, h, rgb = true, rgbPx, _ % 5, interlaced = true)
    assert(imageioLuma(cpng) == PngCodec.decode(cpng).luma.toSeq)
  }

  test("sub-byte grayscale scales by exactly 255/(2^d - 1), both layouts") {
    val (w, h) = (18, 12)
    for (bits <- Seq(1, 2, 4); il <- Seq(false, true)) {
      val n = 1 << bits
      val scale = 255 / (n - 1)
      val vals = Array.tabulate(w * h)(j => ((j % w) + (j / w) * 5) % n)
      val png = PngCodec.encodeGraySub(w, h, bits, vals, _ % 5, il)
      val d = PngCodec.decode(png)
      assert(d.luma.toSeq == vals.map(_ * scale).toSeq, s"bits=$bits il=$il")
      // independent read-back: imageio must agree on the scaled gray
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
      val io = for (y <- 0 until h; x <- 0 until w) yield img.getRGB(x, y) & 0xFF
      assert(io == d.luma.toSeq, s"imageio bits=$bits il=$il")
    }
  }

  test("RGBA and gray+alpha decode ignores alpha; both layouts round-trip") {
    val (w, h) = (18, 12)
    val rnd = (i: Int) => ((i * 131 + 17) ^ (i >> 3)) & 0xFF
    // type 6: luma = BT.601 of r,g,b regardless of the alpha plane
    val rgba = Array.tabulate(w * h * 4)(i =>
      if (i % 4 == 3) rnd(i + 999) else rnd(i))
    val expected6 = (0 until w * h).map { j =>
      (299 * rgba(4 * j) + 587 * rgba(4 * j + 1) + 114 * rgba(4 * j + 2)) / 1000
    }
    for (il <- Seq(false, true)) {
      val d = PngCodec.decode(
        PngCodec.encodeWithAlpha(w, h, gray = false, rgba, _ % 5, il))
      assert(d.luma.toSeq == expected6, s"rgba il=$il")
      // scrambling ONLY alpha leaves luma identical
      val rgba2 = rgba.zipWithIndex.map { case (v, i) =>
        if (i % 4 == 3) (v + 101) & 0xFF else v
      }
      val d2 = PngCodec.decode(
        PngCodec.encodeWithAlpha(w, h, gray = false, rgba2, _ % 5, il))
      assert(d2.luma.toSeq == expected6, s"alpha-scramble il=$il")
    }
    // type 4: luma = the gray channel
    val ga = Array.tabulate(w * h * 2)(i =>
      if (i % 2 == 1) rnd(i + 555) else rnd(i))
    val expected4 = (0 until w * h).map(j => ga(2 * j))
    for (il <- Seq(false, true)) {
      val d = PngCodec.decode(
        PngCodec.encodeWithAlpha(w, h, gray = true, ga, _ % 5, il))
      assert(d.luma.toSeq == expected4, s"ga il=$il")
    }
  }

  test("decodes RGBA PNGs from an INDEPENDENT encoder (TYPE_INT_ARGB)") {
    val (w, h) = (19, 11)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_ARGB)
    for (y <- 0 until h; x <- 0 until w) {
      val r = (x * 13 + y * 7) % 256; val g = (x * 29 + y) % 256
      val b = (x + y * 31) % 256; val a = (x * y + 50) % 256
      img.setRGB(x, y, (a << 24) | (r << 16) | (g << 8) | b)
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos))
    val png = bos.toByteArray
    assert((png(25) & 0xFF) == 6, "imageio wrote color type 6")
    val d = PngCodec.decode(png)
    val expected = for (y <- 0 until h; x <- 0 until w) yield {
      val r = (x * 13 + y * 7) % 256; val g = (x * 29 + y) % 256
      val b = (x + y * 31) % 256
      (299 * r + 587 * g + 114 * b) / 1000
    }
    assert(d.luma.toSeq == expected)
  }

  test("planted palette pair: same indices, +1 palette, opposite interlace -> hamming 0") {
    // the mm_phash_palette fixture contract in miniature: pixel content
    // (via the PLTE), not byte layout, decides the match
    val (w, h) = (18, 12)
    val n = 16
    val idx = Array.tabulate(w * h)(j => ((j * 13 + 7) ^ (j / w)) % n)
    val palA = scrambledPalette(n)
    val palB = palA.map { c =>
      val v = (c & 0xFF) + 1; (v << 16) | (v << 8) | v
    }
    val a = PngCodec.decode(PngCodec.encodeIndexed(w, h, 4, palA, idx, _ % 5, interlaced = false))
    val b = PngCodec.decode(PngCodec.encodeIndexed(w, h, 4, palB, idx, _ % 5, interlaced = true))
    assert(PngCodec.dHash48Pixels(a) == PngCodec.dHash48Pixels(b))
    // a different index plane flips bits
    val idx2 = idx.map(k => (k + 3) % n)
    val c = PngCodec.decode(PngCodec.encodeIndexed(w, h, 4, palA, idx2, _ % 5, interlaced = false))
    assert(PngCodec.dHash48Pixels(a) != PngCodec.dHash48Pixels(c))
  }

  test("dHash48Pixels: uniform brightness shift preserves the hash; content change flips bits") {
    val (w, h) = (18, 12)
    val base = Array.tabulate(w * h)(j => ((j * 37 + 5) % 200).toByte)
    val plusOne = base.map(b => ((b & 0xFF) + 1).toByte)
    val d0 = PngCodec.decode(PngCodec.encode(w, h, rgb = false, base, _ % 5))
    val d1 = PngCodec.decode(PngCodec.encode(w, h, rgb = false, plusOne, _ % 5))
    assert(PngCodec.dHash48Pixels(d0) == PngCodec.dHash48Pixels(d1))
    val other = Array.tabulate(w * h)(j => (((j % w) * 91 + (j / w) * 17) % 200).toByte)
    val d2 = PngCodec.decode(PngCodec.encode(w, h, rgb = false, other, _ % 5))
    assert(PngCodec.dHash48Pixels(d0) != PngCodec.dHash48Pixels(d2))
  }

  test("resizeNearest samples the exact source grid") {
    // 4×4 plane with pixel(x, y) = 4y + x: a 2×2 resize samples
    // source (x, y) ∈ (0,0), (2,0), (0,2), (2,2) → values 0, 2, 8, 10
    val (w, h) = (4, 4)
    val px = Array.tabulate(w * h)(j => j.toByte)
    val d = PngCodec.decode(PngCodec.encode(w, h, rgb = false, px, _ => 0))
    assert(PngCodec.resizeNearest(d, 2, 2).toSeq == Seq(0, 2, 8, 10))
    // identity resize returns the plane unchanged
    assert(PngCodec.resizeNearest(d, 4, 4).toSeq == d.luma.toSeq)
    // 1×1 collapses to the top-left sample
    assert(PngCodec.resizeNearest(d, 1, 1).toSeq == Seq(0))
  }
}
