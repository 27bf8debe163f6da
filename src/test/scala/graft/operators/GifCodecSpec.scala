package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The real GIF LZW codec. Round-trips cross every variable-width
  * boundary (9→10→11→12 bits) and the dictionary-full clear-reset;
  * javax.imageio is the INDEPENDENT compatibility check in BOTH
  * directions; contract violations fail loudly. */
class GifCodecSpec extends AnyFunSuite {

  // deterministic "noisy" pixels — defeats LZW runs, grows the dict
  // roughly one entry per pixel so large fixtures cross width bounds
  private def noisy(w: Int, h: Int): Array[Byte] =
    Array.tabulate(w * h) { j =>
      val x = j % w; val y = j / w
      (((x * 131 + y * 239) ^ (x * y * 7 + j)) % 256).toByte
    }

  test("round-trip is exact at 18x12 (single width)") {
    val (w, h) = (18, 12)
    val px = noisy(w, h)
    val d = GifCodec.decode(GifCodec.encode(w, h, px))
    assert(d.width == w && d.height == h)
    assert(d.luma.toSeq == px.map(_ & 0xFF).toSeq)
  }

  test("round-trip is exact across the 9/10/11-bit width boundaries") {
    val (w, h) = (64, 64) // ~4k pixels: dict well past 2048 entries
    val px = noisy(w, h)
    val d = GifCodec.decode(GifCodec.encode(w, h, px))
    assert(d.luma.toSeq == px.map(_ & 0xFF).toSeq)
  }

  test("round-trip is exact across the 4096-entry clear-reset") {
    val (w, h) = (128, 80) // ~10k pixels: dictionary fills and resets
    val px = noisy(w, h)
    val d = GifCodec.decode(GifCodec.encode(w, h, px))
    assert(d.luma.toSeq == px.map(_ & 0xFF).toSeq)
  }

  test("runs compress: a flat image round-trips (KwKwK chains)") {
    val (w, h) = (40, 30)
    val px = Array.fill[Byte](w * h)(77) // maximal KwKwK stress
    val gif = GifCodec.encode(w, h, px)
    assert(gif.length < w * h + 800) // actually compressed (palette=768B)
    assert(GifCodec.decode(gif).luma.forall(_ == 77))
  }

  test("decodes GIFs from an INDEPENDENT encoder (javax.imageio)") {
    val (w, h) = (64, 48)
    val px = noisy(w, h)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, px(y * w + x) & 0xFF)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "gif", bos))
    val d = GifCodec.decode(bos.toByteArray)
    assert(d.width == w && d.height == h)
    assert(d.luma.toSeq == px.map(_ & 0xFF).toSeq)
  }

  test("an INDEPENDENT decoder (javax.imageio) reads our bytes") {
    val (w, h) = (64, 48)
    val px = noisy(w, h)
    val gif = GifCodec.encode(w, h, px)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(gif))
    assert(img != null && img.getWidth == w && img.getHeight == h)
    val got = for (y <- 0 until h; x <- 0 until w)
      yield img.getRGB(x, y) & 0xFF // gray palette: B channel = value
    assert(got == px.map(_ & 0xFF).toSeq)
  }

  test("contract violations fail loudly, not silently") {
    val ok = GifCodec.encode(18, 12, noisy(18, 12))
    intercept[IllegalArgumentException](GifCodec.decode(ok.drop(1)))
    intercept[IllegalArgumentException](GifCodec.decode(ok.dropRight(30)))
    val badBlock = ok.clone()
    // image descriptor introducer: 6 header + 7 LSD + 768 palette
    val descOff = 6 + 7 + 768
    assert((badBlock(descOff) & 0xFF) == 0x2C) // sanity: descriptor
    badBlock(descOff) = 0x7E.toByte // unknown block introducer
    intercept[IllegalArgumentException](GifCodec.decode(badBlock))
  }

  test("decodes an INTERLACED GIF (4-pass row reorder) bit-exactly") {
    // ImageIO's default GIF writer emits interlaced streams (the
    // first cross-check draft failed loudly on exactly this), so an
    // explicit flag assertion pins that the reorder path really ran
    val (w, h) = (64, 48)
    val px = noisy(w, h)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, px(y * w + x) & 0xFF)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "gif", bos))
    val bytes = bos.toByteArray
    // walk the block structure to the image descriptor's packed byte
    var p = 6 + 7
    if ((bytes(6 + 4) & 0x80) != 0) p += 3 * (1 << ((bytes(6 + 4) & 7) + 1))
    while ((bytes(p) & 0xFF) == 0x21) {
      p += 2
      while ({ val n = bytes(p) & 0xFF; p += 1 + n; n != 0 }) ()
    }
    assert((bytes(p) & 0xFF) == 0x2C, "descriptor walk failed")
    assert((bytes(p + 9) & 0x40) != 0,
      "fixture is not interlaced — cross-check would be vacuous")
    assert(GifCodec.decode(bytes).luma.toSeq == px.map(_ & 0xFF).toSeq)
  }

  test("animated GIF: frame 1 decodes, later frames skipped by framing") {
    val (w, h) = (18, 12)
    val f1 = noisy(w, h)
    val f2 = f1.map(b => (255 - (b & 0xFF)).toByte)
    val f3 = Array.fill[Byte](w * h)(42)
    val anim = GifCodec.encodeAnimated(w, h, Seq(f1, f2, f3))
    val single = GifCodec.decode(GifCodec.encode(w, h, f1))
    val d = GifCodec.decode(anim)
    assert(d.width == w && d.height == h)
    assert(d.luma.toSeq == single.luma.toSeq)
    assert(d.luma.toSeq == f1.map(_ & 0xFF).toSeq)
  }

  test("animated GIF first frame agrees with javax.imageio's frame 0") {
    val (w, h) = (32, 20)
    val f1 = noisy(w, h)
    val f2 = f1.map(b => ((b & 0xFF) ^ 0x55).toByte)
    val anim = GifCodec.encodeAnimated(w, h, Seq(f1, f2))
    val reader = javax.imageio.ImageIO
      .getImageReadersByFormatName("gif").next()
    reader.setInput(javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(anim)))
    assert(reader.getNumImages(true) == 2, "fixture is not multi-image")
    val img0 = reader.read(0)
    val got = for (y <- 0 until h; x <- 0 until w)
      yield img0.getRGB(x, y) & 0xFF
    assert(GifCodec.decode(anim).luma.toSeq == got)
    assert(got == f1.map(_ & 0xFF).toSeq)
  }

  test("synthGifs→gifPHash: planted id-pairs are dHash-identical (Spark)") {
    val spark = graft.SparkSpec.session
    import spark.implicits._
    val ids = (0L until 40L).map(java.lang.Long.valueOf)
    val sigs = GifCodec.gifPHash(GifCodec.synthGifs(ids.toDS()))
      .collect().map(s => s.id -> s.phash).toMap
    (0L until 40L by 2).foreach { even =>
      assert(sigs(even) == sigs(even + 1), s"pair ($even, ${even + 1})")
    }
    // distinct groups' md5-mixed patterns are independent: expect
    // nearly all distinct phashes across the 20 groups
    val groups = (0L until 40L by 2).map(sigs).distinct
    assert(groups.size >= 18, s"only ${groups.size} distinct group hashes")
  }
}
