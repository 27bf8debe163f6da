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
    // palette color type
    val pal = ok.clone(); pal(25) = 3.toByte
    intercept[IllegalArgumentException](PngCodec.decode(pal))
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
