package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.FuzzHarness

/** Seeded hostile-input sweeps over the binary MEDIA codecs: every
  * truncation / bit-flip / garbage case must end in the loud
  * IllegalArgumentException contract — never an escaped JVM
  * exception, never a hang (FuzzHarness documents the policy). */
class CodecFuzzSpec extends AnyFunSuite {

  private def md5Px(seed: String, w: Int, h: Int): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val rows = Array.tabulate(h)(y =>
      md.digest(s"$seed-$y".getBytes("US-ASCII")))
    Array.tabulate(w * h)(j => rows(j / w)(j % w % 16))
  }

  private def blockPx(seed: String, bw: Int, bh: Int): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val rows = Array.tabulate(bh)(by =>
      md.digest(s"$seed-$by".getBytes("US-ASCII")))
    Array.tabulate(bw * 8 * bh * 8) { j =>
      val bx = (j % (bw * 8)) / 8; val by = j / (bw * 8) / 8
      (((rows(by)(bx) & 0xFF) % 200) & 0xFF).toByte
    }
  }

  test("JPEG decode survives the hostile sweep (baseline + Exif)") {
    val base = JpegCodec.encodeGray(32, 24, blockPx("fz", 4, 3),
      JpegCodec.FixtureQuant)
    FuzzHarness.assertClean(
      FuzzHarness.fuzz("jpeg", base, JpegCodec.decode, seed = 1601))
    val exif = JpegCodec.withExifOrientation(base, 6)
    FuzzHarness.assertClean(
      FuzzHarness.fuzz("jpeg-exif", exif, JpegCodec.decode, seed = 1602))
  }

  test("progressive JPEG decode survives the hostile sweep") {
    val prog = JpegCodec.encodeGrayProgressive(32, 24, blockPx("fp", 4, 3),
      JpegCodec.FixtureQuant)
    FuzzHarness.assertClean(
      FuzzHarness.fuzz("jpeg-prog", prog, JpegCodec.decode, seed = 1603))
  }

  test("GIF decode survives the hostile sweep (single + animated)") {
    val px = md5Px("fg", 18, 12)
    FuzzHarness.assertClean(FuzzHarness.fuzz("gif",
      GifCodec.encode(18, 12, px), GifCodec.decode, seed = 1604))
    val anim = GifCodec.encodeAnimated(18, 12,
      Seq(px, px.map(b => (255 - (b & 0xFF)).toByte)))
    FuzzHarness.assertClean(
      FuzzHarness.fuzz("gif-anim", anim, GifCodec.decode, seed = 1605))
  }

  test("PNG decode survives the hostile sweep") {
    val png = PngCodec.encode(18, 12, rgb = false, md5Px("fn", 18, 12),
      filterOf = _ % 5, interlaced = false)
    FuzzHarness.assertClean(
      FuzzHarness.fuzz("png", png, PngCodec.decode, seed = 1606))
  }

  test("FLAC decode survives the hostile sweep") {
    val md = java.security.MessageDigest.getInstance("MD5")
    val s = Array.tabulate(80) { j =>
      val d = md.digest(s"ff-${j / 16}".getBytes("US-ASCII"))
      ((d(j % 16) & 0xFF) - 128) * 256
    }
    FuzzHarness.assertClean(FuzzHarness.fuzz("flac",
      FlacCodec.encode(16000, 1, 16, s), FlacCodec.decode, seed = 1607))
  }

  test("FLAC stereo/LPC decode survives the hostile sweep") {
    val md = java.security.MessageDigest.getInstance("MD5")
    val n = 60
    val inter = new Array[Int](2 * n)
    (0 until n).foreach { j =>
      val d = md.digest(s"fs-${j / 16}".getBytes("US-ASCII"))
      val l = ((d(j % 16) & 0xFF) - 128) * 250
      inter(2 * j) = l
      inter(2 * j + 1) = l + ((d((j + 3) % 16) & 0xFF) % 7 - 3) * 64
    }
    FuzzHarness.assertClean(FuzzHarness.fuzz("flac-ms",
      FlacCodec.encode(16000, 2, 16, inter, stereoMode = 10, lpc = true),
      FlacCodec.decode, seed = 1623))
  }

  test("AVI frame walk survives the hostile sweep") {
    val jpeg = JpegCodec.encodeGray(16, 16, blockPx("fa", 2, 2),
      JpegCodec.FixtureQuant)
    val avi = AviCodec.encode(16, 16, 5, Seq(jpeg, jpeg), junk = true)
    FuzzHarness.assertClean(FuzzHarness.fuzz("avi", avi,
      b => AviCodec.frame(b, 0), seed = 1608))
  }
}
