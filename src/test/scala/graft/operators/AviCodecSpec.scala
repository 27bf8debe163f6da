package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class AviCodecSpec extends AnyFunSuite {

  private def gray(seed: String): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val rows = Array.tabulate(6)(by => md.digest(s"$seed-$by".getBytes("US-ASCII")))
    Array.tabulate(72 * 48) { j =>
      val bx = (j % 72) / 8; val by = j / 72 / 8
      (((rows(by)(bx) & 0xFF) % 200) & 0xFF).toByte
    }
  }

  private def jpeg(px: Array[Byte]): Array[Byte] =
    JpegCodec.encodeGray(72, 48, px, JpegCodec.FixtureQuant)

  test("frame extraction returns each frame's exact JPEG payload") {
    val frames = Seq(jpeg(gray("f0")), jpeg(gray("f1")), jpeg(gray("f2")))
    for (junk <- Seq(false, true)) {
      val avi = AviCodec.encode(72, 48, 25, frames, junk = junk)
      for (i <- 0 to 2)
        assert(java.util.Arrays.equals(AviCodec.frame(avi, i), frames(i)),
          s"frame $i junk=$junk")
    }
  }

  test("decoded frame content round-trips through the container") {
    val px1 = gray("mid")
    val avi = AviCodec.encode(72, 48, 25,
      Seq(jpeg(gray("a")), jpeg(px1), jpeg(gray("c"))), junk = true)
    val d = JpegCodec.decode(AviCodec.frame(avi, 1))
    assert(d.width == 72 && d.height == 48)
    assert(d.luma.toSeq == px1.map(_ & 0xFF).toSeq)
  }

  test("odd-leg JPEG variation decodes to the same pixels inside the AVI") {
    val px = gray("var")
    val std = jpeg(px)
    val alt = JpegCodec.encodeGray(72, 48, px, JpegCodec.FixtureQuant,
      JpegCodec.reverseGroups(JpegCodec.StdDcLum),
      JpegCodec.reverseGroups(JpegCodec.StdAcLum), restartInterval = 3)
    assert(!java.util.Arrays.equals(std, alt))
    val a1 = AviCodec.encode(72, 48, 25, Seq(std))
    val a2 = AviCodec.encode(72, 48, 25, Seq(alt), junk = true)
    assert(JpegCodec.decode(AviCodec.frame(a1, 0)).luma.toSeq ==
      JpegCodec.decode(AviCodec.frame(a2, 0)).luma.toSeq)
  }

  test("contract violations fail loudly, naming the offender") {
    val avi = AviCodec.encode(72, 48, 25, Seq(jpeg(gray("x"))))
    def msgOf(b: Array[Byte], idx: Int = 0): String =
      intercept[IllegalArgumentException](AviCodec.frame(b, idx)).getMessage
    assert(msgOf(avi.drop(2)).contains("RIFF"))
    assert(msgOf(avi, idx = 5).contains("past end"))
    // non-MJPEG: patch the strh handler fourcc
    val h = avi.indexOfSlice("MJPG".getBytes("US-ASCII"))
    val xvid = avi.clone()
    "XVID".getBytes("US-ASCII").copyToArray(xvid, h)
    assert(msgOf(xvid).contains("XVID"))
    // wrong form type
    val wav = avi.clone()
    "WAVE".getBytes("US-ASCII").copyToArray(wav, 8)
    assert(msgOf(wav).contains("not an AVI"))
  }
}
