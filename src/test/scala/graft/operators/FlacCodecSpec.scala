package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The real FLAC codec: constant/verbatim/fixed subframes with Rice
  * residuals round-trip bit-exactly; CRC-8/CRC-16/MD5 integrity gates
  * and the out-of-contract refusals (LPC, stereo decorrelation) fail
  * loudly; byte surgery recomputes CRC-8 where the header changes. */
class FlacCodecSpec extends AnyFunSuite {

  private def md5Samples(seed: String, n: Int): Array[Int] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(n) { j =>
      val d = md.digest(s"$seed-${j / 16}".getBytes("US-ASCII"))
      ((d(j % 16) & 0xFF) - 128) * 256
    }
  }

  test("noise round-trips exactly across frames incl. a partial last one") {
    val s = md5Samples("n1", 100) // 3×32 + 4-sample last frame
    val a = FlacCodec.decode(FlacCodec.encode(16000, 1, 16, s))
    assert(a.sampleRate == 16000 && a.channels == 1 && a.bits == 16)
    assert(a.samples.toSeq == s.toSeq)
  }

  test("constant signal uses the CONSTANT subframe and round-trips") {
    val s = Array.fill(64)(-12345)
    val flac = FlacCodec.encode(16000, 1, 16, s)
    // 2 frames ≈ (7 header + 3 subframe + 2 crc) each + 42 preamble:
    // far below verbatim's 64×2 bytes — proves constant coding ran
    assert(flac.length < 42 + 2 * 16, s"stream ${flac.length} B")
    assert(FlacCodec.decode(flac).samples.forall(_ == -12345))
  }

  test("ramps compress through fixed predictors and round-trip") {
    val s = Array.tabulate(96)(j => (j - 48) * 100) // order-2 zeroes it
    val flac = FlacCodec.encode(16000, 1, 16, s)
    assert(flac.length < 42 + 3 * 24, s"stream ${flac.length} B")
    assert(FlacCodec.decode(flac).samples.toSeq == s.toSeq)
  }

  test("stereo (independent channels) and 8-bit depths round-trip") {
    val st = md5Samples("st", 120).map(_ / 256) // 60 frames/ch, 8-bit range
    val a = FlacCodec.decode(FlacCodec.encode(8000, 2, 8, st))
    assert(a.channels == 2 && a.bits == 8)
    assert(a.samples.toSeq == st.toSeq)
  }

  test("verbatim appears when residuals beat nothing (alternating rails)") {
    // max-amplitude alternation: every fixed order's residuals blow
    // up past the sample width, so verbatim wins the cost race
    val s = Array.tabulate(48)(j => if (j % 2 == 0) 32000 else -32000)
    val flac = FlacCodec.encode(16000, 1, 16, s)
    assert(FlacCodec.decode(flac).samples.toSeq == s.toSeq)
  }

  test("LPC subframes fail loudly by name") {
    val flac = FlacCodec.encode(16000, 1, 16, Array.fill(32)(777))
    // frame starts at 42; header = 6 bytes + CRC-8; subframe header
    // byte at 49 is 0x00 (pad|CONSTANT|no-wasted) → make it LPC
    val bad = flac.clone()
    assert(bad(49) == 0x00, "subframe header byte moved")
    bad(49) = 0x40 // type 100000: LPC order 1
    val e = intercept[IllegalArgumentException](FlacCodec.decode(bad))
    assert(e.getMessage.contains("LPC"))
  }

  test("stereo decorrelation fails loudly (CRC-8 re-fixed surgery)") {
    val flac = FlacCodec.encode(16000, 1, 16, Array.fill(32)(777))
    val bad = flac.clone()
    assert((bad(45) & 0xFF) == 0x08, "chAsg/ssCode byte moved")
    bad(45) = 0x88.toByte // channel assignment 8: left/side
    bad(48) = FlacCodec.crc8(bad, 42, 48).toByte // re-fix header CRC
    val e = intercept[IllegalArgumentException](FlacCodec.decode(bad))
    assert(e.getMessage.contains("decorrelation"))
  }

  test("corruption is caught: header CRC-8, frame CRC-16, stream MD5") {
    val s = md5Samples("c1", 64)
    val flac = FlacCodec.encode(16000, 1, 16, s)
    val h = flac.clone(); h(44) = (h(44) ^ 0x10).toByte // bsCode bits
    assert(intercept[IllegalArgumentException](FlacCodec.decode(h))
      .getMessage.matches(".*(CRC-8|blocksize|sync).*"))
    val m = flac.clone(); m(30) = (m(30) ^ 0x01).toByte // STREAMINFO MD5
    assert(intercept[IllegalArgumentException](FlacCodec.decode(m))
      .getMessage.contains("MD5"))
    val t = flac.dropRight(9)
    intercept[IllegalArgumentException](FlacCodec.decode(t))
    assert(intercept[IllegalArgumentException](
      FlacCodec.decode(flac.take(3))).getMessage.contains("fLaC"))
  }

  test("CRC-16 catches a flipped constant-subframe payload bit") {
    val flac = FlacCodec.encode(16000, 1, 16, Array.fill(32)(777))
    val bad = flac.clone()
    bad(50) = (bad(50) ^ 0x01).toByte // inside the 16-bit constant value
    val e = intercept[IllegalArgumentException](FlacCodec.decode(bad))
    assert(e.getMessage.contains("CRC-16"))
  }

  test("synthFlacs→flacPcmStats agrees with direct decode (Spark)") {
    val spark = graft.SparkSpec.session
    import spark.implicits._
    val ids = (0L until 30L).map(java.lang.Long.valueOf)
    val rows = FlacCodec.synthFlacs(ids.toDS()).collect()
    val stats = FlacCodec.flacPcmStats(FlacCodec.synthFlacs(ids.toDS()))
      .collect().map(s => s.id -> s).toMap
    rows.foreach { r =>
      val a = FlacCodec.decode(r.blob)
      val st = stats(r.id)
      assert(st.n == a.samples.length)
      assert(st.peak == a.samples.map(v => math.abs(v.toLong)).max)
      assert(st.sumsq == a.samples.map(v => v.toLong * v).sum)
    }
    // id % 7 == 3 docs are the constant class: zero crossings = 0
    assert(stats(3L).zerox == 0 && stats(10L).zerox == 0)
    assert(stats(4L).zerox > 0)
  }
}
