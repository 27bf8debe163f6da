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

  test("reserved subframe types fail loudly") {
    val flac = FlacCodec.encode(16000, 1, 16, Array.fill(32)(777))
    // frame starts at 42; header = 6 bytes + CRC-8; subframe header
    // byte at 49 is 0x00 (pad|CONSTANT|no-wasted) → a reserved type
    val bad = flac.clone()
    assert(bad(49) == 0x00, "subframe header byte moved")
    bad(49) = 0x04 // type 000010: reserved
    val e = intercept[IllegalArgumentException](FlacCodec.decode(bad))
    assert(e.getMessage.contains("reserved subframe type"))
  }

  test("decorrelated frame in a MONO stream fails loudly (surgery)") {
    val flac = FlacCodec.encode(16000, 1, 16, Array.fill(32)(777))
    val bad = flac.clone()
    assert((bad(45) & 0xFF) == 0x08, "chAsg/ssCode byte moved")
    bad(45) = 0x88.toByte // channel assignment 8 on a 1-channel stream
    bad(48) = FlacCodec.crc8(bad, 42, 48).toByte // re-fix header CRC
    val e = intercept[IllegalArgumentException](FlacCodec.decode(bad))
    assert(e.getMessage.contains("non-stereo"))
    // reserved channel assignments (11-15) refuse by name
    val res = flac.clone()
    res(45) = 0xB8.toByte // channel assignment 11
    res(48) = FlacCodec.crc8(res, 42, 48).toByte
    val e2 = intercept[IllegalArgumentException](FlacCodec.decode(res))
    assert(e2.getMessage.contains("reserved channel assignment"))
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

  test("stereo decorrelation round-trips exactly in all three modes") {
    val n = 70
    val l = md5Samples("sl", n).map(_ / 2) // headroom for the side math
    val rr = l.zip(md5Samples("sr", n)).map { case (a, b) =>
      a + (math.abs(b) % 7) * 32
    }
    val inter = Array.tabulate(2 * n)(i =>
      if (i % 2 == 0) l(i / 2) else rr(i / 2))
    for (mode <- Seq(8, 9, 10); lpc <- Seq(false, true)) {
      val flac = FlacCodec.encode(16000, 2, 16, inter,
        stereoMode = mode, lpc = lpc)
      val a = FlacCodec.decode(flac)
      assert(a.channels == 2)
      assert(a.samples.toSeq == inter.toSeq, s"mode=$mode lpc=$lpc")
    }
    // decorrelation genuinely compresses vs independent channels
    val ind = FlacCodec.encode(16000, 2, 16, inter)
    val ms = FlacCodec.encode(16000, 2, 16, inter, stereoMode = 10)
    assert(ms.length < ind.length,
      s"mid/side ${ms.length} B !< independent ${ind.length} B")
  }

  test("LPC subframes round-trip through the public encoder (mono)") {
    val s = md5Samples("lp", 100)
    val flac = FlacCodec.encode(16000, 1, 16, s, lpc = true)
    assert(FlacCodec.decode(flac).samples.toSeq == s.toSeq)
  }

  test("general LPC algebra: hand-assembled order-1 coeff 2 shift 1 stream") {
    // an INDEPENDENT construction (not our encoder): LPC prediction
    // (2·prev) >> 1 — exact for even products — with real CRCs + MD5
    class BW {
      val out = new java.io.ByteArrayOutputStream()
      var acc = 0L; var n = 0
      def put(v: Long, w: Int): Unit = {
        var k = w - 1
        while (k >= 0) {
          acc = (acc << 1) | ((v >>> k) & 1); n += 1
          if (n == 8) { out.write(acc.toInt); acc = 0; n = 0 }
          k -= 1
        }
      }
      def bytes: Array[Byte] = { if (n > 0) put(0, 8 - n); out.toByteArray }
    }
    val s = Array(100, 90, 105, 98, 110, 95, 101, 99,
      104, 97, 103, 100, 96, 102, 98, 101)
    val bs = s.length
    // STREAMINFO
    val si = new BW
    si.put(16, 16); si.put(16, 16); si.put(0, 24); si.put(0, 24)
    si.put(8000, 20); si.put(0, 3); si.put(15, 5); si.put(bs.toLong, 36)
    val pcm = new Array[Byte](2 * bs)
    s.indices.foreach { i =>
      pcm(2 * i) = (s(i) & 0xFF).toByte
      pcm(2 * i + 1) = ((s(i) >> 8) & 0xFF).toByte
    }
    val md5 = java.security.MessageDigest.getInstance("MD5").digest(pcm)
    val head = "fLaC".getBytes("US-ASCII") ++
      Array[Byte](0x80.toByte, 0, 0, 34) ++ si.bytes ++ md5
    // frame header: sync+res+blocking, bs code 6, sr 0, mono, 16-bit
    val fh = Array(0xFF, 0xF8, 0x60, 0x08, 0x00, bs - 1).map(_.toByte)
    val fw = new BW
    fh.foreach(b => fw.put(b & 0xFFL, 8))
    fw.put(FlacCodec.crc8(fh, 0, fh.length).toLong, 8)
    // LPC order 1 subframe: warmup, prec-1=3, shift=1, coeff=2
    fw.put(0x40, 8) // pad0 | 100000 | wasted0
    fw.put(s(0).toLong & 0xFFFF, 16)
    fw.put(3, 4); fw.put(1, 5); fw.put(2, 4)
    // residuals: method 0, partition order 0, rice param 2
    fw.put(0, 2); fw.put(0, 4); fw.put(2, 4)
    (1 until bs).foreach { i =>
      val resid = s(i).toLong - ((2L * s(i - 1)) >> 1)
      val zz = if (resid >= 0) resid << 1 else (-resid << 1) - 1
      var q = (zz >>> 2).toInt
      while (q > 0) { fw.put(0, 1); q -= 1 }
      fw.put(1, 1)
      fw.put(zz & 3, 2)
    }
    val body = fw.bytes
    val c16 = FlacCodec.crc16(body, 0, body.length)
    val flac = head ++ body ++
      Array(((c16 >> 8) & 0xFF).toByte, (c16 & 0xFF).toByte)
    val a = FlacCodec.decode(flac)
    assert(a.samples.toSeq == s.toSeq)
  }

  test("negative LPC shift fails loudly (hand-assembled stream)") {
    class BW {
      val out = new java.io.ByteArrayOutputStream()
      var acc = 0L; var n = 0
      def put(v: Long, w: Int): Unit = {
        var k = w - 1
        while (k >= 0) {
          acc = (acc << 1) | ((v >>> k) & 1); n += 1
          if (n == 8) { out.write(acc.toInt); acc = 0; n = 0 }
          k -= 1
        }
      }
      def bytes: Array[Byte] = { if (n > 0) put(0, 8 - n); out.toByteArray }
    }
    val bs = 16
    val si = new BW
    si.put(16, 16); si.put(16, 16); si.put(0, 24); si.put(0, 24)
    si.put(8000, 20); si.put(0, 3); si.put(15, 5); si.put(bs.toLong, 36)
    val head = "fLaC".getBytes("US-ASCII") ++
      Array[Byte](0x80.toByte, 0, 0, 34) ++ si.bytes ++ new Array[Byte](16)
    val fh = Array(0xFF, 0xF8, 0x60, 0x08, 0x00, bs - 1).map(_.toByte)
    val fw = new BW
    fh.foreach(b => fw.put(b & 0xFFL, 8))
    fw.put(FlacCodec.crc8(fh, 0, fh.length).toLong, 8)
    fw.put(0x40, 8) // LPC order 1 subframe
    fw.put(77L & 0xFFFF, 16) // warmup
    fw.put(3, 4) // precision-1
    fw.put(0x1F, 5) // shift = -1 (5-bit two's complement)
    fw.put(0, 8) // filler the decoder must never reach
    val e = intercept[IllegalArgumentException](
      FlacCodec.decode(head ++ fw.bytes ++ Array[Byte](0, 0)))
    assert(e.getMessage.contains("negative LPC shift"))
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
