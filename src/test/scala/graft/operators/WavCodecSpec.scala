package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The real WAV PCM codec (the PngCodec discipline on the audio leg).
  * Round-trips pin the LE16 sign handling and the chunk walk;
  * javax.sound.sampled provides an INDEPENDENT encoder cross-check
  * (decode bytes we did not produce); contract violations fail
  * loudly. Pure JVM, no Spark. */
class WavCodecSpec extends AnyFunSuite {

  // deterministic full-range samples: both rails, zero, sign changes
  private def samples(n: Int): Array[Short] =
    Array.tabulate(n) { j =>
      (((j * 7919 + 31) % 65536) - 32768).toShort
    }

  test("mono 16-bit round-trip is exact, rails included") {
    val s = samples(301) ++ Array[Short](Short.MinValue, Short.MaxValue, 0)
    val decoded = WavCodec.decode(WavCodec.encode(16000, s))
    assert(decoded.toSeq == s.map(_.toInt).toSeq)
  }

  test("ancillary chunks before data are skipped by declared size") {
    val s = samples(17)
    val plain = WavCodec.encode(8000, s)
    // splice a 7-byte (odd — exercises word-align padding) LIST chunk
    // between fmt and data
    val insertAt = 12 + 8 + 16 // RIFF header + fmt chunk
    val junk = "LIST".getBytes("US-ASCII") ++
      Array[Byte](7, 0, 0, 0) ++ Array.fill[Byte](8)(0x55) // 7 + pad
    val spliced = plain.take(insertAt) ++ junk ++ plain.drop(insertAt)
    assert(WavCodec.decode(spliced).toSeq == s.map(_.toInt).toSeq)
  }

  test("decodes WAVs from an INDEPENDENT encoder (javax.sound.sampled)") {
    val s = samples(211)
    val pcm = new Array[Byte](s.length * 2)
    s.zipWithIndex.foreach { case (v, j) =>
      pcm(2 * j) = (v & 0xFF).toByte
      pcm(2 * j + 1) = ((v >> 8) & 0xFF).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(16000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, s.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    assert(WavCodec.decode(bos.toByteArray).toSeq == s.map(_.toInt).toSeq)
  }

  test("contract violations fail loudly, not silently") {
    val ok = WavCodec.encode(16000, samples(9))
    intercept[IllegalArgumentException](WavCodec.decode(ok.drop(1))) // RIFF
    intercept[IllegalArgumentException](WavCodec.decode(ok.dropRight(3))) // data
    // stereo fails
    val stereo = ok.clone(); stereo(22) = 2
    intercept[IllegalArgumentException](WavCodec.decode(stereo))
    // 8-bit fails
    val eightBit = ok.clone(); eightBit(34) = 8
    intercept[IllegalArgumentException](WavCodec.decode(eightBit))
    // non-PCM format tag fails
    val alaw = ok.clone(); alaw(20) = 6
    intercept[IllegalArgumentException](WavCodec.decode(alaw))
  }

  test("synthWavs→pcmStats reproduces the analytic md5 contract (Spark)") {
    val spark = graft.SparkSpec.session
    import spark.implicits._
    val ids = Seq(0L, 1L, 7L, 47L, 48L, 1234L)
    val got = WavCodec.pcmStats(
        WavCodec.synthWavs(ids.map(java.lang.Long.valueOf).toDS()))
      .collect().map(p => p.id -> p).toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    ids.foreach { id =>
      // the oracle's analytic sample formula, replayed in plain Scala
      val n = (id % 48 + 16).toInt
      val vs = (0 until n).map { j =>
        val d = md.digest(s"$id-${j / 16}".getBytes("US-ASCII"))
        ((d(j % 16) & 0xFF) - 128) * 256
      }
      val p = got(id)
      assert(p.n == n.toLong, s"id=$id n")
      assert(p.peak == vs.map(v => math.abs(v.toLong)).max, s"id=$id peak")
      assert(p.sumsq == vs.map(v => v.toLong * v).sum, s"id=$id sumsq")
      assert(p.clip == vs.count(v => math.abs(v) >= 32512), s"id=$id clip")
      assert(p.zerox == vs.zip(vs.tail).count {
        case (a, b) => (a >= 0) != (b >= 0)
      }, s"id=$id zerox")
    }
  }

  test("energyHash is amplitude-invariant; planted pairs collide (Spark)") {
    val md = java.security.MessageDigest.getInstance("MD5")
    val base = Array.tabulate(784) { j =>
      val d = md.digest(s"eh-${j / 16}".getBytes("US-ASCII"))
      ((d(j % 16) & 0xFF) - 128) * 100
    }
    val h0 = WavCodec.energyHash(base)
    assert(h0 == WavCodec.energyHash(base.map(_ * 2)), "x2 re-level")
    assert(h0 == WavCodec.energyHash(base.map(_ * 3)), "louder re-post")
    // a genuinely different recording lands far away
    val other = Array.tabulate(784) { j =>
      val d = md.digest(s"zz-${j / 16}".getBytes("US-ASCII"))
      ((d(j % 16) & 0xFF) - 128) * 100
    }
    assert(java.lang.Long.bitCount(h0 ^ WavCodec.energyHash(other)) > 6)
    // the Spark fixture: pairs sharing id/2 hash identically
    val spark = graft.SparkSpec.session
    import spark.implicits._
    val ids = (0L until 20L).map(java.lang.Long.valueOf)
    val sigs = WavCodec.audioPHash(WavCodec.synthWavPairs(ids.toDS()))
      .collect().map(s => s.id -> s.phash).toMap
    (0L until 20L by 2).foreach { even =>
      assert(sigs(even) == sigs(even + 1), s"pair ($even, ${even + 1})")
    }
  }
}
