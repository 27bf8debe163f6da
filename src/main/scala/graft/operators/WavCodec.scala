package graft.operators

import org.apache.spark.sql.Dataset

/** REAL zero-dependency WAV PCM codec — the audio twin of
  * [[PngCodec]]: where `Multimodal.wavMeta` reads only the RIFF
  * header, this decodes the SAMPLES, so audio-quality gates (peak /
  * clipping / RMS / zero-crossing rate — the loudness and silence
  * checks a speech-corpus pipeline runs before transcription) operate
  * on genuinely decoded PCM, not header fields.
  *
  * Decoder contract (fail-LOUDLY outside it, the Warc/PngCodec
  * discipline): RIFF/WAVE, fmt tag 1 (integer PCM), mono, 16-bit,
  * little-endian; chunks are walked by declared size (ancillary
  * chunks skipped), so a LIST/INFO chunk before `data` is handled and
  * a truncated `data` chunk fails.
  *
  * Stats are EXACT INTEGERS (n, peak, Σs², clip count, zero
  * crossings) so the cross-engine boundary is integer-only — the one
  * derived double (RMS) is computed at the Column edge from Σs²/n
  * with a single sqrt + round, identical IEEE ops in any engine.
  *
  * Scale shape: decode is mapPartitions, row-local, zero shuffle —
  * the sanctioned opaque-container parser class.
  */
object WavCodec {

  // ------------------------------------------------------------ encode

  /** Encode mono 16-bit PCM as a real RIFF/WAVE file. */
  def encode(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataSize = samples.length * 2
    val out = new java.io.ByteArrayOutputStream(44 + dataSize)
    def ascii(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    def le32(v: Int): Unit =
      (0 until 4).foreach(i => out.write((v >>> (8 * i)) & 0xFF))
    def le16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >>> 8) & 0xFF) }
    ascii("RIFF"); le32(36 + dataSize); ascii("WAVE")
    ascii("fmt "); le32(16); le16(1); le16(1) // PCM, mono
    le32(sampleRate); le32(sampleRate * 2)    // byte rate
    le16(2); le16(16)                         // block align, bits
    ascii("data"); le32(dataSize)
    samples.foreach(s => le16(s & 0xFFFF))
    out.toByteArray
  }

  // ------------------------------------------------------------ decode

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"WAV: $msg")

  /** Decode a mono 16-bit PCM WAV to its sample array. */
  def decode(wav: Array[Byte]): Array[Int] = {
    def ascii(off: Int, n: Int): String =
      if (off + n <= wav.length) new String(wav, off, n, "US-ASCII") else ""
    def le32(off: Int): Int =
      (wav(off) & 0xFF) | ((wav(off + 1) & 0xFF) << 8) |
        ((wav(off + 2) & 0xFF) << 16) | ((wav(off + 3) & 0xFF) << 24)
    def le16(off: Int): Int = (wav(off) & 0xFF) | ((wav(off + 1) & 0xFF) << 8)
    if (ascii(0, 4) != "RIFF" || ascii(8, 4) != "WAVE") fail("bad RIFF header")
    var p = 12
    var fmtSeen = false
    var samples: Array[Int] = null
    while (samples == null) {
      if (p + 8 > wav.length) fail(s"no data chunk (offset $p)")
      val tpe = ascii(p, 4)
      val len = le32(p + 4)
      if (len < 0 || p + 8 + len > wav.length)
        fail(s"truncated $tpe chunk at $p (declared $len)")
      tpe match {
        case "fmt " =>
          if (le16(p + 8) != 1) fail(s"non-PCM format tag ${le16(p + 8)}")
          if (le16(p + 10) != 1) fail(s"${le16(p + 10)} channels (mono only)")
          if (le16(p + 22) != 16) fail(s"${le16(p + 22)}-bit (16-bit only)")
          fmtSeen = true
        case "data" =>
          if (!fmtSeen) fail("data chunk before fmt")
          if (len % 2 != 0) fail(s"odd data size $len")
          samples = Array.tabulate(len / 2)(j => le16(p + 8 + 2 * j).toShort.toInt)
        case _ => () // ancillary chunk (LIST/INFO/fact) skipped
      }
      p += 8 + len + (len & 1) // chunks are word-aligned
    }
    samples
  }

  // ------------------------------------------------------------- stats

  /** Exact-integer PCM stats: `peak` = max |s|, `sumsq` = Σ s² (the RMS
    * sufficient statistic), `clip` = #{|s| ≥ 32512} (the top/bottom
    * 8-bit rail of the fixture's (b−128)·256 grid), `zerox` = sign
    * changes under the "s ≥ 0 is positive" convention. */
  final case class PcmStats(id: Long, n: Long, peak: Long, clip: Long,
                            zerox: Long, sumsq: Long)

  /** Decode + reduce a WAV payload column — mapPartitions, row-local,
    * zero shuffle. */
  def pcmStats(ds: Dataset[Multimodal.MediaRow]): Dataset[PcmStats] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      rows.map { r =>
        val s = decode(r.blob)
        var peak = 0L; var clip = 0L; var zerox = 0L; var sumsq = 0L
        var j = 0
        while (j < s.length) {
          val v = s(j)
          val a = math.abs(v.toLong)
          if (a > peak) peak = a
          if (a >= 32512) clip += 1
          if (j > 0 && ((v >= 0) != (s(j - 1) >= 0))) zerox += 1
          sumsq += v.toLong * v
          j += 1
        }
        PcmStats(r.id, s.length.toLong, peak, clip, zerox, sumsq)
      }
    }
  }

  /** Silence-trim offsets — the pre-transcription trim a speech
    * pipeline applies: `lead` = samples before the first |s| ≥ thr,
    * `kept` = the active span (first..last inclusive), `trail` =
    * samples after it. All-silent clips report (lead = n, kept = 0,
    * trail = 0) — the "drop this clip" signal. Exact integers. */
  final case class TrimStats(id: Long, n: Long, lead: Long, kept: Long,
                             trail: Long)

  /** Decode + trim-scan a WAV payload column at the given absolute
    * threshold — mapPartitions, row-local, zero shuffle. */
  def trimStats(ds: Dataset[Multimodal.MediaRow],
                threshold: Int): Dataset[TrimStats] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      rows.map { r =>
        val s = decode(r.blob)
        var first = -1; var last = -1
        var j = 0
        while (j < s.length) {
          if (math.abs(s(j)) >= threshold) { if (first < 0) first = j; last = j }
          j += 1
        }
        if (first < 0) TrimStats(r.id, s.length.toLong, s.length.toLong, 0L, 0L)
        else TrimStats(r.id, s.length.toLong, first.toLong,
          (last - first + 1).toLong, (s.length - 1 - last).toLong)
      }
    }
  }

  /** Energy-based voice-activity detection census — the frame gate a
    * speech pipeline runs before ASR (how much of this clip is
    * speech, and is there one usable contiguous run): fixed-length
    * frames, a frame is SPEECH when its mean square clears the
    * threshold — compared as `Σv² ≥ thr·n_frame`, so the decision is
    * BIGINT-exact with no division (frame Σv² ≤ 16·2³⁰ ≪ 2⁶³). The
    * final runt frame votes with its actual sample count. */
  final case class VadStats(id: Long, n: Long, nFrames: Long,
                            nSpeech: Long, longestRun: Long)

  /** Decode + VAD-scan a WAV payload column — mapPartitions,
    * row-local, zero shuffle. `meanSqThr` is the mean-square energy
    * floor (e.g. 16384² for a half-scale RMS gate). */
  def vadStats(ds: Dataset[Multimodal.MediaRow], frame: Int,
               meanSqThr: Long): Dataset[VadStats] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      rows.map { r =>
        val s = decode(r.blob)
        val nF = (s.length + frame - 1) / frame
        var nSp = 0L; var run = 0L; var longest = 0L
        var k = 0
        while (k < nF) {
          var ss = 0L; var c = 0L; var j = k * frame
          val end = math.min(s.length, (k + 1) * frame)
          while (j < end) { ss += s(j).toLong * s(j); c += 1; j += 1 }
          if (ss >= meanSqThr * c) {
            nSp += 1; run += 1; if (run > longest) longest = run
          } else run = 0
          k += 1
        }
        VadStats(r.id, s.length.toLong, nF.toLong, nSp, longest)
      }
    }
  }

  // --------------------------------------------------------- fixtures

  final case class AudioSig(id: Long, n: Long, phash: Long)

  /** 48-bit perceptual AUDIO hash (round 16 — the audio twin of the
    * image legs' dHash48): frame energies e_i = Σ v² over 16-sample
    * frames, bit i set when e_i > e_(i+1) over the first 49 frames
    * (frames past the clip count as energy 0). AMPLITUDE-INVARIANT
    * by construction — scaling every sample by k scales every energy
    * by k², preserving each comparison — so re-levelled re-posts of
    * one recording collide at hamming 0 while md5-independent clips
    * land at the banded collision floor. */
  def energyHash(samples: Array[Int], frame: Int = 16): Long = {
    val nFrames = 49
    val e = new Array[Long](nFrames)
    var j = 0
    while (j < samples.length && j < nFrames * frame) {
      val v = samples(j).toLong
      e(j / frame) += v * v
      j += 1
    }
    var h = 0L
    var i = 0
    while (i < 48) {
      if (e(i) > e(i + 1)) h |= 1L << (47 - i)
      i += 1
    }
    h
  }

  /** Decode + energy-hash a WAV payload column — mapPartitions,
    * row-local, zero shuffle; pairs ride the shared banded-hamming
    * skeleton like every phash leg. */
  def audioPHash(ds: Dataset[Multimodal.MediaRow]): Dataset[AudioSig] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      rows.map { r =>
        val s = decode(r.blob)
        AudioSig(r.id, s.length.toLong, energyHash(s))
      }
    }
  }

  /** Analytic paired fixture for [[audioPHash]]: 784 samples (49
    * full frames), sample j of doc `id` is
    *   (byte (j mod 16) of md5("a(id÷2)-(j÷16)") − 128) · 100 · (1 + id mod 2)
    * — each digest IS one frame, so frame energies are md5-mixed and
    * independent across groups; pairs sharing id÷2 differ by an
    * exact ×2 amplitude (a re-levelled re-post), which energyHash
    * must cancel. The oracle replays the UNSCALED base energies —
    * the hash's amplitude invariance makes the parity term vanish
    * analytically. */
  def synthWavPairs(ids: Dataset[java.lang.Long]): Dataset[Multimodal.MediaRow] = {
    import ids.sparkSession.implicits._
    ids.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { boxed =>
        val id = boxed.longValue()
        val scale = (100 * (1 + id % 2)).toInt
        val samples = Array.tabulate(784) { j =>
          val digest = md.digest(s"a${id / 2}-${j / 16}".getBytes("US-ASCII"))
          (((digest(j % 16) & 0xFF) - 128) * scale).toShort
        }
        Multimodal.MediaRow(id, "audio", encode(16000, samples))
      }
    }
  }

  /** Analytic mono PCM fixture: sample j of doc `id` is
    *   (byte (j mod 16) of md5("id-(j÷16)") − 128) · 256
    * with n = id mod 48 + 16 samples — md5 mixing (the PngCodec
    * fixture lesson) makes per-doc waveforms independent; the formula
    * is the DuckDB oracle's analytic contract (md5 exists in both
    * engines). The WAV bytes in between are real (44-byte header +
    * LE16 data through [[encode]]), so [[decode]]'s chunk walk and
    * sign handling are genuinely exercised. */
  def synthWavs(ids: Dataset[java.lang.Long]): Dataset[Multimodal.MediaRow] = {
    import ids.sparkSession.implicits._
    ids.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { boxed =>
        val id = boxed.longValue()
        val n = (id % 48 + 16).toInt
        val samples = Array.tabulate(n) { j =>
          val digest = md.digest(s"$id-${j / 16}".getBytes("US-ASCII"))
          (((digest(j % 16) & 0xFF) - 128) * 256).toShort
        }
        Multimodal.MediaRow(id, "audio", encode(16000, samples))
      }
    }
  }
}
