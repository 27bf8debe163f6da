package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.FuzzHarness

/** The MP4 sample-table walk: stsc/stco chunk math against the
  * builder's gap-planted layout, the stss-absent all-sync default,
  * loud failures on malformed tables, and the hostile-input sweep. */
class Mp4SampleSpec extends AnyFunSuite {

  private def mdd = java.security.MessageDigest.getInstance("MD5")

  private def blobOf(id: Long): Array[Byte] = {
    val spark = graft.SparkSpec.session
    import spark.implicits._
    Multimodal.synthMp4s(Seq(java.lang.Long.valueOf(id)).toDS())
      .collect().head.blob
  }

  test("sync samples resolve through the real stsc/stco chunk math") {
    // id 5: 9 samples, 3 per chunk (spc = 5%2+2 = 3), sync 1/4/7
    val b = blobOf(5L)
    val got = Multimodal.mp4SyncSamplesOf(5L, b, mdd)
    assert(got.map(_.sample) == Seq(1, 4, 7))
    got.foreach { s =>
      // the emitted hash must equal md5 of the actual file slice
      val slice = java.util.Arrays.copyOfRange(b, s.offset.toInt,
        (s.offset + s.size).toInt)
      val hex = mdd.digest(slice).map(x => f"${x & 0xFF}%02x").mkString
      assert(s.payload_md5 == hex, s"sample ${s.sample}")
      // payloads are ASCII md5-hex prefixes by construction
      val txt = new String(slice, "US-ASCII")
      assert(txt.forall(c => "0123456789abcdef".contains(c)))
    }
    // chunk gaps: sample 4 starts 4 bytes past the naive prefix sum
    val naive = Multimodal.mp4SyncSamplesOf(5L, b, mdd)
    assert(naive.find(_.sample == 4).get.offset >
      naive.find(_.sample == 1).get.offset + naive.head.size)
  }

  test("absent stss means every sample is sync") {
    val b = blobOf(6L)
    // surgically drop the stss box: rebuild stbl without it by
    // truncating is fragile — instead blank its tag so find() skips
    // it and shrink… simpler: assert the builder's stss behavior and
    // exercise the absent path with a hand-built minimal file
    def be32(v: Long): Array[Byte] = Array(((v >> 24) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    def box(t: String, p: Array[Byte]): Array[Byte] =
      be32(p.length + 8L) ++ t.getBytes("US-ASCII") ++ p
    val payload = "abcdefgh".getBytes("US-ASCII")
    val mdat = box("mdat", payload) // at offset 0, payload at 8
    val stsz = box("stsz", be32(0) ++ be32(4) ++ be32(2)) // const size 4
    val stsc = box("stsc", be32(0) ++ be32(1) ++ be32(1) ++ be32(2) ++ be32(1))
    val stco = box("stco", be32(0) ++ be32(1) ++ be32(8))
    val moov = box("moov", box("trak", box("mdia", box("minf",
      box("stbl", stsz ++ stsc ++ stco)))))
    val file = mdat ++ moov
    val got = Multimodal.mp4SyncSamplesOf(9L, file, mdd)
    assert(got.map(_.sample) == Seq(1, 2)) // all sync
    assert(got.map(_.offset) == Seq(8L, 12L))
    assert(new String(file, 8, 4, "US-ASCII") == "abcd")
    assert(b.nonEmpty)
  }

  test("malformed tables fail loudly by name") {
    val b = blobOf(7L)
    def msgOf(mut: Array[Byte] => Unit): String = {
      val bad = b.clone(); mut(bad)
      intercept[IllegalArgumentException](
        Multimodal.mp4SyncSamplesOf(7L, bad, mdd)).getMessage
    }
    // kill the moov tag → "no moov box"
    val moovAt = b.indexOfSlice("moov".getBytes("US-ASCII"))
    assert(msgOf(_(moovAt) = 'x'.toByte).contains("no moov"))
    // kill stco → "no stco box"
    val stcoAt = b.indexOfSlice("stco".getBytes("US-ASCII"))
    assert(msgOf(_(stcoAt) = 'x'.toByte).contains("no stco"))
  }

  test("MP4 sample walk survives the hostile sweep") {
    FuzzHarness.assertClean(FuzzHarness.fuzz("mp4", blobOf(11L),
      bb => Multimodal.mp4SyncSamplesOf(11L, bb, mdd), seed = 1622))
  }
}
