package graft.sources

import org.scalatest.funsuite.AnyFunSuite

class SnappySpec extends AnyFunSuite {

  private def bytes(s: String): Array[Byte] = s.getBytes("US-ASCII")

  private def md5Stream(seed: String, n: Int): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    while (out.size < n) {
      out.write(md.digest(s"$seed-$i".getBytes("US-ASCII")))
      i += 1
    }
    out.toByteArray.take(n)
  }

  test("hand-built vectors: every element type decodes correctly") {
    // "abcd" as a pure literal: varint 4, tag (4-1)<<2, payload
    assert(Snappy.uncompress(
      Array[Byte](4, (3 << 2).toByte) ++ bytes("abcd")).toSeq ==
      bytes("abcd").toSeq)
    // overlapping 1-byte-offset copy: "ab" then copy(off=2, len=6)
    // → "abababab"; tag = ((6-4)<<2)|1 with offset high bits 0
    assert(Snappy.uncompress(
      Array[Byte](8, (1 << 2).toByte) ++ bytes("ab") ++
        Array[Byte](((2 << 2) | 1).toByte, 2)).toSeq ==
      bytes("abababab").toSeq)
    // 2-byte-offset copy: "xy" + copy(off=2, len=2) → "xyxy"
    assert(Snappy.uncompress(
      Array[Byte](4, (1 << 2).toByte) ++ bytes("xy") ++
        Array[Byte](((1 << 2) | 2).toByte, 2, 0)).toSeq ==
      bytes("xyxy").toSeq)
    // 4-byte-offset copy: same but offset in 4 LE bytes
    assert(Snappy.uncompress(
      Array[Byte](4, (1 << 2).toByte) ++ bytes("xy") ++
        Array[Byte](((1 << 2) | 3).toByte, 2, 0, 0, 0)).toSeq ==
      bytes("xyxy").toSeq)
    // long literal (> 60): tag 60<<2 + 1 length byte
    val lit = md5Stream("lit", 100)
    assert(Snappy.uncompress(
      Array[Byte](100, (60 << 2).toByte, 99.toByte) ++ lit).toSeq ==
      lit.toSeq)
  }

  test("malformed streams fail loudly") {
    def msgOf(b: Array[Byte]): String =
      intercept[IllegalArgumentException](Snappy.uncompress(b)).getMessage
    assert(msgOf(Array[Byte]()).contains("truncated"))
    // zero copy offset
    assert(msgOf(Array[Byte](4, (1 << 2).toByte) ++ bytes("xy") ++
      Array[Byte](((1 << 2) | 2).toByte, 0, 0)).contains("offset"))
    // copy reaching before output start
    assert(msgOf(Array[Byte](4, (1 << 2).toByte) ++ bytes("xy") ++
      Array[Byte](((1 << 2) | 2).toByte, 9, 0)).contains("before"))
    // declared length larger than produced
    assert(msgOf(Array[Byte](9, (3 << 2).toByte) ++ bytes("abcd"))
      .contains("produced"))
    // literal overrunning declared length
    assert(msgOf(Array[Byte](2, (3 << 2).toByte) ++ bytes("abcd"))
      .contains("overruns"))
  }

  test("round-trip through our own compressor (repetitive + random)") {
    for (n <- Seq(0, 1, 5, 100, 5000)) {
      val rep = Array.tabulate[Byte](n)(i => ('a' + i % 7).toByte)
      assert(Snappy.uncompress(Snappy.compress(rep)).toSeq == rep.toSeq, s"rep $n")
      val rnd = md5Stream("rt", n)
      assert(Snappy.uncompress(Snappy.compress(rnd)).toSeq == rnd.toSeq, s"rnd $n")
    }
    // compression actually happens on repetitive data: copies are
    // length-capped at 64, so 10000 bytes ≈ 156 three-byte copies
    val big = Array.fill[Byte](10000)('z')
    assert(Snappy.compress(big).length < 600)
  }

  test("cross-check BOTH directions vs snappy-java (independent impl)") {
    val cases = Seq(
      md5Stream("x1", 333),
      Array.tabulate[Byte](4096)(i => ('a' + (i / 13) % 11).toByte),
      bytes("the quick brown fox " * 40),
      Array[Byte]())
    for ((data, i) <- cases.zipWithIndex) {
      // theirs → ours
      val theirs = org.xerial.snappy.Snappy.compress(data)
      assert(Snappy.uncompress(theirs).toSeq == data.toSeq, s"t→o case $i")
      // ours → theirs
      val ours = Snappy.compress(data)
      assert(org.xerial.snappy.Snappy.uncompress(ours).toSeq == data.toSeq,
        s"o→t case $i")
    }
  }
}
