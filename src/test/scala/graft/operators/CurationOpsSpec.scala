package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Chunk geometry boundaries (VERDICT r10 #4): runt last chunk kept,
  * whole-doc single chunk, empty doc emits nothing, full positional
  * coverage, and the overlap >= budget config bug fails loudly. */
class ChunkerSpec extends SparkSpec {
  import spark.implicits._

  private def doc(id: Long, nTok: Int) =
    (id, (1 to nTok).map(i => s"w$i").mkString(" "))

  test("last chunk is a runt, kept, and chunks tile with the overlap") {
    // 11 tokens, budget 4, overlap 1 → stride 3 → starts 0,3,6,9;
    // the final chunk holds only 2 tokens (the tail must not be lost)
    val got = Chunker.tokenChunks(Seq(doc(7L, 11)).toDF("id", "text"),
        "id", "text", budget = 4, overlap = 1)
      .select("chunk_id", "first_pos", "n_tokens")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((0L, 0L, 4L), (1L, 3L, 4L), (2L, 6L, 4L),
      (3L, 9L, 2L)))
    // coverage: every position 0..10 falls in some chunk, and each
    // consecutive pair shares exactly `overlap` positions
    val covered = got.flatMap { case (_, f, n) => f until (f + n) }.toSet
    assert(covered == (0L until 11L).toSet)
  }

  test("a document within budget is a single exact chunk; empty emits none") {
    val got = Chunker.tokenChunks(
        Seq(doc(1L, 4), (2L, "   ")).toDF("id", "text"),
        "id", "text", budget = 32, overlap = 8)
      .select("id", "chunk_id", "first_pos", "n_tokens")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 0L, 0L, 4L)))
  }

  test("an exactly-aligned tail produces no empty trailing chunk") {
    // 7 tokens, budget 4, overlap 1 → stride 3: starts 0,3 cover all
    // 7; a start at 6 would duplicate-only (1 overlap token + nothing
    // new past position 6) — n_chunks = 1+ceil((7-4)/3) = 2
    val got = Chunker.tokenChunks(Seq(doc(3L, 7)).toDF("id", "text"),
        "id", "text", budget = 4, overlap = 1)
      .select("chunk_id", "n_tokens").as[(Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((0L, 4L), (1L, 4L)))
  }

  test("overlap >= budget is rejected") {
    val df = Seq(doc(1L, 5)).toDF("id", "text")
    intercept[IllegalArgumentException] {
      Chunker.tokenChunks(df, "id", "text", budget = 4, overlap = 4)
    }
    intercept[IllegalArgumentException] {
      Chunker.tokenChunks(df, "id", "text", budget = 4, overlap = 7)
    }
    // overlap = budget-1 is the legal extreme
    assert(Chunker.tokenChunks(df, "id", "text", budget = 4, overlap = 3)
      .count() == 2) // stride 1, n=5 → 1+ceil((5-4)/1) = 2 chunks
  }

  test("cdc chunks reassemble to the document and cover it disjointly") {
    val text = (1 to 40).map(i => s"sentence number $i ends here.").mkString(" ")
    val got = Chunker.cdcChunks(Seq((1L, text)).toDF("id", "text"),
        "id", "text")
      .select("chunk_idx", "chunk").as[(Long, String)].collect()
      .sortBy(_._1)
    assert(got.map(_._2).mkString == text)   // exact disjoint tiling
    assert(got.length > 1)                   // content produced cuts
    assert(got.map(_._1).toSeq == got.indices.map(_.toLong))
  }

  test("cdc boundaries re-synchronize: shared suffix chunks align across docs") {
    // two docs with DIFFERENT-length unique prefixes + the same long
    // tail: fixed-width grids misalign every tail chunk; CDC cuts
    // depend only on the local window, so tail chunks (past the first
    // in-tail boundary) hash identically in both docs
    val tail = (1 to 12).map(i => s"shared boilerplate sentence $i.").mkString(" ")
    val docs = Seq((1L, "short prefix. " + tail),
      (2L, "a much longer and entirely different prefix text here. " + tail))
      .toDF("id", "text")
    val shared = Chunker.cdcChunks(docs, "id", "text")
      .groupBy(col("chunk_hash"))
      .agg(countDistinct(col("id")).as("nd"), min(col("chunk_len")).as("l"))
      .filter(col("nd") === 2).collect()
    assert(shared.nonEmpty, "no shared chunk despite identical 350-char tail")
    // the shared region is substantial, not a 1-char coincidence
    assert(shared.map(_.getLong(2)).sum > 100)
  }

  test("cdc: a document shorter than the hash window is one whole chunk") {
    val got = Chunker.cdcChunks(Seq((1L, "tiny")).toDF("id", "text"),
        "id", "text")
      .select("chunk_idx", "chunk").as[(Long, String)].collect().toSeq
    assert(got == Seq((0L, "tiny")))
  }
}

class PackingSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    ("en", 1L, 100L), ("en", 2L, 100L), ("en", 3L, 100L), ("en", 4L, 50L),
    ("de", 10L, 300L), ("de", 11L, 10L))
    .toDF("lang", "id", "n")

  test("bin = start-offset div budget, per stratum, in order-col order") {
    val got = Packing.packByBudget(docs, Seq("lang"), "id", "n", budget = 256)
      .select("lang", "id", "bin").as[(String, Long, Long)].collect().toSet
    // en starts: 0,100,200,300 → bins 0,0,0,1 ; de starts: 0,300 → 0,1
    assert(got == Set(("en", 1L, 0L), ("en", 2L, 0L), ("en", 3L, 0L),
      ("en", 4L, 1L), ("de", 10L, 0L), ("de", 11L, 1L)))
  }

  test("binStats aggregates docs, size, and fill ratio per bin") {
    val got = Packing.binStats(docs, Seq("lang"), "id", "n", budget = 256)
      .select("lang", "bin", "n_docs", "total_size")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got == Set(("en", 0L, 3L, 300L), ("en", 1L, 1L, 50L),
      ("de", 0L, 1L, 300L), ("de", 1L, 1L, 10L)))
  }

  test("a doc straddling the boundary stays with the bin it starts in") {
    val one = Seq(("x", 1L, 200L), ("x", 2L, 200L)).toDF("lang", "id", "n")
    val got = Packing.packByBudget(one, Seq("lang"), "id", "n", budget = 256)
      .select("id", "bin").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 0L)) // second doc starts at 200 < 256
  }
}

class WeightedSamplingSpec extends SparkSpec {
  import spark.implicits._

  test("per-stratum rates apply independently and deterministically") {
    val df = (1L to 4000L).map(i => (i, if (i % 2 == 0) "a" else "b"))
      .toDF("id", "s")
    val kept = Sampling.weighted(df, "id", "s", Map("a" -> 10000, "b" -> 0))
      .select("s").as[String].collect()
    assert(kept.toSet == Set("a") && kept.length == 2000)
    val half = Sampling.weighted(df, "id", "s", Map("a" -> 5000), defaultPermyriad = 5000)
    val n = half.count()
    assert(n > 4000 * 0.45 && n < 4000 * 0.55, s"kept $n of 4000")
    // determinism across partitioning
    val again = Sampling.weighted(df.repartition(7), "id", "s", Map("a" -> 5000),
      defaultPermyriad = 5000).select("id").as[Long].collect().toSet
    assert(again == half.select("id").as[Long].collect().toSet)
  }

  test("rate bounds are validated") {
    val df = Seq((1L, "a")).toDF("id", "s")
    intercept[IllegalArgumentException](
      Sampling.weighted(df, "id", "s", Map("a" -> 10001)))
  }
}

class PqSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private val dir = "/root/testdata/sf0.001"

  test("codebooks: m subspaces × k codewords of the subspace dimension") {
    val e = graft.Tables.embeddings(spark, dir).filter(col("vec_id") >= 16)
    val cb = Pq.codebooks(e, m = 4, subDim = 16, k = 4, iters = 1)
      .select(col("s"), col("code"), size(col("cw")).as("d"))
      .as[(Int, Long, Int)].collect()
    assert(cb.length == 16) // 4 × 4 (no empty cells on this data)
    assert(cb.forall(_._3 == 16))
    assert(cb.map(_._1).toSet == Set(0, 1, 2, 3))
  }

  test("encode emits one bounded code per (vector, subspace)") {
    val e = graft.Tables.embeddings(spark, dir).filter(col("vec_id") >= 16)
    val cb = Pq.codebooks(e, m = 4, subDim = 16, k = 4, iters = 1).cache()
    val codes = Pq.encode(e, cb, m = 4, subDim = 16)
    val n = e.count()
    assert(codes.count() == n * 4)
    val cwIds = cb.select("code").as[Long].collect().toSet
    assert(codes.select("code").as[Long].collect().forall(cwIds.contains))
  }

  test("ADC retrieves planted duplicates and overlaps the exact ranking") {
    val e = graft.Tables.embeddings(spark, dir)
    val corpus = e.filter(col("vec_id") >= 16).select(col("vec_id"), col("embedding"))
    // queries = exact copies of 8 corpus vectors under fresh ids: the
    // retrieval contract that matters for dedup-style use is that the
    // planted twin lands in the ADC top-k
    val queries = corpus.filter(col("vec_id") % 60 === 0)
      .orderBy(col("vec_id")).limit(8) // deterministic subset
      .select((col("vec_id") + 1000000).as("vec_id"), col("embedding"))
    val cb = Pq.codebooks(corpus, m = 4, subDim = 16, k = 16, iters = 1).cache()
    val pq = Pq.adcTopK(corpus, queries, cb, m = 4, subDim = 16, k = 5)
      .select("query_id", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val twins = pq.keys.toSeq.map(q => pq(q).contains(q - 1000000))
    assert(twins.count(identity) >= 6,
      s"planted twin in top-5 for only ${twins.count(identity)}/8 queries")
    // and nontrivial agreement with the exact ranking
    val bf = Ann.bruteForceTopK(corpus, queries, 5)
      .select("query_id", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val overlaps = bf.keys.toSeq.map(q => (pq.getOrElse(q, Set.empty) & bf(q)).size)
    val mean = overlaps.sum.toDouble / overlaps.size
    assert(mean >= 1.0, s"mean top-5 overlap $mean (per-query: $overlaps)")
  }
}

class IvfPqSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private val dir = "/root/testdata/sf0.001"

  test("residuals reconstruct: centroid + residual == original vector") {
    val e = graft.Tables.embeddings(spark, dir).filter(col("vec_id") >= 16)
      .select(col("vec_id"), col("embedding"))
    val anchors = Ann.kmeansAnchors(e, k = 4, iters = 1).cache()
    val a = anchors.select(col("vec_id").as("cell"), col("embedding").as("av"))
    val res = Pq.residuals(e, anchors)
    assert(res.count() == e.count()) // exactly one cell per vector
    // max |(c + r) − x| over all dims: (x − c) + c re-rounds once, so
    // the bound is a few ulps, not exact zero
    val err = res.join(a, "cell")
      .join(e.select(col("vec_id"), col("embedding").as("orig")), "vec_id")
      .select(aggregate(
        zip_with(zip_with(col("av"), col("embedding"), (c, r) => c + r),
          transform(col("orig"), x => x.cast("double")),
          (rec, x) => abs(rec - x)),
        lit(0.0), (acc, d) => greatest(acc, d)).as("m"))
      .agg(max(col("m"))).as[Double].head()
    assert(err <= 1e-12, s"reconstruction error $err")
    anchors.unpersist()
  }

  test("IVF-PQ retrieves planted twins and overlaps the exact ranking") {
    val e = graft.Tables.embeddings(spark, dir)
    val corpus = e.filter(col("vec_id") >= 16).select(col("vec_id"), col("embedding"))
    // queries = exact copies of 8 corpus vectors under fresh ids: the
    // copy routes to its twin's coarse cell by construction, so the
    // twin is always a candidate; the residual ADC must then rank it
    // into the top-k for the dedup-style retrieval contract to hold
    val queries = corpus.filter(col("vec_id") % 60 === 0)
      .orderBy(col("vec_id")).limit(8)
      .select((col("vec_id") + 1000000).as("vec_id"), col("embedding"))
    val anchors = Ann.kmeansAnchors(corpus, k = 4, iters = 1).cache()
    val cb = Pq.codebooks(Pq.residuals(corpus, anchors).select("vec_id", "embedding"),
      m = 4, subDim = 16, k = 16, iters = 1).cache()
    val got = Pq.ivfPqTopK(corpus, queries, anchors, cb,
        m = 4, subDim = 16, k = 5, nprobe = 2)
      .select("query_id", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val twins = got.keys.toSeq.map(q => got(q).contains(q - 1000000))
    assert(twins.count(identity) >= 6,
      s"planted twin in top-5 for only ${twins.count(identity)}/8 queries")
    val bf = Ann.bruteForceTopK(corpus, queries, 5)
      .select("query_id", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val overlaps = bf.keys.toSeq.map(q => (got.getOrElse(q, Set.empty) & bf(q)).size)
    val mean = overlaps.sum.toDouble / overlaps.size
    assert(mean >= 1.0, s"mean top-5 overlap $mean (per-query: $overlaps)")
    anchors.unpersist(); cb.unpersist()
  }

  test("reloaded quantizers reproduce IVF-PQ search exactly (train once, serve many)") {
    val e = graft.Tables.embeddings(spark, dir)
    val corpus = e.filter(col("vec_id") >= 16).select(col("vec_id"), col("embedding"))
    val queries = e.filter(col("vec_id") >= 8 && col("vec_id") < 16)
      .select(col("vec_id"), col("embedding"))
    val anchors = Ann.kmeansAnchors(corpus, k = 4, iters = 1).cache()
    val cb = Pq.codebooks(Pq.residuals(corpus, anchors).select("vec_id", "embedding"),
      m = 4, subDim = 16, k = 4, iters = 1).cache()
    val store = java.nio.file.Files.createTempDirectory("graft-quant").toString
    QuantizerStore.save(anchors, cb, store)
    val (a2, cb2) = (QuantizerStore.loadAnchors(spark, store),
      QuantizerStore.loadCodebooks(spark, store))
    // the 6-dp training doubles round-trip parquet bit-exactly...
    assert(a2.collect().map(_.toSeq).toSet == anchors.collect().map(_.toSeq).toSet)
    assert(cb2.collect().map(_.toSeq).toSet == cb.collect().map(_.toSeq).toSet)
    // ...so a search served from the store equals the in-session one
    def run(a: org.apache.spark.sql.DataFrame, c: org.apache.spark.sql.DataFrame) =
      Pq.ivfPqTopK(corpus, queries, a, c, m = 4, subDim = 16, k = 5, nprobe = 2)
        .select("query_id", "rk", "vec_id", "approx_cosine")
        .as[(Long, Int, Long, Double)].collect().toSet
    assert(run(anchors, cb) == run(a2, cb2))
    anchors.unpersist(); cb.unpersist()
  }

  test("checkpointResiduals is result-invariant (lineage cut only)") {
    val e = graft.Tables.embeddings(spark, dir)
    val corpus = e.filter(col("vec_id") >= 16).select(col("vec_id"), col("embedding"))
    val queries = e.filter(col("vec_id") >= 8 && col("vec_id") < 16)
      .select(col("vec_id"), col("embedding"))
    val anchors = Ann.kmeansAnchors(corpus, k = 4, iters = 1).cache()
    val cb = Pq.codebooks(Pq.residuals(corpus, anchors).select("vec_id", "embedding"),
      m = 4, subDim = 16, k = 4, iters = 1).cache()
    def run(ckpt: Boolean) = Pq.ivfPqTopK(corpus, queries, anchors, cb,
        m = 4, subDim = 16, k = 5, nprobe = 2, checkpointResiduals = ckpt)
      .select("query_id", "rk", "vec_id", "approx_cosine")
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(run(ckpt = false) == run(ckpt = true))
    anchors.unpersist(); cb.unpersist()
  }
}

class VideoBoxSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.Multimodal
  import graft.operators.Multimodal.MediaRow

  private def box(tag: String, payload: Array[Byte]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + payload.length)
    bb.putInt(8 + payload.length).put(tag.getBytes("ISO-8859-1")).put(payload)
    bb.array()
  }

  private def mvhd(version: Int, ts: Long, dur: Long): Array[Byte] = {
    val times = if (version == 0) 4 else 8
    val bb = java.nio.ByteBuffer.allocate(4 + 2 * times + 4 + times + 80)
    bb.putInt(version << 24) // version + zero flags
    if (version == 0) { bb.putInt(0); bb.putInt(0); bb.putInt(ts.toInt); bb.putInt(dur.toInt) }
    else { bb.putLong(0L); bb.putLong(0L); bb.putInt(ts.toInt); bb.putLong(dur) }
    // rate/volume/reserved/matrix/pre_defined/next_track — zeros fine
    box("mvhd", bb.array())
  }

  private def ftyp: Array[Byte] = box("ftyp", "isom0000".getBytes)

  test("walk finds moov before or after mdat; v0 and v1 mvhd") {
    val canonical = ftyp ++ box("moov", mvhd(0, 1000, 4500))
    val postMdat = ftyp ++ box("mdat", Array.fill[Byte](32)(7)) ++
      box("moov", box("iods", Array[Byte](1, 2)) ++ mvhd(0, 600, 1234))
    val v1 = ftyp ++ box("moov", mvhd(1, 90000, 123456789L))
    val rows = Seq(
      MediaRow(1, "video", canonical), MediaRow(2, "video", postMdat),
      MediaRow(3, "video", v1), MediaRow(4, "video", "nope".getBytes),
      MediaRow(5, "video", canonical.take(20))) // truncated
    val got = Multimodal.mp4Meta(rows.toDS())
      .collect().map(m => m.id -> ((m.timescale, m.duration, m.duration_ms))).toMap
    assert(got == Map(
      1L -> ((1000L, 4500L, 4500L)),
      2L -> ((600L, 1234L, 2056L)),
      3L -> ((90000L, 123456789L, 1371742L))))
  }

  test("canonical Column parser agrees with the walker and rejects post-mdat") {
    val canonical = ftyp ++ box("moov", mvhd(0, 1000, 4500))
    val postMdat = ftyp ++ box("mdat", Array.fill[Byte](16)(7)) ++
      box("moov", mvhd(0, 600, 1234))
    // a corrupt ftyp size (0xFFFFFFFF) must yield NULL, not an ANSI
    // cast overflow from the derived moov offset
    val corrupt = Array[Byte](-1, -1, -1, -1) ++ "ftypisom".getBytes ++
      new Array[Byte](16)
    val df = Seq((1L, canonical), (2L, postMdat), (3L, corrupt)).toDF("id", "mp4")
    val meta = Multimodal.mp4MetaCanonical(col("mp4"))
    val got = df.select(col("id"), meta.getField("duration_ms").as("ms"))
      .as[(Long, Option[Long])].collect().toMap
    assert(got == Map(1L -> Some(4500L), 2L -> None, 3L -> None))
  }
}

class ImageHeaderSpec extends SparkSpec {
  import spark.implicits._

  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(29)
    bb.put(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    bb.putInt(13).put("IHDR".getBytes).putInt(w).putInt(h)
    bb.put(Array[Byte](8, 6, 0, 0, 0))
    bb.array()
  }

  /** Minimal JPEG: SOI, APP0 segment, a DQT segment, SOF0 with dims. */
  private def jpegBytes(w: Int, h: Int): Array[Byte] = {
    def seg(marker: Int, payload: Array[Byte]): Array[Byte] =
      Array(0xff.toByte, marker.toByte,
        ((payload.length + 2) >> 8).toByte, ((payload.length + 2) & 0xff).toByte) ++ payload
    val sof = Array[Byte](8,
      (h >> 8).toByte, (h & 0xff).toByte, (w >> 8).toByte, (w & 0xff).toByte, 3)
    Array(0xff.toByte, 0xd8.toByte) ++
      seg(0xe0, "JFIF".getBytes ++ Array[Byte](0)) ++
      seg(0xdb, Array.fill[Byte](65)(1)) ++
      seg(0xc0, sof)
  }

  test("pngDims reads IHDR dims as a pure Column expression; rejects non-PNG") {
    val df = Seq((1L, pngBytes(640, 480)), (2L, pngBytes(13, 7)),
      (3L, "not a png at all".getBytes)).toDF("id", "png")
    val got = df.select(col("id"),
        Multimodal.pngDims(col("png")).as("d"))
      .select(col("id"), col("d.width"), col("d.height"))
      .as[(Long, Option[Long], Option[Long])].collect().toSet
    assert(got == Set((1L, Some(640L), Some(480L)), (2L, Some(13L), Some(7L)),
      (3L, None, None)))
  }

  test("gifDims reads the little-endian screen size") {
    val gif = "GIF89a".getBytes ++ Array[Byte](
      (320 & 0xff).toByte, (320 >> 8).toByte, (200 & 0xff).toByte, (200 >> 8).toByte)
    val df = Seq((1L, gif)).toDF("id", "g")
    val got = df.select(Multimodal.gifDims(col("g")).as("d"))
      .select(col("d.width"), col("d.height")).as[(Long, Long)].head()
    assert(got == ((320L, 200L)))
  }

  /** Canonical 44-byte PCM WAV header, little-endian fields. */
  private def wavBytes(channels: Int, rate: Int, dataSize: Int,
                       fmtTag: Int = 1, magic: String = "RIFF"): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(44)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(magic.getBytes).putInt(dataSize + 36)
    bb.put("WAVEfmt ".getBytes).putInt(16)
    bb.putShort(fmtTag.toShort).putShort(channels.toShort)
    bb.putInt(rate).putInt(rate * channels * 2)
    bb.putShort((channels * 2).toShort).putShort(16)
    bb.put("data".getBytes).putInt(dataSize)
    bb.array()
  }

  test("wavMeta reads PCM header fields and integer-exact duration") {
    val df = Seq(
      (1L, wavBytes(2, 44100, 1764000)), // 10 s stereo
      (2L, wavBytes(1, 8000, 4001)))     // truncating division: 250.0625 ms
      .toDF("id", "wav")
    val got = df.select(col("id"), Multimodal.wavMeta(col("wav")).as("m"))
      .select(col("id"), col("m.channels"), col("m.sample_rate"),
        col("m.bits"), col("m.duration_ms"))
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 44100L, 16L, 10000L), (2L, 1L, 8000L, 16L, 250L)))
  }

  test("wavMeta rejects wrong magic, non-PCM, and truncated payloads") {
    val df = Seq(
      (1L, wavBytes(2, 44100, 1000, magic = "RIFX")),  // wrong container
      (2L, wavBytes(2, 44100, 1000, fmtTag = 3)),      // IEEE-float, not PCM
      (3L, wavBytes(2, 44100, 1000).take(36)),         // truncated before "data"
      (4L, "not audio".getBytes),
      (5L, Array.empty[Byte]))
      .toDF("id", "wav")
    val got = df.select(col("id"),
        Multimodal.wavMeta(col("wav")).isNull.as("n"))
      .as[(Long, Boolean)].collect().toMap
    assert(got.values.forall(identity), s"expected all NULL, got $got")
  }

  test("jpegDims walks markers to SOF0 and survives junk input") {
    val ds = Seq(
      Multimodal.MediaRow(1L, "image", jpegBytes(1024, 768)),
      Multimodal.MediaRow(2L, "image", jpegBytes(64, 32)),
      Multimodal.MediaRow(3L, "image", Array[Byte](1, 2, 3)))
      .toDS()
    val got = Multimodal.jpegDims(ds).collect().map(d => d.id -> ((d.format, d.width, d.height))).toMap
    assert(got(1L) == (("jpeg", 1024, 768)))
    assert(got(2L) == (("jpeg", 64, 32)))
    assert(got(3L) == (("unknown", -1, -1)))
  }
}

class PagerankSpec extends SparkSpec {
  import spark.implicits._

  test("star-graph hub outranks leaves; clique members rank equally") {
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L)).toDF("a", "b")
    val pr = Components.pagerankFixed(star, "a", "b", iters = 2)
      .as[(Long, Long)].collect().toMap
    assert(pr(1L) > pr(2L))
    assert(Set(2L, 3L, 4L, 5L).map(pr).size == 1) // leaves identical
    val clique = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("a", "b")
    val cp = Components.pagerankFixed(clique, "a", "b", iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(cp.values.toSet.size == 1) // symmetric → equal ranks
    assert(cp(1L) == 999999L || cp(1L) == 1000000L) // fixpoint ≈ 1.0 (div truncation)
  }

  test("ranks are partition-independent (integer arithmetic, no float sums)") {
    val edges = (1L to 400L).map(i => (i, (i * 7) % 401 + 1)).toDF("a", "b")
    val one = Components.pagerankFixed(edges, "a", "b", 2)
      .as[(Long, Long)].collect().toSet
    val many = Components.pagerankFixed(edges.repartition(13), "a", "b", 2)
      .as[(Long, Long)].collect().toSet
    assert(one == many)
  }

  test("the persist-per-iteration path (iters >= 4) agrees with the lazy chain") {
    // same graph, one extra converged iteration: the clique fixpoint
    // is stable, so heavy (persisted) and lazy modes must agree
    val clique = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("a", "b")
    val lazyRanks = Components.pagerankFixed(clique, "a", "b", iters = 3)
      .as[(Long, Long)].collect().toMap
    val heavy = Components.pagerankFixed(clique, "a", "b", iters = 4)
    val heavyRanks = heavy.as[(Long, Long)].collect().toMap
    heavy.unpersist()
    assert(lazyRanks == heavyRanks)
  }
}

class Mp3HeaderSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._
  import graft.operators.Multimodal

  /** ID3v2 header + zero tag body + one MPEG frame header + payload. */
  private def mp3(tagSize: Int, b2: Int, brIdx: Int, srIdx: Int,
                  mode: Int, payload: Int): Array[Byte] = {
    val head = Array[Byte]('I', 'D', '3', 4, 0, 0,
      ((tagSize >> 21) & 0x7f).toByte, ((tagSize >> 14) & 0x7f).toByte,
      ((tagSize >> 7) & 0x7f).toByte, (tagSize & 0x7f).toByte)
    val frame = Array[Byte](0xff.toByte, b2.toByte,
      ((brIdx << 4) | (srIdx << 2)).toByte, (mode << 6).toByte)
    head ++ new Array[Byte](tagSize) ++ frame ++ new Array[Byte](payload)
  }

  private def parse(rows: Seq[(Long, Array[Byte])]) = {
    val meta = Multimodal.mp3Meta(col("b"))
    rows.toDF("id", "b").select(col("id"),
        meta.getField("tag_size").as("t"),
        meta.getField("bitrate_kbps").as("kbps"),
        meta.getField("sample_rate").as("sr"),
        meta.getField("channels").as("ch"),
        meta.getField("duration_ms").as("ms"))
      .as[(Long, Option[Long], Option[Long], Option[Long], Option[Long], Option[Long])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
  }

  test("syncsafe tag size decodes across all four 7-bit bytes") {
    // 0x0820408 = b7=4, b8=8, b9=16, b10=8 — every syncsafe byte live.
    // audio = 4 + 1000 bytes at 128 kbps → floor(1004·8000/128000) = 62 ms
    val big = 4 << 21 | 8 << 14 | 16 << 7 | 8
    val got = parse(Seq(
      (1L, mp3(big, 0xfb, 9, 0, 3, 1000)),
      (2L, mp3(130, 0xfb, 14, 1, 0, 500)))) // 2-byte syncsafe, stereo
    assert(got(1L) == ((Some(big.toLong), Some(128L), Some(44100L),
      Some(1L), Some(62L))))
    assert(got(2L) == ((Some(130L), Some(320L), Some(48000L), Some(2L),
      Some((504L * 8000L) / 320000L))))
  }

  test("reserved/free bitrate index, bad sync, MPEG-2, non-ID3, truncated → NULL") {
    val got = parse(Seq(
      (1L, mp3(10, 0xfb, 0, 0, 0, 100)),   // free-format bitrate
      (2L, mp3(10, 0xfb, 15, 0, 0, 100)),  // reserved bitrate
      (3L, mp3(10, 0xfb, 9, 3, 0, 100)),   // reserved sample rate
      (4L, mp3(10, 0xf3, 9, 0, 0, 100)),   // MPEG-2 (version bits 10)
      (5L, mp3(10, 0xfd, 9, 0, 0, 100)),   // Layer II
      (6L, "not an mp3 at all".getBytes("UTF-8")),
      (7L, mp3(10, 0xfb, 9, 0, 0, 100).take(12)))) // truncated mid-tag
    (1L to 7L).foreach { id =>
      assert(got(id) == ((None, None, None, None, None)), s"id=$id")
    }
  }

  // ---------------------------------------------------- VBR (r13 #4)

  private def be32(v: Long): Array[Byte] = Array(
    ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
    ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  /** mp3() with a Xing/Info or VBRI block after the side info. */
  private def vbrMp3(chMode: Int, magic: String, flags: Long,
                     frames: Long, payload: Int): Array[Byte] = {
    val head = Array[Byte]('I', 'D', '3', 4, 0, 0, 0, 0, 0, 10)
    val frame = Array[Byte](0xff.toByte, 0xfb.toByte,
      ((9 << 4) | (0 << 2)).toByte, (chMode << 6).toByte) // 128k, 44.1k
    val side = new Array[Byte](
      if (magic == "VBRI") 32 else if (chMode == 3) 17 else 32)
    val block = magic match {
      case "Xing" | "Info" =>
        magic.getBytes("US-ASCII") ++ be32(flags) ++ be32(frames)
      case "VBRI" =>
        "VBRI".getBytes("US-ASCII") ++ Array[Byte](0, 1, 0, 0, 0, 0) ++
          be32(0L) ++ be32(frames)
    }
    head ++ new Array[Byte](10) ++ frame ++ side ++ block ++
      new Array[Byte](payload)
  }

  private def parseVbr(rows: Seq[(Long, Array[Byte])]) = {
    val meta = Multimodal.mp3Meta(col("b"))
    rows.toDF("id", "b").select(col("id"),
        meta.getField("mode").as("m"),
        meta.getField("vbr_frames").as("fr"),
        meta.getField("duration_ms").as("ms"))
      .as[(Long, Option[String], Option[Long], Option[Long])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
  }

  test("Xing/Info frame count gives exact VBR duration at both side-info widths") {
    // 2000 frames · 1152 / 44100 Hz = 52244.89… ms → floor 52244
    val got = parseVbr(Seq(
      (1L, vbrMp3(3, "Xing", 1L, 2000L, 300)), // mono: side info 17
      (2L, vbrMp3(0, "Xing", 1L, 2000L, 300)), // stereo: side info 32
      (3L, vbrMp3(3, "Info", 1L, 777L, 300)))) // Info alias, mono
    assert(got(1L) == ((Some("xing"), Some(2000L),
      Some(2000L * 1152000L / 44100L))))
    assert(got(2L) == got(1L))
    assert(got(3L) == ((Some("xing"), Some(777L),
      Some(777L * 1152000L / 44100L))))
  }

  test("VBRI frame count at the fixed 32-byte offset; channel mode irrelevant") {
    val got = parseVbr(Seq(
      (1L, vbrMp3(0, "VBRI", 0L, 4321L, 300)),
      (2L, vbrMp3(3, "VBRI", 0L, 4321L, 300))))
    val want = ((Some("vbri"), Some(4321L), Some(4321L * 1152000L / 44100L)))
    assert(got(1L) == want && got(2L) == want)
  }

  test("Xing WITHOUT the frames flag degrades to the CBR estimate") {
    val bytes = vbrMp3(0, "Xing", 0L, 9999L, 300)
    val got = parseVbr(Seq((1L, bytes)))
    val audio = bytes.length - 20 // 10 header + 10 tag body
    assert(got(1L) == ((Some("cbr"), None,
      Some(audio.toLong * 8000L / 128000L))))
    // and a tagless stream is plain cbr
    val plain = parseVbr(Seq((2L, mp3(10, 0xfb, 9, 0, 0, 100))))
    assert(plain(2L)._1 == Some("cbr") && plain(2L)._2.isEmpty)
  }
}
