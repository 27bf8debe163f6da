package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{PRound, VectorFns}

/** Product quantization (PQ) — the embedding-COMPRESSION path of
  * vector search at 100 TB: each d-dim vector is split into `m`
  * subvectors, each encoded as the id of its nearest codeword in a
  * per-subspace codebook, so a corpus vector is stored as m small
  * codes instead of d floats (here: 4 bytes vs 256 — 64×).
  *
  * Query scoring is ADC (asymmetric distance computation): the query
  * stays full-precision; a per-query lookup table of
  * dot(query-subvector, codeword) is built against the tiny codebook
  * (m×k entries, broadcast), and a corpus vector's score is m table
  * lookups summed in FIXED subspace order — no per-pair float loops,
  * and the corpus shuffle carries codes, never embeddings. The score
  * is the exact cosine between the query and the RECONSTRUCTED
  * (quantized) vector: Σ_s dot(q_s, cw_s) / (|q|·√Σ_s|cw_s|²).
  *
  * Codebooks reuse [[Ann.kmeansAnchors]] per subspace (deterministic
  * seeded Lloyd, 6-dp-rounded means), so an external engine replays
  * training, encoding, and scoring bit-for-bit.
  */
object Pq {

  private def subvec(c: Column, s: Int, subDim: Int): Column =
    slice(c, s * subDim + 1, subDim)

  /** Per-subspace codebooks: (s, code, cw). `code` ids are the seed
    * vector ids (stable across engines). */
  def codebooks(vectors: DataFrame, m: Int, subDim: Int, k: Int,
                iters: Int): DataFrame =
    (0 until m).map { s =>
      Ann.kmeansAnchors(
          vectors.select(col("vec_id"),
            subvec(col("embedding"), s, subDim).as("embedding")),
          k, iters)
        .select(lit(s).as("s"), col("vec_id").as("code"),
          col("embedding").as("cw"))
    }.reduce(_.unionByName(_))

  /** PQ codes: (vec_id, s, code) — nearest codeword per subspace,
    * argmax as a map-combinable max(struct), not a window. */
  def encode(df: DataFrame, cb: DataFrame, m: Int, subDim: Int): DataFrame =
    df.select(col("vec_id"),
        posexplode(array((0 until m).map(s =>
          subvec(col("embedding"), s, subDim)): _*)).as(Seq("s", "sv")))
      .join(broadcast(cb), Seq("s"))
      .withColumn("c", PRound.pround(VectorFns.cosine(col("sv"), col("cw")), 6))
      .groupBy(col("vec_id"), col("s"))
      .agg(max(struct(col("c"), (-col("code")).as("nc"))).as("__m"))
      .select(col("vec_id"), col("s"), (-col("__m.nc")).as("code"))

  /** Residual of every vector against its assigned coarse cell:
    * (vec_id, cell, embedding = x − centroid). The subtraction is
    * exact double IEEE arithmetic over the 6-dp-rounded centroids, so
    * residuals are reproducible across engines with no extra rounding.
    */
  def residuals(df: DataFrame, anchors: DataFrame): DataFrame = {
    val a = anchors.select(col("vec_id").as("cell"), col("embedding").as("av"))
    Ann.assignCells(df, anchors)
      .join(broadcast(a), Seq("cell"))
      .select(col("vec_id"), col("cell"),
        zip_with(transform(col("embedding"), x => x.cast("double")),
          transform(col("av"), x => x.cast("double")),
          (x, c) => x - c).as("embedding"))
  }

  /** IVF-PQ ADC top-k — the production vector-search composition: the
    * coarse quantizer routes every corpus vector to a cell, PQ encodes
    * the RESIDUAL (x − centroid) with a codebook SHARED across cells
    * (the storage-sane choice at 100 TB — per-cell codebooks are
    * cells × m × k codewords of training state), and each query probes
    * its `nprobe` nearest cells. ADC decomposes exactly:
    *
    *   dot(q, x̂) = dot(q, c) + Σ_s dot(q_s, cw_s)
    *   |x̂|²      = |c|² + Σ_s (2·dot(c_s, cw_s) + |cw_s|²)
    *
    * so scoring is one per-(query, cell) dot plus m lookups in tables
    * keyed by (cell, s, code) / (query, s, code) — all broadcast-sized;
    * the corpus-side shuffle carries (cell, codes), never embeddings.
    * Both sums run in fixed subspace order starting from the cell term
    * (left-assoc fold), so ranking is bit-deterministic and the DuckDB
    * oracle replays training, routing, encoding and scoring exactly.
    *
    * `anchors` and `cb` feed multiple consumers — callers cache both
    * (they are cell- and codebook-sized, i.e. tiny). The residual chain
    * is re-derived once per consumer (encode / cell map / norm table):
    * bounded extra scans at bench scale; at cluster scale the residual
    * frame would be checkpointed once after routing.
    */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, anchors: DataFrame,
                cb: DataFrame, m: Int, subDim: Int, k: Int,
                nprobe: Int): DataFrame = {
    // CACHED: the cell-assignment + residual chain feeds the encoder
    // AND the cell-carry join (2 evaluations), and `codes` feeds the
    // norm table and the scoring join (2 more) — uncached, the corpus
    // assignment re-runs 4×, which benched at 12 s vs 3 s on sf0.1.
    // `codes` is the compressed index (m small ints per vector, the
    // 16× artifact IVF-PQ exists to produce); `res` is build-time
    // scaffolding. Same cache contract as the pipelines: the
    // Verify/Bench harness clearCache()s after each query; a library
    // caller owns the session.
    val res = residuals(corpus, anchors).cache()
    val codes = encode(res, cb, m, subDim)
      .join(res.select(col("vec_id"), col("cell")), Seq("vec_id"))
      .cache()
    val a = anchors.select(col("vec_id").as("cell"), col("embedding").as("av"))
    // per-(cell, s, code) norm correction: 2·dot(c_s, cw) + |cw|²
    val corr = a.crossJoin(broadcast(cb))
      .select(col("cell"), col("s"), col("code"),
        (lit(2.0) * VectorFns.dot(
            slice(col("av"), col("s") * subDim + lit(1), lit(subDim)), col("cw"))
          + VectorFns.dot(col("cw"), col("cw"))).as("t"))
    val cn = a.select(col("cell"), VectorFns.dot(col("av"), col("av")).as("cn2"))
    // reconstruction norm² per corpus vector, fixed order from |c|²
    val rn = codes.join(broadcast(corr), Seq("cell", "s", "code"))
      .groupBy(col("vec_id"), col("cell"))
      .agg(max(when(col("s") === 0, col("t"))).as("t0"),
        (1 until m).map(s => max(when(col("s") === s, col("t"))).as(s"t$s")): _*)
      .join(broadcast(cn), Seq("cell"))
      .select(col("vec_id"),
        (0 until m).map(s => col(s"t$s")).foldLeft(col("cn2"))(_ + _).as("rnorm2"))
    // query probes its nprobe nearest cells; dot(q, c) rides along
    val qpro = Ann.assignCellsMulti(queries, anchors, nprobe)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"), col("cell"))
      .join(broadcast(a), Seq("cell"))
      .select(col("query_id"), col("cell"),
        VectorFns.dot(col("qv"), col("av")).as("qcdot"))
    val qn = queries.select(col("vec_id").as("query_id"),
      VectorFns.norm(col("embedding")).as("qn"))
    val lut = queries.select(col("vec_id").as("query_id"),
        posexplode(array((0 until m).map(s =>
          subvec(col("embedding"), s, subDim)): _*)).as(Seq("s", "qsv")))
      .join(broadcast(cb), Seq("s"))
      .select(col("query_id"), col("s"), col("code"),
        VectorFns.dot(col("qsv"), col("cw")).as("d"))
    val scored = codes
      .join(broadcast(qpro), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .join(broadcast(lut), Seq("query_id", "s", "code"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(max(col("qcdot")).as("qcdot"),
        (0 until m).map(s => max(when(col("s") === s, col("d"))).as(s"d$s")): _*)
      .join(rn, Seq("vec_id"))
      .join(broadcast(qn), Seq("query_id"))
      .withColumn("approx_cosine", PRound.pround(
        (0 until m).map(s => col(s"d$s")).foldLeft(col("qcdot"))(_ + _) /
          (col("qn") * sqrt(col("rnorm2"))), 6))
      .select(col("query_id"), col("vec_id"), col("approx_cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("approx_cosine").desc, col("vec_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("vec_id"), col("approx_cosine"))
  }

  /** ADC top-k: (query_id, rk, vec_id, approx_cosine). `cb` should be
    * cached by the caller when it feeds multiple consumers (it is
    * derived by an iterative training chain). Scores sum the per-
    * subspace lookup values in fixed subspace order, so ranking is
    * bit-deterministic. */
  def adcTopK(corpus: DataFrame, queries: DataFrame, cb: DataFrame,
              m: Int, subDim: Int, k: Int): DataFrame = {
    val codes = encode(corpus, cb, m, subDim)
    val cwNorm2 = cb.select(col("s"), col("code"),
      VectorFns.dot(col("cw"), col("cw")).as("n2"))
    // reconstruction norm² per corpus vector, added in subspace order
    val rn = codes.join(broadcast(cwNorm2), Seq("s", "code"))
      .groupBy(col("vec_id"))
      .agg(max(when(col("s") === 0, col("n2"))).as("rn0"),
        (1 until m).map(s =>
          max(when(col("s") === s, col("n2"))).as(s"rn$s")): _*)
      .select(col("vec_id"),
        (0 until m).map(s => col(s"rn$s")).reduce(_ + _).as("rnorm2"))
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      .withColumn("qn", VectorFns.norm(col("qv")))
    // per-query lookup table: dot(query subvector, codeword)
    val lut = q.select(col("query_id"), col("qn"),
        posexplode(array((0 until m).map(s =>
          subvec(col("qv"), s, subDim)): _*)).as(Seq("s", "qsv")))
      .join(broadcast(cb), Seq("s"))
      .select(col("query_id"), col("qn"), col("s"), col("code"),
        VectorFns.dot(col("qsv"), col("cw")).as("d"))
    val scored = codes.join(broadcast(lut), Seq("s", "code"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(max(col("qn")).as("qn"),
        (0 until m).map(s =>
          max(when(col("s") === s, col("d"))).as(s"d$s")): _*)
      .join(rn, Seq("vec_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("approx_cosine", PRound.pround(
        (0 until m).map(s => col(s"d$s")).reduce(_ + _) /
          (col("qn") * sqrt(col("rnorm2"))), 6))
      .select(col("query_id"), col("vec_id"), col("approx_cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("approx_cosine").desc, col("vec_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("vec_id"), col("approx_cosine"))
  }
}
