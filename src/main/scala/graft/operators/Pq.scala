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
    * vector ids (stable across engines).
    *
    * All m subspaces train in ONE Lloyd chain over the posexploded
    * (vec_id, s, subvector) frame — per-subspace results are
    * IDENTICAL to m independent [[Ann.kmeansAnchors]] runs (same
    * lowest-k seeds per s, same 6-dp argmax assignment and rounded
    * means), but the plan is one seed window + (iters ×) one
    * assignment and one mean aggregation TOTAL instead of per
    * subspace — m× fewer stages, which dominates wall-clock when the
    * training data is small relative to fixed per-stage cost. */
  def codebooks(vectors: DataFrame, m: Int, subDim: Int, k: Int,
                iters: Int): DataFrame = {
    val sub = vectors.select(col("vec_id"),
      posexplode(array((0 until m).map(s =>
        subvec(col("embedding"), s, subDim)): _*)).as(Seq("s", "sv")))
    var cb = sub
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col("s")).orderBy(col("vec_id"))))
      .filter(col("__rk") <= k)
      .select(col("s"), col("vec_id").as("code"), col("sv").as("cw"))
    for (_ <- 1 to iters) {
      cb = sub.join(broadcast(cb), Seq("s"))
        .withColumn("c", PRound.pround(VectorFns.cosine(col("sv"), col("cw")), 6))
        .groupBy(col("s"), col("vec_id"), col("sv"))
        .agg(max(struct(col("c"), (-col("code")).as("nc"))).as("__m"))
        .select(col("s"), col("vec_id"), col("sv"), (-col("__m.nc")).as("cell"))
        .select(col("s"), col("cell"), posexplode(col("sv")).as(Seq("dim", "x")))
        .groupBy(col("s"), col("cell"), col("dim"))
        .agg(PRound.pround(avg(col("x").cast("double")), 6).as("mn"))
        .groupBy(col("s"), col("cell"))
        .agg(sort_array(collect_list(struct(col("dim"), col("mn")))).as("dm"))
        .select(col("s"), col("cell").as("code"),
          transform(col("dm"), t => t.getField("mn")).as("cw"))
    }
    cb
  }

  /** OPQ-style dimension permutation (the cheap, fully deterministic
    * rotation surrogate): PQ quantization error concentrates when one
    * subspace hoards the high-variance dimensions, so rank dimensions
    * by corpus variance and deal them to the m subspaces in a SNAKE
    * (boustrophedon) order — subspace variance totals balance to one
    * deal-round. Returns a 1-row frame (p = the permuted dimension
    * order, 0-based); compose with [[permute]] before [[codebooks]] /
    * [[adcTopK]] and ADC scores are unchanged in meaning (a
    * permutation is orthogonal: norms and dots are preserved), only
    * the subspace split improves.
    *
    * Determinism: variances are compared as EXACT integers
    * (n·Σx²−(Σx)² over 6-dp-scaled micro-units; the square and both
    * sums run in DECIMAL — xi is cast to decimal(19,0) BEFORE the
    * multiply so a micro-unit |xi| beyond ~3.0e9 (|x| ≳ 3037) cannot
    * silently wrap a Long square — and the final n·Σx²−(Σx)²
    * difference lands in decimal(38,0)), so the ranking — the only
    * thing downstream consumes — is bit-identical in any engine and
    * any partitioning. */
  def varianceSnakePerm(corpus: DataFrame, m: Int): DataFrame = {
    val xi = PRound.pround(col("x").cast("double") * 1e6, 0).cast("long")
    val xiDec = col("xi").cast("decimal(19,0)")
    val dv = corpus
      .select(posexplode(col("embedding")).as(Seq("dim", "x")))
      .select(col("dim"), xi.as("xi"))
      .groupBy(col("dim"))
      .agg(count(lit(1)).as("n"),
        sum(xiDec).as("sx"),
        sum(xiDec * xiDec).as("sxx"))
      .select(col("dim"),
        (col("n").cast("decimal(19,0)") * col("sxx") -
          col("sx") * col("sx")).as("v"))
    // 64-row frame: the global window is dimension-bounded by design
    val ranked = dv.withColumn("rk", row_number().over(
      Window.orderBy(col("v").desc, col("dim"))))
    val r0 = (col("rk") - 1) % (2 * m)
    ranked
      .withColumn("s", when(r0 < m, r0).otherwise(lit(2 * m - 1) - r0))
      .agg(transform(
        sort_array(collect_list(struct(col("s"), col("rk"), col("dim")))),
        t => t.getField("dim")).as("p"))
  }

  /** Reorder every embedding by a [[varianceSnakePerm]] permutation
    * (broadcast 1-row frame). */
  def permute(df: DataFrame, perm: DataFrame): DataFrame =
    df.crossJoin(broadcast(perm))
      .select(col("vec_id"),
        transform(col("p"), d =>
          element_at(col("embedding"), d + lit(1))).as("embedding"))

  /** PQ codes: (vec_id, [carry...,] s, code) — nearest codeword per
    * subspace, argmax as a map-combinable max(struct), not a window.
    * `carry` columns ride through the encode (e.g. the IVF cell), so
    * callers need no join-back that would re-derive the input chain. */
  def encode(df: DataFrame, cb: DataFrame, m: Int, subDim: Int,
             carry: Seq[String] = Nil): DataFrame = {
    // ROW-LOCAL per-subspace argmax over a broadcast 1-row codebook
    // (r16; the Ann.assignCells rationale): the previous shape
    // posexploded m subvectors per vector, broadcast-joined the
    // codebook and re-aggregated with a corpus-wide groupBy — an
    // Exchange carrying every subvector. array_max over the same
    // (rounded cosine, -code) structs is the identical total order;
    // the only Generate left is the (s, code) posexplode of the m
    // small code values.
    val cbrow = cb
      .groupBy(col("s"))
      .agg(collect_list(struct(col("code"), col("cw"))).as("__cws"))
      .groupBy()
      .agg(map_from_entries(collect_list(
        struct(col("s"), col("__cws")))).as("__sm"))
      .select(transform(sequence(lit(0), lit(m - 1)), sIdx =>
        element_at(col("__sm"), sIdx)).as("__cbs"))
    val codes = transform(sequence(lit(0), lit(m - 1)), sIdx =>
      -array_max(transform(element_at(col("__cbs"), sIdx + 1), e =>
        struct(
          PRound.pround(VectorFns.cosine(
            slice(col("embedding"), sIdx * subDim + lit(1), lit(subDim)),
            e.getField("cw")), 6).as("c"),
          (-e.getField("code")).as("nc")))).getField("nc"))
    df.crossJoin(broadcast(cbrow))
      .select(col("vec_id") +: carry.map(col) :+
        posexplode(codes).as(Seq("s", "code")): _*)
  }

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
    * bounded extra scans at bench scale; `checkpointResiduals` cuts the
    * routed residual frame's lineage with an eager [[Materialize]] cut so
    * it evaluates ONCE — the cluster-scale deployment switch (at bench
    * scale the checkpoint write costs more than the re-derivation it
    * saves; measured delta recorded in BASELINE.md).
    */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, anchors: DataFrame,
                cb: DataFrame, m: Int, subDim: Int, k: Int,
                nprobe: Int, checkpointResiduals: Boolean = false): DataFrame = {
    // the cell rides THROUGH the encode (no join-back): the residual
    // chain is evaluated once per codes consumer instead of twice
    val res0 = residuals(corpus, anchors)
    val res = if (checkpointResiduals) Materialize.cut(res0) else res0
    val codes = encode(res, cb, m, subDim, carry = Seq("cell"))
    val a = anchors.select(col("vec_id").as("cell"), col("embedding").as("av"))
    // per-(cell, s, code) norm correction: 2·dot(c_s, cw) + |cw|²
    val corr = a.crossJoin(broadcast(cb))
      .select(col("cell"), col("s"), col("code"),
        (lit(2.0) * VectorFns.dot(
            slice(col("av"), col("s") * subDim + lit(1), lit(subDim)), col("cw"))
          + VectorFns.dot(col("cw"), col("cw"))).as("t"))
    val cn = a.select(col("cell"), VectorFns.dot(col("av"), col("av")).as("cn2"))
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
    // ONE aggregation over the code index carries BOTH the query
    // lookups (d_s) and the reconstruction-norm terms (t_s) — a
    // separate norm table would make the codes/residual chain a
    // second consumer and re-derive the whole corpus assignment
    val aggs = Seq(max(col("qcdot")).as("qcdot")) ++
      (0 until m).map(s => max(when(col("s") === s, col("d"))).as(s"d$s")) ++
      (0 until m).map(s => max(when(col("s") === s, col("t"))).as(s"t$s"))
    val scored = codes
      .join(broadcast(qpro), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .join(broadcast(lut), Seq("query_id", "s", "code"))
      .join(broadcast(corr), Seq("cell", "s", "code"))
      .groupBy(col("query_id"), col("vec_id"), col("cell"))
      .agg(aggs.head, aggs.tail: _*)
      .join(broadcast(cn), Seq("cell"))
      .join(broadcast(qn), Seq("query_id"))
      .withColumn("rnorm2",
        (0 until m).map(s => col(s"t$s")).foldLeft(col("cn2"))(_ + _))
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
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      .withColumn("qn", VectorFns.norm(col("qv")))
    // per-query lookup table: dot(query subvector, codeword)
    val lut = q.select(col("query_id"), col("qn"),
        posexplode(array((0 until m).map(s =>
          subvec(col("qv"), s, subDim)): _*)).as(Seq("s", "qsv")))
      .join(broadcast(cb), Seq("s"))
      .select(col("query_id"), col("qn"), col("s"), col("code"),
        VectorFns.dot(col("qsv"), col("cw")).as("d"))
    // ONE aggregation carries BOTH the query lookups (d_s) and the
    // reconstruction-norm terms (n2_s) — r17, the ivfPqTopK discipline:
    // the previous separate per-vec_id norm aggregation made `codes`
    // (and the whole corpus/encode chain behind it) a SECOND consumer
    // and re-attached via a vec_id-keyed shuffle join; for ann_opq the
    // re-derivation repeated the permute chain too (the r16 OPQ
    // regression). The per-(query, vec) max over each subspace's n2 is
    // the same value the per-vec aggregation produced (codes don't
    // depend on the query), and the rnorm2 sum keeps subspace order.
    val scored = codes.join(broadcast(lut), Seq("s", "code"))
      .join(broadcast(cwNorm2), Seq("s", "code"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(max(col("qn")).as("qn"),
        (0 until m).map(s =>
          max(when(col("s") === s, col("d"))).as(s"d$s")) ++
        (0 until m).map(s =>
          max(when(col("s") === s, col("n2"))).as(s"rn$s")): _*)
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("rnorm2", (0 until m).map(s => col(s"rn$s")).reduce(_ + _))
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
