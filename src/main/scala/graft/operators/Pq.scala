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
