package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.{PRound, VectorFns}

/** Matrix-free power iteration for the dominant singular direction of
  * an embedding corpus — the whitening / PCA-compression primitive at
  * corpus scale, where the Gram matrix is never materialized: each
  * iteration is one pass computing s = Σ_rows (x·v)·x, i.e. A^T(Av),
  * then v' = s/‖s‖.
  *
  * Engine-reproducibility (the §4 no-float-SUM discipline):
  * per-row dots round to 6 dp, per-dimension contributions round to
  * 6 dp and sum as DECIMAL(28,6) — exact integer arithmetic, immune
  * to partition order — and the norm folds over the SORTED 64-entry
  * list. The iterate stays a 1-row broadcast frame end to end; the
  * only shuffle per iteration is the |dims|-key contribution agg.
  *
  * Scale shape: corpus is scanned once per iteration (map-side: dot +
  * posexplode), the reduce side is |dims| keys, and the iterate /
  * norm frames are O(dims) rows checkpointed eagerly so iteration k's
  * plan does not replay iterations 1..k-1.
  */
object Pca {

  /** (dim (1-based), loading (unit-vector entry, 6 dp), ev (‖s‖ of
    * the final step, 4 dp — the dominant-eigenvalue estimate of the
    * uncentered second-moment matrix)). */
  def powerIteration(corpus: DataFrame, vecCol: String, dims: Int,
                     iters: Int): DataFrame = {
    val (vFinal, nrmFinal) = iterate(corpus, vecCol, dims, iters)
    vFinal.select(posexplode(col("v")).as(Seq("pos", "vj")))
      .crossJoin(broadcast(nrmFinal))
      .select((col("pos") + 1).as("dim"),
        PRound.pround(col("vj"), 6).as("loading"),
        PRound.pround(col("nrm"), 4).as("ev"))
      .orderBy(col("dim"))
  }

  /** Projection of every vector onto the learned dominant direction:
    * (id, score) with score = round6(x·v) — the whitening / top-PC
    * feature a compression or dedup pipeline reads; v rides the same
    * 1-row broadcast, so the projection is one map-side pass. */
  def project(corpus: DataFrame, idCol: String, vecCol: String,
              dims: Int, iters: Int): DataFrame = {
    val (vFinal, _) = iterate(corpus, vecCol, dims, iters)
    corpus.crossJoin(broadcast(vFinal))
      .select(col(idCol),
        PRound.pround(VectorFns.dot(col(vecCol), col("v")), 6).as("score"))
  }

  /** The shared iteration chain: (1-row v frame, 1-row ‖s‖ frame). */
  private def iterate(corpus: DataFrame, vecCol: String, dims: Int,
                      iters: Int): (DataFrame, DataFrame) = {
    require(dims >= 1, s"dims must be positive, got $dims")
    require(iters >= 1, s"iters must be positive, got $iters")
    val spark = corpus.sparkSession
    // v0 = uniform unit vector (1/√dims every entry) — deterministic
    // and non-orthogonal to any dominant direction with a nonneg bias
    val v0 = spark.range(1).select(
      array((0 until dims).map(_ => lit(1.0 / math.sqrt(dims.toDouble))): _*)
        .as("v"))
    val x = corpus.select(col(vecCol).as("x"))

    def step(v: DataFrame): (DataFrame, DataFrame) = {
      val d = x.crossJoin(broadcast(v))
        .select(PRound.pround(VectorFns.dot(col("x"), col("v")), 6).as("d"),
          col("x"))
      val s = d.select(posexplode(col("x")).as(Seq("pos", "xj")), col("d"))
        .select((col("pos") + 1).as("dim"),
          PRound.pround(col("d") * col("xj").cast("double"), 6)
            .cast(DecimalType(28, 6)).as("c"))
        .groupBy(col("dim")).agg(sum(col("c")).as("s"))
      val sd = s.select(col("dim"), col("s").cast("double").as("s"))
      val nrm = Materialize.cut(sd
        .agg(sort_array(collect_list(col("s") * col("s"))).as("sq"))
        .select(sqrt(aggregate(col("sq"), lit(0.0), (a, b) => a + b)).as("nrm")))
      val vNext = Materialize.cut(sd.crossJoin(broadcast(nrm))
        .select(struct(col("dim"), (col("s") / col("nrm")).as("vj")).as("p"))
        .agg(sort_array(collect_list(col("p"))).as("ps"))
        .select(transform(col("ps"), p => p.getField("vj")).as("v")))
      (vNext, nrm)
    }

    (1 to iters)
      .foldLeft((v0, v0.select(lit(1.0).as("nrm")))) { case ((v, _), _) => step(v) }
  }
}
