package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.PRound

import graft.functions.VectorFns

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * - `bruteForceTopK`: exact baseline — broadcast the (small) query
  *   set against the corpus; one pass, no corpus shuffle. Cosine is
  *   rounded before ranking so ordering is reproducible across
  *   engines.
  * - `ivfTopK`: the scale path — corpus and queries are assigned to
  *   the nearest of a deterministic anchor set (IVF coarse quantizer;
  *   here the anchors are the first k corpus vectors, a production
  *   system would plug in k-means centroids). Search only touches the
  *   query's cell, so per-query cost drops by ~|cells|; recall < 1 by
  *   construction, like any IVF with nprobe=1.
  */
object Ann {

  private def ranked(pairs: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    pairs.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
  }

  /** Exact top-k: (query_id, rk, vec_id, cosine). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val c = corpus.select(col("vec_id"), col("embedding").as("cv"))
    val pairs = c.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cosine", PRound.pround(VectorFns.cosine(col("qv"), col("cv")), 6))
      .select(col("query_id"), col("vec_id"), col("cosine"))
    ranked(pairs, k).select(col("query_id"), col("rk"), col("vec_id"), col("cosine"))
  }

  /** Nearest-anchor cell id for every vector in `df`.
    *
    * Argmax over anchors is a map-side-combinable `max(struct(score,
    * -anchor_id))` aggregate — not a window, which would sort the
    * whole corpus×anchors product at 100 TB. Tie-break: highest score,
    * then smallest anchor id (the struct's second field is negated).
    */
  def assignCells(df: DataFrame, anchors: DataFrame): DataFrame = {
    val a = anchors.select(col("vec_id").as("anchor_id"), col("embedding").as("av"))
    df.crossJoin(broadcast(a))
      .withColumn("acos", PRound.pround(VectorFns.cosine(col("embedding"), col("av")), 6))
      .groupBy(df.columns.toIndexedSeq.map(col): _*)
      .agg(max(struct(col("acos"), (-col("anchor_id")).as("na"))).as("__m"))
      .select(df.columns.toIndexedSeq.map(col) :+ (-col("__m.na")).as("cell"): _*)
  }

  /** Hyperplane-sign LSH bucket id: bit i is set when dot(v, plane_i)
    * > 0. With deterministic planes (e.g. held-out corpus vectors),
    * the bucket assignment is reproducible across engines. */
  def lshBucket(df: DataFrame, planes: DataFrame): DataFrame = {
    val p = planes.select(col("vec_id").as("plane_id"), col("embedding").as("pv"))
    df.crossJoin(broadcast(p))
      .withColumn("bit",
        when(VectorFns.dot(col("embedding"), col("pv")) > 0,
          expr("shiftleft(1, CAST(plane_id AS INT))")).otherwise(0))
      .groupBy(df.columns.toIndexedSeq.map(col): _*)
      .agg(sum(col("bit")).cast("int").as("bucket"))
  }

  /** LSH-bucketed ANN: candidates share the query's sign-bucket; exact
    * cosine top-k inside the bucket. Recall < 1 (single probe), like
    * any LSH with one table; scale path is bucket-keyed. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, planes: DataFrame, k: Int): DataFrame = {
    val c = lshBucket(corpus, planes)
      .select(col("bucket"), col("vec_id"), col("embedding").as("cv"))
    val q = lshBucket(queries, planes)
      .select(col("bucket"), col("vec_id").as("query_id"), col("embedding").as("qv"))
    val pairs = c.join(broadcast(q), Seq("bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cosine", PRound.pround(VectorFns.cosine(col("qv"), col("cv")), 6))
      .select(col("query_id"), col("vec_id"), col("cosine"))
    ranked(pairs, k).select(col("query_id"), col("rk"), col("vec_id"), col("cosine"))
  }

  /** IVF top-k with nprobe=1: (query_id, rk, vec_id, cosine). */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, anchors: DataFrame, k: Int): DataFrame = {
    val c = assignCells(corpus, anchors)
      .select(col("cell"), col("vec_id"), col("embedding").as("cv"))
    val q = assignCells(queries, anchors)
      .select(col("cell"), col("vec_id").as("query_id"), col("embedding").as("qv"))
    val pairs = c.join(broadcast(q), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cosine", PRound.pround(VectorFns.cosine(col("qv"), col("cv")), 6))
      .select(col("query_id"), col("vec_id"), col("cosine"))
    ranked(pairs, k).select(col("query_id"), col("rk"), col("vec_id"), col("cosine"))
  }
}
