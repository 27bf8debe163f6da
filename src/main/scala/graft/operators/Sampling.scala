package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deterministic hash-based sampling — the curation shapes a training
  * pipeline needs (downsample, train/test split, per-stratum quota)
  * made reproducible: membership depends only on the row's key, never
  * on partitioning, task order, or an RNG seed's iteration order. The
  * same document lands in the same split on every run and every
  * engine (md5 is the portable hash, as everywhere in this repo).
  *
  * Scale shape: Bernoulli sampling and split labeling are pure
  * map-side predicates (no shuffle, pushable past joins that preserve
  * the key); stratified exact-k shuffles once on the strata key.
  * `df.sample()` is NOT used anywhere: its membership changes with
  * partitioning, which silently breaks resume/incremental reruns.
  */
object Sampling {

  /** Uniform [0, 10000) slot for `key` — first 32-bit md5 slice mod
    * 10^4, i.e. permyriad (basis-point) granularity. 32 bits mod 10^4
    * keeps residue bias below 0.0003% relative (a 16-bit slice would
    * over-select slots 0..5535 by 7/6, i.e. ~7% relative bias). */
  private def slot(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long") % 10000

  /** Keep ~`permyriad`/10000 of rows, deterministically by key. */
  def bernoulli(df: DataFrame, keyCol: String, permyriad: Int): DataFrame = {
    require(permyriad >= 0 && permyriad <= 10000, s"permyriad in [0,10000], got $permyriad")
    df.filter(slot(col(keyCol)) < permyriad)
  }

  /** Label each row "test" (~`testPermyriad`/10000) or "train", by key.
    * Rows with equal keys always land in the same split — the property
    * that prevents train/test leakage of near-identical records sharing
    * a dedup key. */
  def splitLabel(df: DataFrame, keyCol: String, testPermyriad: Int,
                 labelCol: String = "split"): DataFrame = {
    require(testPermyriad >= 0 && testPermyriad <= 10000,
      s"testPermyriad in [0,10000], got $testPermyriad")
    df.withColumn(labelCol,
      when(slot(col(keyCol)) < testPermyriad, lit("test")).otherwise(lit("train")))
  }

  /** Membership against a RUNTIME permyriad column (vs
    * [[weightedPred]]'s static map) — the mixture-resampling shape
    * where rates are derived from an aggregation over the data
    * itself, joined back onto the rows. */
  def dynamicPred(keyCol: Column, permyriadCol: Column): Column =
    slot(keyCol) < permyriadCol

  /** Deterministic uniform in (0, 1]: (slot+1)/10000 — the seed for
    * priority/weighted sampling keys (Efraimidis–Spirakis). */
  def uniform(keyCol: Column): Column =
    (slot(keyCol) + lit(1)) / lit(10000.0)

  /** Deterministic shard id in [0, n): the md5 slot reduced mod n —
    * the final pre-training shuffle+shard assignment. Same-key rows
    * always land in the same shard (resume- and rerun-stable), and at
    * scale the write partitioning IS this column (partitionBy), never
    * a repartition(rand()). n dividing 10000 (the slot modulus) keeps
    * the reduction exactly uniform over slots; a NON-divisor (e.g.
    * n=3) gives the first `10000 % n` shards one extra slot each —
    * up to ~0.03% relative size bias, harmless for shard sizing but
    * worth knowing when counting on exact uniformity. */
  def shardOf(keyCol: Column, n: Int): Column = {
    require(n >= 1 && n <= 10000, s"n in [1,10000], got $n")
    slot(keyCol) % n
  }

  /** Membership predicate behind [[weighted]], exposed as a Column so
    * a pipeline can carry it as a KEEP FLAG on an annotated frame
    * (one scan for all stage flags) instead of filtering eagerly. */
  def weightedPred(keyCol: String, strataCol: String,
                   rates: Map[String, Int], defaultPermyriad: Int = 10000): Column = {
    (defaultPermyriad :: rates.values.toList).foreach(r =>
      require(r >= 0 && r <= 10000, s"permyriad in [0,10000], got $r"))
    val rate = rates.toSeq.sortBy(_._1).foldLeft(lit(defaultPermyriad)) {
      case (acc, (s, r)) => when(col(strataCol) === s, lit(r)).otherwise(acc)
    }
    slot(col(keyCol)) < rate
  }

  /** Per-stratum Bernoulli rates — the training-MIXTURE shape: each
    * stratum (language, source, domain) keeps its own deterministic
    * fraction, which is how corpus resampling weights (temperature
    * sampling, up/down-weighting a source) are applied at scale. Pure
    * map-side predicate like [[bernoulli]]; strata absent from `rates`
    * keep `defaultPermyriad`. */
  def weighted(df: DataFrame, keyCol: String, strataCol: String,
               rates: Map[String, Int], defaultPermyriad: Int = 10000): DataFrame =
    df.filter(weightedPred(keyCol, strataCol, rates, defaultPermyriad))

  /** Exactly min(k, |stratum|) rows per stratum, chosen by ascending
    * (md5(key), key) rank — a deterministic per-group quota sample.
    * One shuffle on the strata columns; the window sorts within each
    * stratum only. */
  def stratifiedK(df: DataFrame, strataCols: Seq[String], keyCol: String,
                  k: Int): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    val w = Window.partitionBy(strataCols.map(col): _*)
      .orderBy(md5(col(keyCol).cast("string")), col(keyCol))
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .drop("__rk")
  }
}
