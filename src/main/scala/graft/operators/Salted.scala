package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting.
  *
  * The reference shards its workload round-robin across workers
  * (scraper_v2.py:1769-1801); at Spark scale the equivalent failure
  * mode is a hot key monopolizing one reducer. Two standard remedies:
  *
  * - `aggSkewed`: two-phase aggregation — partial aggregate on
  *   (key, salt), final aggregate on key. The hot key's load spreads
  *   over `buckets` reducers in phase 1; phase 2 only merges `buckets`
  *   partial rows per key. Results are identical to a direct groupBy
  *   (the provided aggregates must be decomposable: sum/count/min/max).
  * - `joinSkewed`: salt the big (skewed) side randomly-but-
  *   deterministically, replicate the small side across all salt
  *   values, join on (key, salt). Each hot-key bucket lands on a
  *   different reducer.
  *
  * AQE's skew-join splitting handles sort-merge joins adaptively;
  * these operators are for aggregations and for engines/plans where
  * AQE can't kick in (e.g. bucketed inputs, streaming).
  */
object Salted {

  /** Per-row salt in [0, buckets).
    *
    * With `mixRowId` (the default), monotonically_increasing_id mixes
    * into the hash so identical duplicate rows of a hot key spread
    * across buckets — hashing only the values defeats the salting
    * exactly on repeated-row skew, the common real-world shape.
    *
    * RETRY CONTRACT: row ids are only reproducible when the child is
    * retry-deterministic (a direct file scan). Saling DOWNSTREAM of a
    * shuffle with mixRowId, a fetch-failure retry can reassign ids →
    * salts and double-count/drop rows (the SPARK-23207 class). There,
    * pass `mixRowId = false` (value-hash salt, retry-safe) or persist
    * the input first. */
  private def rowSalt(df: DataFrame, buckets: Int, mixRowId: Boolean): Column = {
    val cols = df.columns.toIndexedSeq.map(col)
    val hashed = if (mixRowId) cols :+ monotonically_increasing_id() else cols
    pmod(hash(hashed: _*), lit(buckets))
  }

  /** Two-phase sum/count aggregation, semantically identical to
    * `df.groupBy(keys).agg(sum(valueCol), count(*))`. */
  def aggSkewed(df: DataFrame, keyCols: Seq[String], valueCol: String,
                buckets: Int = 32, mixRowId: Boolean = true): DataFrame = {
    val partial = df
      .withColumn("__salt", rowSalt(df, buckets, mixRowId))
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
    partial.groupBy(keyCols.map(col): _*)
      .agg(sum(col("__psum")).as(s"sum_$valueCol"),
        sum(col("__pcnt")).as("n_rows"))
  }

  /** Skew-safe inner equi-join: `big` is salted, `small` is replicated
    * across the salt domain (small side must be broadcast-scale ×
    * buckets). */
  def joinSkewed(big: DataFrame, small: DataFrame, keyCols: Seq[String],
                 buckets: Int = 8, mixRowId: Boolean = true): DataFrame = {
    val saltedBig = big.withColumn("__salt", rowSalt(big, buckets, mixRowId))
    val replSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedBig.join(replSmall, keyCols :+ "__salt").drop("__salt")
  }

  /** Skew-DIAGNOSED salted join: [[joinSkewed]] with the salt factor
    * DERIVED from the measured skew instead of hand-picked — the
    * missing wire between the skew_report diagnosis and the salting
    * remedy. One aggregation over `big` measures per-key cardinality;
    * buckets = clamp(ceil(max/avg), 1, maxBuckets) rides as a 1-ROW
    * BROADCAST into both the salt hash (big side) and the replication
    * sequence (small side) — never a driver-side collect, so the whole
    * thing stays one declarative plan and AQE still sees it. A uniform
    * input diagnoses ratio≈1 → ONE bucket: the plan degenerates to the
    * plain join with no replication, which is why auto beats a static
    * factor — static salt pays `buckets`× small-side replication even
    * when the data isn't skewed (ScaleSmoke A/Bs all three).
    *
    * The diagnosis frame is [[Materialize.cut]] so the two consumers
    * (both join sides) don't re-aggregate `big` twice; its durability
    * follows spark.graft.materialize like every other cut point. */
  def joinSkewedAuto(big: DataFrame, small: DataFrame, keyCols: Seq[String],
                     maxBuckets: Int = 64, mixRowId: Boolean = true): DataFrame = {
    require(maxBuckets >= 1, s"maxBuckets must be >= 1, got $maxBuckets")
    val report = Materialize.cut(
      big.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("cnt"))
        .agg((max(col("cnt")) * count(lit(1)) / sum(col("cnt")))
          .as("skew_ratio"))
        .select(least(greatest(ceil(col("skew_ratio")), lit(1L)),
          lit(maxBuckets.toLong)).cast("int").as("__buckets")))
    val cols = big.columns.toIndexedSeq.map(col)
    val hashed = if (mixRowId) cols :+ monotonically_increasing_id() else cols
    val saltedBig = big.crossJoin(broadcast(report))
      .withColumn("__salt", pmod(hash(hashed: _*), col("__buckets")))
      .drop("__buckets")
    val replSmall = small.crossJoin(broadcast(report))
      .withColumn("__salt", explode(sequence(lit(0), col("__buckets") - 1)))
      .drop("__buckets")
    saltedBig.join(replSmall, keyCols :+ "__salt").drop("__salt")
  }
}
