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

  /** Per-row salt in [0, buckets). Mixes a per-row component
    * (monotonically_increasing_id encodes partition id + position) into
    * the hash: hashing only the column values would give every copy of
    * an identical row the same salt, defeating the salting exactly when
    * a hot key's skew comes from repeated identical rows — the common
    * real-world skew shape. Aggregation/join RESULTS are salt-invariant,
    * so the nondeterministic row ids never reach the output. */
  private def rowSalt(df: DataFrame, buckets: Int): Column =
    pmod(hash(df.columns.toIndexedSeq.map(col) :+ monotonically_increasing_id(): _*),
      lit(buckets))

  /** Two-phase sum/count aggregation, semantically identical to
    * `df.groupBy(keys).agg(sum(valueCol), count(*))`. */
  def aggSkewed(df: DataFrame, keyCols: Seq[String], valueCol: String,
                buckets: Int = 32): DataFrame = {
    val partial = df
      .withColumn("__salt", rowSalt(df, buckets))
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
                 buckets: Int = 8): DataFrame = {
    val saltedBig = big.withColumn("__salt", rowSalt(big, buckets))
    val replSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedBig.join(replSmall, keyCols :+ "__salt").drop("__salt")
  }
}
