package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed point-in-interval (range) join.
  *
  * The naive formulation — a theta join on `ts BETWEEN start AND end`
  * — plans as a broadcast/nested-loop cross product: every point
  * compares against every interval, quadratic at corpus scale. Here
  * the same inverted-index discipline as the similarity joins applies
  * to TIME: points key to their coarse time bucket, intervals explode
  * to every bucket they overlap, the join is an equi-shuffle on the
  * bucket, and the exact `BETWEEN` predicate verifies only candidates
  * that share a bucket. Candidate volume is bounded by bucket
  * occupancy × interval span (in buckets) — size `bucketSeconds` to
  * the typical interval length.
  *
  * A point lives in exactly one bucket, so each (point, interval)
  * candidate appears at most once — no post-join dedup.
  */
object RangeJoin {

  /** All (point, interval) pairs with `points.tsCol` inside
    * `[startCol, endCol]` (inclusive). Column names must not collide
    * across the two inputs (rename first). */
  def pointInInterval(points: DataFrame, tsCol: String,
                      intervals: DataFrame, startCol: String, endCol: String,
                      bucketSeconds: Long = 3600L): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    require(!points.columns.contains("__b") && !intervals.columns.contains("__b"),
      "inputs must not carry a __b column (internal bucket key) — rename it first")
    def bucketOf(c: org.apache.spark.sql.Column) =
      floor(c.cast("long") / bucketSeconds).cast("long")
    val p = points.withColumn("__b", bucketOf(col(tsCol)))
    val iv = intervals.withColumn("__b",
      explode(sequence(bucketOf(col(startCol)), bucketOf(col(endCol)))))
    p.join(iv, Seq("__b"))
      .filter(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("__b")
  }

  /** INTERVAL × INTERVAL overlap join: all (left, right) pairs whose
    * closed ranges `[lStart, lEnd]` and `[rStart, rEnd]` intersect —
    * the genomics/promo-calendar shape the point variant can't
    * express. Same bucket discipline, both sides exploded to the
    * coarse buckets they span; an overlapping pair shares EVERY bucket
    * their intersection spans, so instead of a post-join `distinct`
    * (a second shuffle over the full candidate set) each pair is kept
    * exactly once ALGEBRAICALLY: only in the bucket holding the
    * intersection's left edge, `max(lStart, rStart)` — a map-side
    * filter.
    *
    * Column values must be numeric (cast dates/timestamps to epoch
    * first); names must not collide across the inputs. Size
    * `bucketWidth` to the typical interval length: candidate volume
    * per bucket is occupancy², and span/width + 1 rows are emitted
    * per input interval. */
  def intervalOverlap(left: DataFrame, lStart: String, lEnd: String,
                      right: DataFrame, rStart: String, rEnd: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(!left.columns.contains("__b") && !right.columns.contains("__b"),
      "inputs must not carry a __b column (internal bucket key) — rename it first")
    def bucketOf(c: org.apache.spark.sql.Column) =
      floor(c.cast("long") / bucketWidth).cast("long")
    val l = left.withColumn("__b",
      explode(sequence(bucketOf(col(lStart)), bucketOf(col(lEnd)))))
    val r = right.withColumn("__b",
      explode(sequence(bucketOf(col(rStart)), bucketOf(col(rEnd)))))
    l.join(r, Seq("__b"))
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      .filter(col("__b") === bucketOf(greatest(col(lStart), col(rStart))))
      .drop("__b")
  }
}
