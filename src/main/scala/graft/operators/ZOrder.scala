package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving + file-level min/max statistics —
  * the data-LAYOUT half of scan pruning. Predicate pushdown only
  * helps if the files are clustered so that min/max footer stats are
  * selective; sorting 100 TB by one column leaves every other
  * predicate unprunable. Interleaving the bits of two dimensions
  * bounds BOTH dimensions within every z-range, so a range predicate
  * on either column skips most files.
  *
  * Everything here is integer bit arithmetic — exactly reproducible
  * by any engine (the oracle replays it in SQL).
  */
object ZOrder {

  /** Morton-interleave the low `bits` bits of non-negative longs `a`
    * (even positions) and `b` (odd positions) into a 2·bits-bit
    * z-value: zv = Σᵢ ((a>>i)&1)<<2i | ((b>>i)&1)<<(2i+1), computed
    * as (a & 2^i) << i | (b & 2^i) << (i+1) — shift-of-masked-bit, no
    * per-bit extraction. Codegen-friendly: a flat sum of bitwise ops. */
  def zvalue2(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    (0 until bits).map { i =>
      shiftleft(a.bitwiseAND(lit(1L << i)), i)
        .bitwiseOR(shiftleft(b.bitwiseAND(lit(1L << i)), i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** WRITE the z-order layout: cluster `df` into `nFiles` parquet
    * files by contiguous z-value range — `repartitionByRange` on the
    * interleaved (`aCol` mod 2^bits, `bCol` mod 2^bits) z-value, plus
    * `sortWithinPartitions` so row groups INSIDE each file stay
    * clustered too (a file large enough for several row groups prunes
    * at row-group granularity, not just file granularity). The helper
    * column is dropped before writing — the layout is invisible to
    * readers except through footer min/max stats, which is the point:
    * a range predicate on EITHER dimension now skips most row groups
    * (see ZOrderLayoutSpec for the measured proof).
    *
    * Scale shape: one range exchange (sampled bounds) + local sort —
    * exactly what a 100 TB OPTIMIZE/compaction job does per partition.
    */
  def layoutParquet(df: DataFrame, aCol: String, bCol: String,
                    bits: Int, nFiles: Int, path: String): Unit = {
    require(!df.columns.contains("__graft_zv"),
      "input must not contain the reserved column __graft_zv")
    val zv = zvalue2(pmod(col(aCol).cast("long"), lit(1L << bits)),
      pmod(col(bCol).cast("long"), lit(1L << bits)), bits)
    df.withColumn("__graft_zv", zv)
      .repartitionByRange(nFiles, col("__graft_zv"))
      .sortWithinPartitions(col("__graft_zv"))
      .drop("__graft_zv")
      .write.mode("overwrite").parquet(path)
  }

  /** Hilbert-curve index of (`a` mod 2^bits, `b` mod 2^bits) — the
    * clustering key with strictly better locality than [[zvalue2]]:
    * consecutive indexes are always ADJACENT cells, so every
    * contiguous file range is one connected region of the key space
    * (a z-range can span two far-apart rectangles at power-of-two
    * seams). Native codegen'd expression (the per-level rotation
    * carries mutable state — see functions.expr.HilbertIndex). */
  def hilbertIndex2(a: Column, b: Column, bits: Int): Column = {
    import org.apache.spark.sql.GraftBridge.{column, expression}
    column(graft.functions.expr.HilbertIndex(
      expression(a.cast("long")), expression(b.cast("long")), bits))
  }

  /** WRITE the Hilbert layout — [[layoutParquet]] with the Hilbert
    * index as the clustering key; same single range-exchange shape. */
  def layoutParquetHilbert(df: DataFrame, aCol: String, bCol: String,
                           bits: Int, nFiles: Int, path: String): Unit = {
    require(!df.columns.contains("__graft_zv"),
      "input must not contain the reserved column __graft_zv")
    val hv = hilbertIndex2(pmod(col(aCol).cast("long"), lit(1L << bits)),
      pmod(col(bCol).cast("long"), lit(1L << bits)), bits)
    df.withColumn("__graft_zv", hv)
      .repartitionByRange(nFiles, col("__graft_zv"))
      .sortWithinPartitions(col("__graft_zv"))
      .drop("__graft_zv")
      .write.mode("overwrite").parquet(path)
  }

  /** Per-file stats of the HILBERT clustering — [[fileStats]] with the
    * Hilbert index as the bucket key. Same one-aggregation shape. */
  def hilbertStats(df: DataFrame, aCol: String, bCol: String,
                   bits: Int, nBuckets: Int): DataFrame = {
    require(nBuckets >= 1 && (1L << (2 * bits)) % nBuckets == 0,
      s"nBuckets must divide 2^${2 * bits}, got $nBuckets")
    val width = (1L << (2 * bits)) / nBuckets
    val log2Width = java.lang.Long.numberOfTrailingZeros(width)
    val a = pmod(col(aCol).cast("long"), lit(1L << bits))
    val b = pmod(col(bCol).cast("long"), lit(1L << bits))
    df.select(a.as("__a"), b.as("__b"))
      .select(shiftright(hilbertIndex2(col("__a"), col("__b"), bits), log2Width)
        .as("bucket"), col("__a"), col("__b"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("__a")).as("min_a"), max(col("__a")).as("max_a"),
        min(col("__b")).as("min_b"), max(col("__b")).as("max_b"))
  }

  /** Cluster `df` into `nBuckets` z-ordered "files" over dimensions
    * (`aCol` mod 2^bits, `bCol` mod 2^bits) and return the per-file
    * stats table a scan planner would prune with: bucket id, row
    * count, and min/max of BOTH dimensions. Buckets are equal z-range
    * slices (bucket = zv / (2^(2·bits)/nBuckets)) — the static analog
    * of writing files sorted by zvalue. One aggregation, map-side
    * combinable. */
  def fileStats(df: DataFrame, aCol: String, bCol: String,
                bits: Int, nBuckets: Int): DataFrame = {
    require(nBuckets >= 1 && (1L << (2 * bits)) % nBuckets == 0,
      s"nBuckets must divide 2^${2 * bits}, got $nBuckets")
    // nBuckets divides 2^(2·bits), so it is itself a power of two and
    // the bucket width is one: bucket = zv >> log2(width). Pure integer
    // arithmetic — Column `/` is double division, exact only while
    // 2·bits ≤ 53, and would silently mis-bucket at bits ≥ 27.
    val width = (1L << (2 * bits)) / nBuckets
    val log2Width = java.lang.Long.numberOfTrailingZeros(width)
    val a = pmod(col(aCol).cast("long"), lit(1L << bits))
    val b = pmod(col(bCol).cast("long"), lit(1L << bits))
    df.select(a.as("__a"), b.as("__b"))
      .select(shiftright(zvalue2(col("__a"), col("__b"), bits), log2Width)
        .as("bucket"), col("__a"), col("__b"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("__a")).as("min_a"), max(col("__a")).as("max_a"),
        min(col("__b")).as("min_b"), max(col("__b")).as("max_b"))
  }
}
