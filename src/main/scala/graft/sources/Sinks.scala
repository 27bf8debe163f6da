package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Output layer, re-expressing the reference's batched CSV sink
  * (scraper_v2.py:1334-1420: per-worker batch files, combined at the
  * end, with a separate not-found output).
  *
  * On Spark the "batch files + combine" dance is what a partitioned
  * write already is — each task writes its own file, the directory is
  * the combined result, and atomicity comes from the commit protocol
  * rather than manual backups. `partitionedParquet` additionally
  * hive-partitions by low-cardinality keys so downstream readers get
  * partition pruning for free.
  */
object Sinks {

  /** Hive-partitioned parquet fact sink. `partitionBy` columns should
    * be low-cardinality (year, field); high-cardinality partitioning
    * creates a small-file explosion at scale. */
  def partitionedParquet(df: DataFrame, path: String, partitionCols: Seq[String],
                         mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).partitionBy(partitionCols: _*).parquet(path)

  /** Header'd CSV sink (the reference's output format). `shards`
    * bounds the file count — the analog of its batch files. */
  def csv(df: DataFrame, path: String, shards: Int = 0,
          mode: SaveMode = SaveMode.Overwrite): Unit = {
    val out = if (shards > 0) df.repartition(shards) else df
    out.write.mode(mode).option("header", "true").csv(path)
  }

  /** Append a batch to an existing dataset — the reference's
    * incremental batch save (scraper_v2.py:1547-1555), minus the
    * manual combine step. */
  def appendParquet(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Append).parquet(path)

  /** Timestamped backup of an existing output before overwrite
    * (scraper_v2.py:1371-1383), then write. `now` is caller-supplied
    * so the operation stays deterministic/testable. */
  def backupAndWriteParquet(df: DataFrame, path: String, now: java.time.Instant,
                            forceOverwrite: Boolean = false): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    // force_overwrite (config.yaml output section) skips the backup,
    // like the reference's --force path (scraper_v2.py:1371)
    if (!forceOverwrite && fs.exists(p)) {
      val stamp = java.time.format.DateTimeFormatter.ofPattern("yyyyMMdd_HHmmss")
        .withZone(java.time.ZoneOffset.UTC).format(now)
      fs.rename(p, new org.apache.hadoop.fs.Path(s"${path}_backup_$stamp"))
    }
    df.write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** Bucketed managed table — the LAYOUT that removes the join
    * shuffle: two tables bucketed by the same key into the same bucket
    * count join with NO exchange on either side (each bucket pair is
    * joined in place), the technique that turns a recurring 100 TB
    * fact-fact join from shuffle-bound to scan-bound. Sorted within
    * buckets so the join is a zip merge, not a hash build.
    * BucketedJoinSpec asserts the exchange-free plan. */
  def bucketedTable(df: DataFrame, table: String, bucketCol: String,
                    nBuckets: Int): Unit = {
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    df.write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(nBuckets, bucketCol).sortBy(bucketCol)
      .saveAsTable(table)
  }

  /** Split a frame into matched / not-matched side outputs in one
    * pass over the plan (the reference's revenue vs not-found split).
    * Returns (matched, notFound). */
  def splitFound(df: DataFrame, foundCol: String): (DataFrame, DataFrame) =
    (df.filter(col(foundCol)).drop(foundCol),
      df.filter(!col(foundCol)).drop(foundCol))
}
