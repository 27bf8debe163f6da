package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.{FileSystem, Path}

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

  /** Per-partition before/after accounting returned by [[compact]]. */
  final case class CompactStats(partition: String,
                                filesBefore: Long, bytesBefore: Long,
                                filesAfter: Long, bytesAfter: Long)

  private def isDataFile(p: Path): Boolean = {
    val n = p.getName
    !n.startsWith("_") && !n.startsWith(".") && n != "_SUCCESS"
  }

  /** List the data files of a (possibly hive-partitioned) parquet
    * directory, grouped by partition-relative path ("" when the
    * directory is unpartitioned). Driver-side, but it touches file
    * METADATA only — the same listing every parquet scan of the
    * directory performs anyway. */
  private[sources] def partitionFiles(fs: FileSystem, root: Path)
      : Map[String, Seq[(Path, Long)]] = {
    val rootStr = root.toUri.getPath
    val it = fs.listFiles(root, /*recursive=*/ true)
    val buf = scala.collection.mutable.ArrayBuffer[(String, (Path, Long))]()
    while (it.hasNext) {
      val st = it.next()
      if (st.isFile && isDataFile(st.getPath)) {
        val parent = st.getPath.getParent.toUri.getPath
        val rel = parent.stripPrefix(rootStr).stripPrefix("/")
        // every parquet reader prunes hidden DIRECTORIES (segments
        // starting with _ or .) — e.g. a _graft_manifest sidecar —
        // so the listing must too, or manifest/compact would treat
        // reader-invisible files as data
        val hidden = rel.split("/")
          .exists(seg => seg.startsWith("_") || seg.startsWith("."))
        if (!hidden) buf += ((rel, (st.getPath, st.getLen)))
      }
    }
    buf.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSeq }
  }

  /** Small-file compaction for an append directory — the operational
    * staple of a 100 TB lake: the reference's batch writer
    * (scraper_v2.py:1334-1356) appends one small file per worker
    * batch, and on Spark every streaming/incremental `Append` sink
    * does the same; after months the partition holds thousands of
    * KB-scale files and scan task-scheduling overhead dominates reads.
    *
    * `compact` re-binpacks each leaf partition whose file count
    * exceeds ceil(partitionBytes / targetBytes): the partition's files
    * are read back and rewritten as that many files via `coalesce`
    * (split-merge only — NO shuffle; rows never leave the executor
    * that scanned them), then swapped in with two metadata renames.
    * Hive partitioning is preserved because each leaf is rewritten in
    * place — partition values stay encoded in the directory name and
    * never travel through the data.
    *
    * Scale posture: one small Spark job per rewritten partition, and
    * the jobs are independent — a cluster deployment submits them from
    * a scheduler pool in parallel (partition count bounds driver
    * memory, not data size; the loop below is serial only for
    * deterministic local tests). Skipped partitions (already at or
    * under their target file count) cost one listing and zero IO.
    * The swap is not transactional across partitions — like Hive/Delta
    * OPTIMIZE, readers of a partition see either the old or the new
    * file set, and a crash leaves at most one partition's `.compact`
    * temp dir to sweep. Row-level equality of the read-back is pinned
    * by CompactionSpec; the `compact_stats` oracle query cross-checks
    * file counts against a data-derived expectation.
    */
  def compact(spark: SparkSession, dir: String, targetBytes: Long): Seq[CompactStats] = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parts = partitionFiles(fs, root)
    // an unpartitioned compact swaps the whole root, destroying a
    // manifest sidecar — remember it existed BEFORE rewriting
    val hadManifest = fs.exists(new Path(s"$dir/_graft_manifest"))
    val stats = parts.toSeq.sortBy(_._1).map { case (rel, files) =>
      val bytes = files.map(_._2).sum
      val nBefore = files.size.toLong
      val nTarget = math.max(1L, (bytes + targetBytes - 1) / targetBytes)
      val leaf = if (rel.isEmpty) root else new Path(root, rel)
      if (nBefore <= nTarget) CompactStats(rel, nBefore, bytes, nBefore, bytes)
      else {
        val tmp = new Path(leaf.getParent, leaf.getName + ".compact")
        // Read the LEAF directly (no partition discovery — the leaf's
        // files carry only data columns) and merge splits shuffle-free.
        spark.read.parquet(leaf.toString).coalesce(nTarget.toInt)
          .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
        val trash = new Path(leaf.getParent, leaf.getName + ".old")
        if (!fs.rename(leaf, trash))
          throw new java.io.IOException(s"compact: could not stage $leaf")
        if (!fs.rename(tmp, leaf)) { // restore on failure
          fs.rename(trash, leaf)
          throw new java.io.IOException(s"compact: could not swap in $tmp")
        }
        fs.delete(trash, true)
        val after = partitionFiles(fs, leaf).getOrElse("", Seq.empty)
        CompactStats(rel, nBefore, bytes, after.size.toLong, after.map(_._2).sum)
      }
    }
    // compaction rewrites files — a recorded manifest would read as
    // all-drift; refresh it so the handoff contract survives OPTIMIZE
    if (hadManifest) writeManifest(spark, dir)
    stats
  }

  /** Per-file manifest of a parquet directory: (file, n_rows, bytes),
    * file as a scheme-free absolute path. The exactly-once handoff
    * contract between pipeline stages — the producer records it after
    * a batch ([[writeManifest]]), the consumer audits before
    * ingesting ([[verifyManifest]]): a half-written, vacuumed, or
    * tampered directory fails LOUDLY instead of silently
    * under-reading. Costs one scan (row counts ride
    * `input_file_name`) plus the listing every read performs anyway.
    */
  def manifest(spark: SparkSession, dir: String): DataFrame = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val sizes = partitionFiles(fs, root).values.flatten.toSeq
      .map { case (p, bytes) => (p.toUri.getPath, bytes) }
    import spark.implicits._
    val sizeDf = sizes.toDF("file", "bytes")
    spark.read.parquet(dir)
      .select(regexp_replace(input_file_name(), "^[a-z0-9+.-]+:/+", "/")
        .as("file"))
      .groupBy(col("file")).agg(count(lit(1)).as("n_rows"))
      .join(sizeDf, Seq("file"), "full")
      .select(col("file"),
        coalesce(col("n_rows"), lit(0L)).as("n_rows"), col("bytes"))
  }

  /** Persist the manifest INSIDE the directory as
    * `_graft_manifest` — the underscore prefix keeps every parquet
    * reader (Spark, DuckDB, Hive) from picking it up as data. */
  def writeManifest(spark: SparkSession, dir: String): Unit =
    manifest(spark, dir).coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/_graft_manifest")

  /** Audit the directory against its recorded manifest: one row per
    * discrepancy — `missing` (recorded, gone), `unexpected` (present,
    * unrecorded), `drift` (bytes or rows changed). Empty = clean
    * handoff. */
  def verifyManifest(spark: SparkSession, dir: String): DataFrame = {
    val recorded = spark.read.parquet(s"$dir/_graft_manifest")
      .select(col("file"), col("n_rows").as("rec_rows"),
        col("bytes").as("rec_bytes"))
    val current = manifest(spark, dir)
    current.join(recorded, Seq("file"), "full")
      .select(col("file"),
        when(col("n_rows").isNull, "missing")
          .when(col("rec_rows").isNull, "unexpected")
          .when(col("n_rows") =!= col("rec_rows") ||
            col("bytes") =!= col("rec_bytes"), "drift").as("problem"))
      .filter(col("problem").isNotNull)
  }

  /** Remove data files the recorded manifest does not know — the
    * cleanup half of the handoff contract: a crashed writer's
    * stragglers or a bad manual copy disappear instead of silently
    * joining the next read. Returns the removed paths; `dryRun`
    * lists without deleting. REFUSES to touch a directory whose
    * recorded files are missing or drifted (that is corruption to
    * investigate, not garbage to collect). */
  def vacuum(spark: SparkSession, dir: String,
             dryRun: Boolean = false): Seq[String] = {
    val problems = verifyManifest(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1)))
    val (orphans, corrupt) = problems.partition(_._2 == "unexpected")
    require(corrupt.isEmpty,
      s"vacuum refused: manifest reports non-orphan problems: " +
        corrupt.take(5).mkString(", "))
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    orphans.map(_._1).toSeq.sorted.map { f =>
      if (!dryRun) fs.delete(new Path(f), false)
      f
    }
  }

  /** Versioned SNAPSHOT of the directory's file census — time travel
    * on a plain append-only parquet directory (the Delta/Iceberg idea
    * with the manifest as the commit log): call after each batch
    * lands; [[readAt]] later reconstructs EXACTLY the rows visible at
    * that snapshot by scanning only the files it recorded, so
    * subsequent appends ([[idempotentAppend]] batches) are invisible
    * to it — snapshot isolation for a consumer pinned to a version.
    * Sound because appends never rewrite existing files; [[compact]]
    * DOES rewrite files and so invalidates older snapshots (the same
    * horizon contract as Delta's VACUUM breaking time travel).
    * Snapshots live under `_graft_snapshots/v<digits>` — the
    * underscore keeps parquet readers from seeing them as data.
    * Returns the new version number. */
  def snapshotManifest(spark: SparkSession, dir: String): Long = {
    val next = snapshotVersions(spark, dir).lastOption.getOrElse(-1L) + 1L
    manifest(spark, dir).coalesce(1)
      .write.mode(SaveMode.ErrorIfExists)
      .parquet(f"$dir/_graft_snapshots/v$next%06d")
    next
  }

  /** Recorded snapshot versions, ascending. */
  def snapshotVersions(spark: SparkSession, dir: String): Seq[Long] = {
    val root = new Path(s"$dir/_graft_snapshots")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq.map(_.getPath.getName)
      .filter(_.matches("v\\d+")).map(_.drop(1).toLong).sorted
  }

  /** The directory's rows exactly as of snapshot `version`: scans only
    * the files that snapshot recorded (basePath keeps hive partition
    * columns like `batch=` resolvable). A recorded file rewritten or
    * deleted since (compaction, vacuum beyond the horizon) fails the
    * scan loudly rather than silently under-reading. */
  def readAt(spark: SparkSession, dir: String, version: Long): DataFrame = {
    import spark.implicits._
    val files = spark.read.parquet(f"$dir/_graft_snapshots/v$version%06d")
      .select(col("file")).as[String].collect().toSeq
    require(files.nonEmpty, s"snapshot v$version recorded no files")
    spark.read.option("basePath", dir).parquet(files: _*)
  }

  /** Replay-safe batch append — the foreachBatch exactly-once recipe:
    * each batch lands under `batch=<id>` and a RE-DELIVERED id is a
    * no-op (returns false), so a retried streaming trigger or a
    * re-run orchestrator task cannot double-write. A half-written
    * prior attempt (no _SUCCESS marker) is overwritten, not appended
    * beside. Readers see `batch` as a partition column of `dir`. */
  def idempotentAppend(df: DataFrame, dir: String, batchId: Long): Boolean = {
    val target = new Path(s"$dir/batch=$batchId")
    val fs = target.getFileSystem(
      df.sparkSession.sparkContext.hadoopConfiguration)
    if (fs.exists(new Path(target, "_SUCCESS"))) false
    else {
      df.write.mode(SaveMode.Overwrite).parquet(target.toString)
      true
    }
  }
}
