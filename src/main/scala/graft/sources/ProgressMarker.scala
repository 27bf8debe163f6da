package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch progress-marker persistence — the reference's resume file
  * (scraper_v2.py:1423-1435, save/load of the last processed index)
  * re-expressed for a distributed job: a tiny marker file on any
  * Hadoop-compatible filesystem (local, HDFS, S3A), written via
  * temp-file + rename so readers never observe a partial marker.
  *
  * The point of the two-step pattern (load marker → filter with a
  * LITERAL) is scan pruning: a literal watermark comparison reaches
  * the parquet scan as a static pushed filter, where a runtime
  * subquery marker (cf. the `resume_incremental` query) cannot.
  */
object ProgressMarker {

  /** Persist `value` as the marker at `path` via temp-file +
    * overwrite-rename (FileContext.rename(OVERWRITE) — atomic on
    * HDFS/local, so a crash leaves either the old or the new marker,
    * never nothing and never a partial file. On S3A rename is
    * copy+delete, so only the no-partial-read property holds there;
    * point the marker at a real filesystem for crash atomicity). */
  def save(spark: SparkSession, path: String, value: String): Unit = {
    val p = new Path(path)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = p.getFileSystem(conf)
    val tmp = new Path(path + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(value.getBytes(StandardCharsets.UTF_8)) finally out.close()
    org.apache.hadoop.fs.FileContext.getFileContext(p.toUri, conf)
      .rename(tmp, p, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** [[save]] under the config's retry budget (retry.max_retries /
    * retry.extra_wait_per_retry) — marker writes against an
    * eventually-consistent store are the one driver-side FS action a
    * long resume-driven run cannot afford to lose to a transient. */
  def saveWithRetries(spark: SparkSession, path: String, value: String,
                      cfg: GraftConfig): Unit =
    Retry.withRetries(cfg.maxRetries,
      scala.concurrent.duration.Duration(cfg.extraWaitPerRetrySec.toLong,
        scala.concurrent.duration.SECONDS)) {
      save(spark, path, value)
    }

  /** The saved marker, or None before the first save. */
  def load(spark: SparkSession, path: String): Option[String] = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val len = fs.getFileStatus(p).getLen.toInt
      val bytes = new Array[Byte](len)
      val in = fs.open(p)
      try in.readFully(0, bytes) finally in.close()
      Some(new String(bytes, StandardCharsets.UTF_8))
    }
  }

  /** Rows past the marker: `df` filtered to `watermarkCol > marker`
    * (marker cast to the column's type); the whole frame when no
    * marker exists yet. The literal comparison is a statically pushed
    * scan filter — verify with PushedFilters in the plan. */
  def resumeAfter(df: DataFrame, watermarkCol: String, marker: Option[String]): DataFrame =
    marker match {
      case Some(m) =>
        df.filter(col(watermarkCol) > lit(m).cast(df.schema(watermarkCol).dataType))
      case None => df
    }
}
