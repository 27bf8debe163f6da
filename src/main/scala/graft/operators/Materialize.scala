package graft.operators

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.DataFrame

/** Lineage-cut materialization with a durability knob.
  *
  * Iterative and multi-consumer chains (incremental near-dedup
  * survivors, the BPE vocab fold, PCA power iteration, the curation
  * pipeline's component labels) must cut their lineage or re-derive
  * the whole upstream plan once per consumer — measured superlinear on
  * the 10x→30x smoke until materialized. `localCheckpoint` is the
  * right local/bench default (memory+disk blocks, zero extra config),
  * but its blocks live in EXECUTOR storage: on a real cluster a single
  * preempted/lost executor past the cut point kills the job, because a
  * localCheckpoint'd RDD cannot be recomputed (the lineage was
  * truncated). A 1000-executor spot-instance run therefore wants a
  * DURABLE cut.
  *
  * The strategy is a session conf so deployments flip it without
  * touching call sites:
  *
  *   spark.graft.materialize = local              (default; executor-lifetime)
  *   spark.graft.materialize = reliable           (df.checkpoint to the
  *       sparkContext checkpoint dir — set spark.sparkContext
  *       .setCheckpointDir to HDFS/S3 first; survives executor loss)
  *   spark.graft.materialize = parquet:<scratch>  (write-and-rescan: the cut
  *       frame is written as parquet under <scratch> and re-read; survives
  *       executor AND driver loss, costs columnar encode/decode, and the
  *       rescan gets a real schema'd FileScan — AQE/pruning apply downstream)
  *
  * All three produce bit-identical frames (MaterializeSpec pins it);
  * they differ only in where the bytes live. A cluster run picks
  * `reliable` when the checkpoint dir is on durable storage and the
  * cut frames are transient, `parquet:` when cut points double as
  * restart points (the write IS the progress marker — see
  * sources.ProgressMarker for the resume pattern).
  */
object Materialize {

  private val seq = new AtomicLong(0L)
  /** Conf key; read per call so tests/deployments can flip mid-session. */
  val ConfKey = "spark.graft.materialize"

  /** Cut `df`'s lineage eagerly under the session's configured
    * strategy and return the materialized frame. */
  def cut(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.get(ConfKey, "local") match {
      case "local" => df.localCheckpoint(true)
      case "reliable" =>
        require(spark.sparkContext.getCheckpointDir.isDefined,
          s"$ConfKey=reliable needs sparkContext.setCheckpointDir(<durable path>)")
        df.checkpoint(true)
      case s if s.startsWith("parquet:") =>
        val scratch = s.stripPrefix("parquet:")
        require(scratch.nonEmpty, s"$ConfKey=parquet:<scratch> needs a path")
        // unique leaf per cut: JVM-unique counter + session-unique
        // suffix so two sessions sharing a scratch root never collide
        val leaf = f"$scratch/mat_${spark.sparkContext.applicationId}_${seq.getAndIncrement()}%05d"
        df.write.mode("overwrite").parquet(leaf)
        spark.read.parquet(leaf)
      case other =>
        throw new IllegalArgumentException(
          s"$ConfKey: unknown strategy '$other' (local | reliable | parquet:<scratch>)")
    }
  }

  /** Free a frame returned by [[cut]] when the pipeline is done with
    * it: unpersists the checkpoint blocks for local/reliable cuts;
    * parquet cuts are files under the caller's scratch dir (their
    * lifecycle — e.g. a TTL'd bucket prefix — already owns cleanup). */
  def release(df: DataFrame): Unit =
    df.queryExecution.analyzed.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }.foreach(_.unpersist(false))
}
