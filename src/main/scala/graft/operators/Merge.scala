package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Latest-wins upsert merge — the MERGE INTO / change-data-capture
  * shape (apply a batch of inserts/updates/deletes to a snapshot)
  * without a table format: pure DataFrames in, merged DataFrame out.
  *
  * Plan shape, chosen for 100 TB: union → groupBy(keys) →
  * `max_by(payload, (version, source-rank))`. A hash aggregation with
  * map-side partial combine — one shuffle keyed on the merge key and
  * NO per-key sort, unlike the window-function formulation
  * (`row_number() OVER (PARTITION BY key ORDER BY version DESC)`)
  * which sorts every group. At equal version the change row outranks
  * the base row (source rank), so re-applying the same change batch
  * is idempotent.
  */
object Merge {

  /** Apply `changes` to `base`. Both must share the schema:
    * `keys ++ payload ++ (versionCol, deletedCol)`. Keeps, per key,
    * the row with the greatest (version, source) — source: changes=1
    * beats base=0 — then drops keys whose winning row has
    * `deletedCol = true`. Deterministic whenever `versionCol` is
    * unique per (key, source), which a CDC log guarantees by
    * construction. */
  def upsert(base: DataFrame, changes: DataFrame, keys: Seq[String],
             versionCol: String, deletedCol: String): DataFrame = {
    require(base.columns.sorted.sameElements(changes.columns.sorted),
      s"schemas differ: base=${base.columns.sorted.mkString(",")} " +
        s"changes=${changes.columns.sorted.mkString(",")}")
    require(!base.columns.exists(Set("__graft_src", "__graft_w")),
      "input must not contain the reserved columns __graft_src/__graft_w")
    val payload = base.columns.filterNot(keys.contains).toSeq
    val all = base.withColumn("__graft_src", lit(0))
      .unionByName(changes.withColumn("__graft_src", lit(1)))
    all
      .groupBy(keys.map(col): _*)
      .agg(max_by(
        struct(payload.map(col): _*),
        struct(col(versionCol), col("__graft_src"))).as("__graft_w"))
      .select(keys.map(col) ++ payload.map(c => col(s"__graft_w.$c").as(c)): _*)
      .filter(!col(deletedCol))
  }

  /** Apply an I/U/D changelog to a snapshot — the stream-table /
    * Debezium shape [[upsert]] can't express: one batch may carry
    * SEVERAL ops for a key (update then delete, delete then
    * re-insert) and only the key's FINAL op decides its fate. The
    * final op's payload wins; `D` removes the key; an `I`/`U` after a
    * `D` resurrects it. Snapshot rows without log entries pass
    * through.
    *
    * Plan shape, same scale contract as [[upsert]]: union (snapshot
    * rows tagged seq=-∞, op=I) → groupBy(keys) →
    * `max_by(struct(payload, op), (seq, source))` → filter the
    * winner's op ≠ D. ONE shuffle keyed on the merge key, map-side
    * partial combine, no per-key window sort. Re-applying the same
    * log is idempotent: a logged key's winner never depends on the
    * snapshot side.
    *
    * Deterministic whenever `seqCol` is unique per key within `log`
    * (the CDC offset/LSN contract). `snapshot` is `keys ++ payload`;
    * `log` is `keys ++ payload ++ (seqCol, opCol)` with op ∈ I/U/D
    * (D payload ignored). */
  def cdcApply(snapshot: DataFrame, log: DataFrame, keys: Seq[String],
               seqCol: String, opCol: String): DataFrame = {
    val payload = snapshot.columns.filterNot(keys.contains).toSeq
    require(log.columns.toSet == (snapshot.columns ++ Seq(seqCol, opCol)).toSet,
      s"log schema must be snapshot ++ ($seqCol, $opCol): " +
        s"snapshot=${snapshot.columns.sorted.mkString(",")} log=${log.columns.sorted.mkString(",")}")
    require(!snapshot.columns.exists(Set("__graft_src", "__graft_w")),
      "input must not contain the reserved columns __graft_src/__graft_w")
    // the snapshot's sentinel seq is NULL, not a numeric MIN: a struct
    // with a null field loses every max_by comparison (nulls-first
    // field ordering), which is exactly "older than any log entry" —
    // and unlike casting Long.MinValue it cannot overflow-throw under
    // ANSI when the log's seq is a narrower type (int/short/date)
    val seqType = log.schema(seqCol).dataType
    val base = snapshot
      .withColumn(seqCol, lit(null).cast(seqType))
      .withColumn(opCol, lit("I"))
      .withColumn("__graft_src", lit(0))
    val all = base.unionByName(log.withColumn("__graft_src", lit(1)))
    all
      .groupBy(keys.map(col): _*)
      .agg(max_by(
        struct((payload :+ opCol).map(col): _*),
        struct(col(seqCol), col("__graft_src"))).as("__graft_w"))
      .filter(col(s"__graft_w.$opCol") =!= "D")
      .select(keys.map(col) ++ payload.map(c => col(s"__graft_w.$c").as(c)): _*)
  }

  /** SCD2 (slowly-changing-dimension type 2) history from a change
    * log — the warehouse shape `upsert` can't express: every key keeps
    * its full payload HISTORY as validity intervals instead of
    * latest-wins. Input rows are `keys ++ payload ++ versionCol`;
    * output replaces `versionCol` with `(valid_from, valid_to)` where
    * `valid_to` is the next change's version and NULL marks the
    * current row.
    *
    * Change-set compression: consecutive versions with an identical
    * payload collapse into one interval (a CDC log that re-emits an
    * unchanged row must not split history), via a `lag` over the
    * per-key version order.
    *
    * Plan shape at 100 TB: ONE shuffle on `keys`; the `lag`
    * (compression) and `lead` (interval close) windows share that
    * partitioning, so the second window adds only an intra-partition
    * sort over the already-compressed rows, no second exchange.
    *
    * Deterministic whenever (keys, versionCol) collides only on
    * identical payloads — re-delivered CDC rows — which compression
    * then absorbs. */
  def scd2(log: DataFrame, keys: Seq[String], versionCol: String): DataFrame = {
    val payload = log.columns.filterNot(c => keys.contains(c) || c == versionCol).toSeq
    require(payload.nonEmpty, "scd2 needs at least one payload column")
    require(!log.columns.exists(Set("valid_from", "valid_to", "__graft_prev")),
      "input must not contain valid_from/valid_to/__graft_prev")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(versionCol))
    val p = struct(payload.map(col): _*)
    log
      .withColumn("__graft_prev", lag(p, 1).over(w))
      .filter(col("__graft_prev").isNull || col("__graft_prev") =!= p)
      .withColumn("valid_from", col(versionCol))
      .withColumn("valid_to", lead(col(versionCol), 1).over(w))
      .select((keys ++ payload).map(col) :+ col("valid_from") :+ col("valid_to"): _*)
  }

  /** Apply a new change batch to an existing SCD2 history: re-derive
    * from the history's own change log (each interval start IS the
    * change event) unioned with the batch. Re-applying the same batch
    * is a fixpoint — the duplicate (key, version, payload) rows
    * compress away — which is the idempotency contract a warehouse
    * merge needs under at-least-once delivery. */
  def scd2Apply(history: DataFrame, changes: DataFrame, keys: Seq[String],
                versionCol: String): DataFrame = {
    val log = history.drop("valid_to").withColumnRenamed("valid_from", versionCol)
    scd2(log.unionByName(changes.select(log.columns.toSeq.map(col): _*)), keys, versionCol)
  }
}
