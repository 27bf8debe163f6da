package graft.operators

import org.apache.spark.sql.DataFrame
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
    val payload = base.columns.filterNot(keys.contains)
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
}
