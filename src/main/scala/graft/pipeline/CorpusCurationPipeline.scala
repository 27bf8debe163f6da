package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis
import graft.operators.{Components, Dedup, Materialize, Packing, Sampling}

/** The LLM-side capstone: the canonical corpus-curation chain — exact
  * dedup → minhash near-dedup → Gopher-style quality gates → weighted
  * mixture sampling → sequence packing — composed as ONE declarative
  * pipeline, the way [[EntityMatchPipeline]] composes the reference's
  * scraper workflow (scraper_v2.py:1438-1811). A training-data user
  * runs THIS, not the stages one by one.
  *
  * Architecture: every stage contributes a BOOLEAN KEEP FLAG on a
  * single annotated frame instead of materializing per-stage corpus
  * copies. The curated set is one conjunctive filter over the flags,
  * and the per-stage report is ONE aggregation over the same frame —
  * five filtered re-counts would re-run the dedup chain per stage
  * (the round-2 minhash lesson: Spark re-derives unshared subtrees
  * per consumer). Flags are deterministic per document (content hash,
  * component membership, column arithmetic, key hash), so membership
  * survives reruns and repartitioning.
  *
  * Scale shape: exact dedup is one content-hash window; near-dedup is
  * the bounded-index minhash chain ([[Dedup.minhashLsh]]) over exact
  * SURVIVORS only (the standard order — near-dup candidate generation
  * never sees rows exact dedup already removed); quality and mixture
  * are map-side column arithmetic; packing is one per-stratum window.
  * Document text crosses the wire only in the two content-keyed dedup
  * exchanges, which any exact/near dedup fundamentally requires. At
  * cluster scale, checkpoint the survivors frame between the dedup
  * and annotation passes so the exact-dedup window is not re-derived
  * per minhash consumer (Spark recomputes unshared subtrees; the
  * composed plan here re-evaluates it three times, bounded and
  * plan-gated in PlanShapeSpec).
  */
object CorpusCurationPipeline {

  /** Stage names in cascade order; `report` carries one row each. */
  val stages: Seq[String] =
    Seq("input", "exact_dedup", "near_dedup", "quality", "mixture")

  /** All frames are lazy views over the input (the components
    * fixpoint inside the near-dup stage runs eagerly, as in any
    * iterative operator).
    *
    * @param annotated one row per input doc: (id, lang, text,
    *                  keep_exact, keep_near, pass_quality,
    *                  keep_mixture, n_tok)
    * @param packed    curated docs with their context-window bin:
    *                  (id, lang, n_tok, bin)
    * @param report    per-stage cumulative survivor counts and token
    *                  volume: (stage_ord, stage, n_docs, n_tokens)
    * @param release   frees the run's pinned storage: the
    *                  components-fixpoint cache entry AND the
    *                  materialized labels blocks. Call when DONE with
    *                  all three frames — the cut's lineage is
    *                  truncated, so after release the frames cannot
    *                  recompute (use-after-release is an error, like
    *                  closing a file). */
  case class Result(annotated: DataFrame, packed: DataFrame, report: DataFrame,
                    release: () => Unit = () => ())

  /** @param weights per-language keep rates in permyriad (the
    *                training-mixture weights); absent langs keep
    *                `defaultPermyriad`
    * @param budget  context-window token budget for packing
    * @param threshold minhash Jaccard verification threshold */
  def run(docs: DataFrame, idCol: String, langCol: String, textCol: String,
          weights: Map[String, Int], defaultPermyriad: Int = 10000,
          budget: Long = 256L, threshold: Double = 0.5): Result = {
    val base = docs.select(col(idCol).as("id"), col(langCol).as("lang"),
      col(textCol).as("text"))

    // stage 1 — exact dedup: keep the min id of every content-hash
    // group (one window on md5(text); ids are unique, so no ties)
    val withExact = base.withColumn("keep_exact",
      col("id") === min(col("id")).over(Window.partitionBy(md5(col("text")))))

    // stage 2 — near-dedup over exact survivors: minhash pairs →
    // connected components → drop non-canonical members. Joins back
    // as a flag so later stages stay on the single annotated frame.
    val survivors = withExact.filter(col("keep_exact"))
      .select(col("id"), col("text"))
    val (labels0, fixpointHandle, _) = Components.connectedWithHandle(
      Dedup.minhashLsh(survivors, "id", "text", threshold = threshold),
      "id_a", "id_b")
    // The Materialize cut TRUNCATES the fixpoint lineage: the labels
    // plan nests one join per iteration, each referencing the minhash
    // chain — if the SQL cache entry is dropped (the harness
    // clearCache()s between queries, and the memoized Result outlives
    // that), re-evaluating the raw plan re-runs the minhash chain
    // once per iteration. The materialized frame is not a catalog
    // cache entry, so consumers keep reading the stored labels; the
    // cut's durability follows spark.graft.materialize (a cluster run
    // on preemptible executors sets reliable/parquet — Materialize).
    val labels = Materialize.cut(labels0)
    val drops = labels
      .filter(col("node") =!= col("component"))
      .select(col("node").as("id"), lit(true).as("__graft_neardrop"))

    // stage 3 — Gopher-style gates, the same expression the standalone
    // text_gopher_quality query evaluates (one shared source; the SQL
    // duplicate in PipelineQ's oracle is the intentional
    // independent-derivation pattern)
    val quality = TextAnalysis.gopherPass(col("text"))

    val annotated = withExact
      // explicit hint (guide §3.1): the drop list is dim-sized (near-
      // dup cluster members only) but arrives off a Materialize cut
      // whose LogicalRDD stats are estimates — since r17 connected()
      // returns cuts, not cache marks, the exact materialized-cache
      // size no longer backs the planner's broadcast choice here
      .join(broadcast(drops), Seq("id"), "left")
      .withColumn("keep_near", col("__graft_neardrop").isNull)
      .drop("__graft_neardrop")
      .withColumn("n_tok", TextAnalysis.tokenCount(col("text")))
      .withColumn("pass_quality", coalesce(quality, lit(false)))
      // stage 4 — mixture resampling, deterministic by doc hash
      .withColumn("keep_mixture",
        Sampling.weightedPred("id", "lang", weights, defaultPermyriad))

    val flags = Seq("keep_exact", "keep_near", "pass_quality", "keep_mixture")
    val curated = annotated.filter(flags.map(col).reduce(_ && _))
      .select(col("id"), col("lang"), col("n_tok"))

    // stage 5 — context-window packing per language (per-stratum
    // window cumsum, integer div bins — never a global sort)
    val packed = Packing.packByBudget(curated, Seq("lang"), "id", "n_tok", budget)

    // report: cumulative survivor counts in ONE aggregation; stacks
    // back to one row per stage
    val conds: Seq[Column] = flags.scanLeft(lit(true))((acc, f) => acc && col(f))
    val aggCols = conds.zipWithIndex.flatMap { case (c, i) =>
      Seq(coalesce(sum(when(c, lit(1L))), lit(0L)).as(s"n$i"),
        coalesce(sum(when(c, col("n_tok").cast("long"))), lit(0L)).as(s"t$i"))
    }
    val stackArgs = stages.indices
      .map(i => s"$i, '${stages(i)}', n$i, t$i").mkString(", ")
    val report = annotated.agg(aggCols.head, aggCols.tail: _*)
      .selectExpr(s"stack(${stages.size}, $stackArgs) " +
        "AS (stage_ord, stage, n_docs, n_tokens)")

    Result(annotated, packed, report, () => {
      // the fixpoint handle is a Materialize cut since r17 (connected
      // no longer leaves a cache mark) — release, not unpersist
      Materialize.release(fixpointHandle)
      Materialize.release(labels)
    })
  }
}
