package graft

/** Plan-shape regression gate: the §5/§6 scale claims, asserted on the
  * real physical plans so a future change that silently regresses a
  * broadcast, a pushdown, or the custom-operator path fails the build
  * — tools/ExplainAudit promoted from a dev script to a spec.
  */
class PlanShapeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("join_star runs all four dimension joins as broadcasts") {
    val p = plan("join_star")
    assert("BroadcastHashJoin".r.findAllIn(p).size == 4, s"\n$p")
    assert(!p.contains("SortMergeJoin"), s"\n$p")
  }

  test("q3_shipping_priority: broadcast dims, pushed date filters, no global sort") {
    val p = plan("q3_shipping_priority")
    // the filtered customer side broadcasts; the top-10 runs as
    // TakeOrderedAndProject, never a full sort of the join output
    assert(p.contains("BroadcastHashJoin"), s"\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"\n$p")
    assert(
      "PushedFilters: \\[[^\\]]*(LessThan|GreaterThan)".r.findFirstIn(p).isDefined,
      s"\n$p")
  }

  test("ivm_join: every dim side broadcasts; no fact-fact shuffle join") {
    val p = plan("ivm_join")
    assert(!p.contains("SortMergeJoin"), s"\n$p")
    assert("BroadcastHashJoin".r.findAllIn(p).size == 3, s"\n$p")
  }

  test("search_hybrid: both legs prune via TakeOrderedAndProject before ranking") {
    val p = plan("search_hybrid")
    // two top-20 prunes (lexical + vector); the only Window runs on
    // the pruned 20-row frames, and no corpus-wide global Sort feeds it
    assert("TakeOrderedAndProject".r.findAllIn(p).size >= 2, s"\n$p")
    assert(!p.contains("CartesianProduct"), s"\n$p")
  }

  test("q1_agg pushes its filter into the parquet scan") {
    val p = plan("q1_agg")
    assert(
      "PushedFilters: \\[[^\\]]*(LessThan|GreaterThan|EqualTo|IsNotNull)".r
        .findFirstIn(p).isDefined, s"\n$p")
  }

  test("table_profile_approx plans without Expand; the exact twin documents why") {
    // five exact countDistincts replicate input 5× through Expand —
    // the round-5 verdict's one `weak` plan; the approx profile on the
    // native HLL aggregate must stay a single no-Expand aggregation
    val p = plan("table_profile_approx")
    assert(!p.contains("Expand"), s"\n$p")
    assert("Exchange".r.findAllIn(p).size <= 1, s"\n$p")
    assert(plan("table_profile").contains("Expand")) // the documented contrast
  }

  test("profile_grouped: two HLL aggregates share one no-Expand aggregation") {
    val p = plan("profile_grouped")
    assert(!p.contains("Expand"), s"\n$p")
    // one group-key shuffle; the only other exchange is the
    // presentation orderBy's range partitioning
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, s"\n$p")
  }

  test("interval_join is a bucketed equi-join, never a theta cross product") {
    val p = plan("interval_join")
    assert(!p.contains("CartesianProduct"), s"\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"\n$p")
  }

  test("asof_join is a single hash Exchange (one shuffle, one sort)") {
    val p = plan("asof_join")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, s"\n$p")
  }

  test("match_best runs on TopKPerKeyExec (partial+final), not a row_number window") {
    val p = plan("match_best")
    assert("TopKPerKey".r.findAllIn(p).size == 2, s"\n$p")
    // the index's df-cap/recount windows are fine; the RANKING must
    // not be a window sort
    assert(!p.contains("row_number"), s"\n$p")
  }

  test("match_jaccard_join does not multiply input scans") {
    // the groupBy+join-back index formulation once produced 16 scans
    // of the input with no exchange reuse; the window formulation
    // keeps it at one scan per candidate side (+ per-side re-derive)
    val p = plan("match_jaccard_join")
    assert("Scan parquet".r.findAllIn(p).size <= 6, s"\n$p")
  }

  test("dedup_minhash_lsh evaluates the shingle subtree once per consumer") {
    // the band self-join + two verify joins once re-derived
    // WordShingles/MinHashSignature up to 4×; the groupBy pair
    // expansion + melt-verify keep it at one evaluation per consumer
    // (candidate generation, verification)
    // the query input is a 3-way union (plantedDocs), so one consumer
    // = 3 scans: 2 consumers × 3 = 6. The self-join formulation's 4
    // consumers would show 12.
    val p = plan("dedup_minhash_lsh")
    assert("FileScan".r.findAllIn(p).size <= 6, s"\n$p")
    assert("Project \\[[^\\n]*wordshingles".r.findAllIn(p).size <= 6, s"\n$p")
  }

  test("dedup_minhash_est shares the lsh plan discipline — no extra shingle evals") {
    // est adds the signature column to the same melt-verify join, so
    // the consumer count stays at 2 (candidates, verification):
    // 2 × 3 plantedDocs scans = 6, same bound as dedup_minhash_lsh
    val p = plan("dedup_minhash_est")
    assert("FileScan".r.findAllIn(p).size <= 6, s"\n$p")
    assert("Project \\[[^\\n]*wordshingles".r.findAllIn(p).size <= 6, s"\n$p")
  }

  test("join_bloom prunes the big side BEFORE its join exchange") {
    // the point of the operator: rows failing the Bloom predicate never
    // reach the shuffle. The bloom membership filter (bitmask
    // element_at over the broadcast packed row) must sit below the
    // exchange feeding the customer join.
    val p = plan("join_bloom")
    val blIdx = p.indexOf("__graft_bloom_words")
    // the customer join is the topmost join in the plan; plans print
    // top-down, so the bloom membership filter must appear AFTER it in
    // the string (= inside a join child subtree, on the orders side) —
    // a refactor that prunes after the join would print it before
    val joinIdx = Seq("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin")
      .map(p.indexOf).filter(_ >= 0).minOption.getOrElse(-1)
    assert(blIdx >= 0, s"bloom filter missing from plan\n$p")
    assert(joinIdx >= 0, s"no equi-join in plan\n$p")
    assert(blIdx > joinIdx, s"bloom filter above the c_custkey join\n$p")
  }

  test("decontaminate_bloom probes the bitmask BEFORE the gram join's exchange") {
    // the variant's reason to exist: train grams failing the Bloom
    // probe never reach the (deliberately non-broadcast) gram join's
    // shuffle. The probe filter must sit inside the join's child
    // subtree — below its exchange — not above the join.
    val p = plan("decontaminate_bloom")
    val blIdx = p.indexOf("__graft_bloom_words")
    val joinIdx = Seq("SortMergeJoin", "ShuffledHashJoin")
      .map(p.indexOf).filter(_ >= 0).minOption.getOrElse(-1)
    assert(blIdx >= 0, s"bloom probe missing from plan\n$p")
    assert(joinIdx >= 0, s"gram join was broadcast — the variant must model " +
      s"the non-broadcastable benchmark side\n$p")
    assert(blIdx > joinIdx, s"bloom probe above the gram join\n$p")
    // exchange budget: join sides (2) + the dual-countDistinct's
    // Expand distinct + final group agg + the bloom build's tiny
    // word agg — anything past 6 means a new unplanned shuffle
    val ex = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(ex <= 6, s"unexpected exchange count $ex\n$p")
  }

  test("dedup_semantic: pair expansion is cell-keyed, never a cross product") {
    val p = plan("dedup_semantic")
    assert(!p.contains("CartesianProduct"), s"\n$p")
    // the pair stage must be an equi-join on the cell/block key
    // (embeddingPairsBlocked joins on "blk"); the only nested-loop
    // joins allowed are the k-means chain's tiny broadcast anchor
    // scans (corpus × 4 anchors — bounded, deliberate)
    assert("(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) \\[?blk".r
      .findFirstIn(p).isDefined, s"pair join not keyed on blk\n$p")
  }

  test("pack_sequences shuffles once on the stratum key (no global sort)") {
    val p = plan("pack_sequences")
    // window partitioned by lang + groupBy(lang, bin) reuse the same
    // partitioning; the only other exchange is the output orderBy's
    // range partitioning
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 2, s"\n$p")
    assert(!p.contains("Exchange SinglePartition"), s"\n$p")
  }

  test("sample_weighted filters map-side before its aggregation exchange") {
    val p = plan("sample_weighted")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, s"\n$p")
    val ex = p.indexOf("Exchange hashpartitioning")
    val filt = p.indexOf("md5")
    assert(filt > ex, s"slot filter must sit below the agg exchange\n$p")
  }

  test("bpe_pairs takes TakeOrderedAndProject, never a global Sort") {
    val p = plan("bpe_pairs")
    assert(p.contains("TakeOrderedAndProject"), s"\n$p")
    assert(!p.contains("Exchange rangepartitioning"), s"\n$p")
  }

  test("mix_resample: derived rates broadcast back; docs shuffle only to aggregate") {
    val p = plan("mix_resample")
    // rates (|sources| rows) must come back as a broadcast join, and
    // the doc side shuffles only for its two aggregations (token agg
    // + final group-by) — never for the rates join itself. T_min is a
    // window on the rates rows, so documents is scanned exactly twice
    // (the honest 2-pass), not once per rates consumer.
    assert(p.contains("BroadcastHashJoin"), s"\n$p")
    assert(!p.contains("SortMergeJoin"), s"\n$p")
    assert("FileScan parquet".r.findAllIn(p).size == 2, s"\n$p")
  }

  test("sketch_quantile: interpolation runs on the 128-row sketch, min/max broadcast") {
    val p = plan("sketch_quantile")
    // both scalar aggregates (min/max pass, total count) and the
    // 5-row quantile list reach the sketch via broadcast nested loop
    // joins — the full doc scan feeds exactly one hash aggregation
    assert(!p.contains("SortMergeJoin"), s"\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, s"\n$p")
  }

  test("vocab_coverage: vocab via TakeOrdered, rejoined broadcast (2-pass, no vocab sort)") {
    val p = plan("vocab_coverage")
    assert(p.contains("TakeOrderedAndProject"), s"\n$p")
    assert(p.contains("BroadcastHashJoin"), s"\n$p")
    assert(!p.contains("SortMergeJoin"), s"\n$p")
  }

  test("dedup_incremental: the fingerprint store joins as a broadcast anti, never shuffled") {
    val p = plan("dedup_incremental")
    assert(p.contains("BroadcastHashJoin LeftAnti".substring(0, 17)), s"\n$p")
    assert(p.contains("LeftAnti"), s"\n$p")
    assert(!p.contains("SortMergeJoin"), s"\n$p")
  }

  test("dedup_substring: pair join keyed on the window hash, never a cartesian") {
    val p = plan("dedup_substring")
    assert(!p.contains("CartesianProduct"), s"\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"\n$p")
    // the join key is the md5 window hash (an expression join key
    // shows as hash partitioning on h)
    assert(p.contains("hashpartitioning(h"), s"\n$p")
  }

  test("bpe_apply final plan: vocab counts rejoin broadcast, one corpus scan, one sort") {
    // the iterative learn/fold runs over the checkpointed word-freq
    // vocabulary at CONSTRUCTION time (LogicalRDD in the final plan);
    // what the final plan must show is the per-doc rebuild shape: the
    // corpus scanned once, per-word token counts joined broadcast,
    // and the only full sort being the presentation orderBy
    val p = plan("bpe_apply")
    assert(p.contains("BroadcastHashJoin"), s"\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), s"\n$p")
    assert("FileScan parquet".r.findAllIn(p).size == 1, s"\n$p")
    assert("\\bSort \\[".r.findAllIn(p).size == 1, s"\n$p")
  }

  test("quantile_grouped: per-group bin params broadcast back, no sort-merge") {
    val p = plan("quantile_grouped")
    assert(p.contains("BroadcastHashJoin"), s"\n$p")
    assert(!p.contains("SortMergeJoin"), s"\n$p")
    assert("FileScan parquet".r.findAllIn(p).size == 2, s"\n$p")
  }

  test("fill_forward: one key exchange feeds the LOCF window") {
    val p = plan("fill_forward")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, s"\n$p")
  }

  test("asof_nearest: both directional sweeps share one key exchange") {
    // the nearest join's contract: the ascending (backward) and
    // descending (forward) windows both partition by the key, so the
    // second adds an intra-partition sort, never a second shuffle —
    // only the output orderBy's range partitioning remains
    val p = plan("asof_nearest")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, s"\n$p")
  }

  test("merge_scd2 shuffles once on the key; lag and lead share the exchange") {
    // the SCD2 contract: the compression (lag) and interval-close
    // (lead) windows both partition by the merge key, so the second
    // window must reuse the first's exchange — only the output
    // orderBy's range partitioning may add another
    val p = plan("merge_scd2")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, s"\n$p")
  }

  test("mm_image_dims is a pure map-side projection (zero hash exchanges)") {
    val p = plan("mm_image_dims")
    assert(!p.contains("Exchange hashpartitioning"), s"\n$p")
  }

  test("ann_pq scoring joins are broadcast lookups, never a shuffled cartesian") {
    // the ADC contract: the (s, code) lookup joins broadcast the tiny
    // codebook/LUT tables (BroadcastHashJoin). The only nested-loop
    // joins allowed are the quantizer's corpus×anchors broadcast
    // crosses (tiny build side); a non-broadcast CartesianProduct
    // means an unkeyed corpus-scale product sneaked in.
    val p = plan("ann_pq")
    assert(!p.contains("CartesianProduct"), s"\n$p")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, s"\n$p")
  }

  test("dedup_embedding candidate join is keyed on the LSH bucket, not a constant") {
    val p = SparkEntry.queries("dedup_embedding")(spark, dir)
      .queryExecution.optimizedPlan.toString
    assert(p.contains("bucket"), s"\n$p")
  }

  import org.apache.spark.sql.execution.{SparkPlan, FileSourceScanExec,
    SortExec}
  import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
  import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
  import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
  import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec,
    CartesianProductExec, ShuffledHashJoinExec, SortMergeJoinExec}
  import org.apache.spark.sql.execution.window.WindowExec
  import org.apache.spark.sql.catalyst.plans.physical.{HashPartitioning,
    SinglePartition}

  /** Every node of the LIVE plan. `SparkPlan.collect` alone is
    * toothless here: `AdaptiveSparkPlanExec` is a LeafExecNode, so a
    * plain collect over an AQE-wrapped plan sees ONE node — this
    * descends through the wrapper (and nested ones), but NOT into
    * InMemoryRelation stored plans (cached subtrees are not live
    * work). */
  private def liveNodes(p: SparkPlan): Seq[SparkPlan] =
    p.collect { case n => n }.flatMap {
      case a: AdaptiveSparkPlanExec => a +: liveNodes(a.executedPlan)
      case n => Seq(n)
    }

  /** Every node INCLUDING cached subtrees, each distinct
    * InMemoryRelation stored plan visited once (a relation scanned
    * from several sites must not multiply its nodes' counts). */
  private def allNodes(p: SparkPlan): Seq[SparkPlan] = {
    val seen = scala.collection.mutable.Set.empty[Int]
    def go(p: SparkPlan): Seq[SparkPlan] =
      p.collect { case n => n }.flatMap {
        case a: AdaptiveSparkPlanExec => a +: go(a.executedPlan)
        case s: InMemoryTableScanExec =>
          val cp = s.relation.cachedPlan
          if (seen.add(System.identityHashCode(cp))) s +: go(cp) else Seq(s)
        case n => Seq(n)
      }
    go(p)
  }

  private def executed(name: String): SparkPlan =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan

  private def liveScans(name: String): Int =
    liveNodes(executed(name)).count(_.isInstanceOf[FileSourceScanExec])

  test("pipeline_curate does not multiply corpus scans across stages") {
    // the capstone's flag architecture: stages annotate ONE frame
    // instead of materializing per-stage corpus copies. The input is a
    // 3-way union (planted corpus), so one logical pass = 3 scans; the
    // near-drop side is the CACHED components fixpoint (zero live
    // scans), leaving the annotated frame's single pass — bounded at
    // 9 to allow a survivors re-derive. A per-stage-copy refactor
    // (5 stages × 3 scans each) would blow past this. Nonzero proves
    // the collector sees through the AQE wrapper.
    val n = liveScans("pipeline_curate")
    assert(n >= 1 && n <= 9, s"live scans = $n")
  }

  test("pipeline_curate packed path: flags stay broadcast, packing shuffles once per key") {
    val nodes = liveNodes(executed("pipeline_curate"))
    // the near-drop flag join must broadcast the (dim-sized) drop list
    // — a dropped broadcast would surface as a shuffled join here
    assert(nodes.exists(_.isInstanceOf[BroadcastHashJoinExec]))
    assert(!nodes.exists(_.isInstanceOf[SortMergeJoinExec]))
    assert(!nodes.exists(_.isInstanceOf[ShuffledHashJoinExec]))
    assert(!nodes.exists(_.isInstanceOf[CartesianProductExec]))
    // two live windows: the exact-dedup min-id window (content hash)
    // and the packing cumsum window (lang); each owns ONE hash
    // exchange, and nothing may gather to a single partition
    val hashEx = nodes.collect {
      case e: ShuffleExchangeExec if e.outputPartitioning.isInstanceOf[HashPartitioning] => e
    }
    assert(hashEx.size == 2, s"hash exchanges = ${hashEx.size}")
    assert(!nodes.exists {
      case e: ShuffleExchangeExec => e.outputPartitioning == SinglePartition
      case _ => false
    })
  }

  test("pipeline_records: dim joins broadcast, one precedence window ranks the cascade") {
    val nodes = allNodes(executed("pipeline_records"))
    // the financials join (live) and every cascade-side dim join must
    // be broadcast — the r3/r4 refactor hazard is a silent fall-back
    // to a shuffled join when `broadcast()` is dropped
    assert(nodes.count(_.isInstanceOf[BroadcastHashJoinExec]) >= 2,
      "expected the financials join + cascade dim joins as broadcasts")
    assert(!nodes.exists(_.isInstanceOf[SortMergeJoinExec]))
    assert(!nodes.exists(_.isInstanceOf[ShuffledHashJoinExec]))
    assert(!nodes.exists(_.isInstanceOf[CartesianProductExec]))
    // exactly ONE row_number window in the whole tree: the
    // existing/exact/fuzzy precedence ranking. A second one means a
    // stage started re-ranking on its own.
    val rowNumberWindows = nodes.collect {
      case w: WindowExec if w.windowExpression.toString.contains("row_number") => w
    }
    assert(rowNumberWindows.size == 1,
      s"precedence windows = ${rowNumberWindows.size}")
  }

  test("pipeline_curate_report is one aggregation over the annotated frame") {
    // five filtered re-counts would re-run the dedup chain per stage;
    // the report must stay a single-pass conditional aggregation
    // (one SinglePartition gather of partial aggs, stack after)
    val n = liveScans("pipeline_curate_report")
    assert(n >= 1 && n <= 9, s"live scans = $n")
    val nodes = liveNodes(executed("pipeline_curate_report"))
    val single = nodes.collect {
      case e: ShuffleExchangeExec if e.outputPartitioning == SinglePartition => e
    }
    assert(single.size <= 1, s"SinglePartition exchanges = ${single.size}")
  }

  test("decontaminate_semantic: benchmark side broadcast, one agg exchange only") {
    // the 100 TB claim: the corpus side streams map-side into the
    // per-vector agg — the ONLY exchange is the final groupBy; the
    // benchmark join must be a broadcast nested loop, never shuffled
    val p = plan("decontaminate_semantic")
    assert(p.contains("BroadcastNestedLoopJoin"), s"\n$p")
    assert(!p.contains("SortMergeJoin"), s"\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 1, s"\n$p")
  }

  test("text_bm25 top-10 is TakeOrderedAndProject, never a global sort") {
    val p = plan("text_bm25")
    assert(p.contains("TakeOrderedAndProject"), s"\n$p")
  }

  test("ann_knn_graph self-join is keyed on the bucket, never a cross product") {
    // both sides are corpus-sized: a cartesian here would be the
    // all-pairs blowup the bucketing exists to prevent. The only
    // nested-loop joins allowed are the two tiny plane broadcasts
    // inside lshBucket (one per join side). The candidate join must be
    // KEYED on the bucket; which keyed strategy the planner picks is
    // stats-driven — at this fixture's size the r16 row-local lshBucket
    // (no groupBy, so no "huge" stats) lets it broadcast one side,
    // which is the right call here and impossible at corpus scale
    // where the stats are corpus-sized again.
    val p = plan("ann_knn_graph")
    assert(!p.contains("CartesianProduct"), s"\n$p")
    assert("SortMergeJoin \\[bucket".r.findFirstIn(p).isDefined ||
      "ShuffledHashJoin \\[bucket".r.findFirstIn(p).isDefined ||
      "BroadcastHashJoin \\[bucket".r.findFirstIn(p).isDefined, s"\n$p")
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 2, s"\n$p")
  }

  test("filter_domains_scaled never broadcasts the blocklist") {
    // the multi-million-entry path: suffix-chain explode turns the
    // dot-anchored suffix match into a shuffled EQUI-join on the
    // suffix key — no broadcast exchange, no nested loop anywhere
    // (the small-list fast path filter_domains is the one that
    // broadcasts)
    val p = plan("filter_domains_scaled")
    assert(!p.contains("BroadcastExchange"), s"\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"\n$p")
    assert(!p.contains("CartesianProduct"), s"\n$p")
    assert("ShuffledHashJoin \\[suffix".r.findFirstIn(p).isDefined, s"\n$p")
  }

  test("attribution_last: one user-keyed shuffle feeds the window, no join") {
    // the per-user window formulation: a purchase×touch join would
    // shuffle twice and blow up on heavy users; the window carries one
    // running value. Exchanges: user_id hash for the window + the
    // channel rollup + the final 1-partition sort — never a join.
    val p = plan("attribution_last")
    assert(!p.contains("Join"), s"\n$p")
    assert("hashpartitioning\\(user_id".r.findAllIn(p).size >= 1, s"\n$p")
    assert("Window".r.findFirstIn(p).isDefined, s"\n$p")
  }

  test("bigram_pmi: map-side bigram formation, top-20 via TakeOrderedAndProject") {
    // bigrams come from a Generate over each doc's token array — a
    // positional token self-join would shuffle the exploded corpus
    // twice; margin joins happen on the vocab-sized aggregates only
    val p = plan("bigram_pmi")
    assert(p.contains("TakeOrderedAndProject"), s"\n$p")
    assert(!p.contains("CartesianProduct"), s"\n$p")
    // total + both margins re-aggregate the CUT pair table — the
    // corpus is scanned and exploded exactly once, INSIDE the cut (a
    // naive four-consumer formulation re-scans it per consumer —
    // measured 5.1 s); the final plan reads the materialized
    // vocab²-bounded table (so the map-side Generate lives in the
    // cut's job, not here), zero file scans downstream
    assert(liveNodes(executed("bigram_pmi"))
      .count(_.isInstanceOf[FileSourceScanExec]) == 0, s"\n$p")
  }

  test("winsorize broadcasts the percentile cuts back over the events scan") {
    val p = plan("winsorize")
    assert(p.contains("BroadcastHashJoin"), s"\n$p")
    assert(!p.contains("SortMergeJoin"), s"\n$p")
  }

  test("join_dpp: the fact scan carries a dynamic partition filter") {
    // DPP turns the dim's surviving keys into a runtime partition
    // filter on the year-partitioned fact — the scan must show a
    // dynamicpruning expression in PartitionFilters, or the query
    // read all seven years to serve one
    val p = plan("join_dpp")
    assert(p.contains("dynamicpruning"), s"\n$p")
  }

  test("q6_forecast_revenue: every predicate reaches the scan, no wide shuffle") {
    val p = plan("q6_forecast_revenue")
    assert(p.contains("PushedFilters"), s"\n$p")
    for (f <- Seq("l_shipdate", "l_discount", "l_quantity"))
      assert(("PushedFilters: \\[[^\\]]*" + f).r.findFirstIn(p).isDefined,
        s"$f not pushed\n$p")
    val hashEx = liveNodes(executed("q6_forecast_revenue")).collect {
      case e: ShuffleExchangeExec
        if e.outputPartitioning.isInstanceOf[HashPartitioning] => e
    }
    assert(hashEx.isEmpty, s"unexpected wide shuffle\n$p")
  }

  test("q5_local_supplier: fact never broadcasts, dims do, filters pushed") {
    val p = plan("q5_local_supplier")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 4, s"\n$p")
    assert(!p.contains("CartesianProduct"), s"\n$p")
    assert(p.contains("EqualTo(r_name,ASIA)"), s"region filter not pushed\n$p")
    // the lineitem scan (the fact) must not sit under a BroadcastExchange
    val nodes = liveNodes(executed("q5_local_supplier"))
    val factBroadcast = nodes.exists { n =>
      n.getClass.getSimpleName == "BroadcastExchangeExec" &&
        n.collectLeaves().exists {
          case f: FileSourceScanExec =>
            f.relation.location.rootPaths.exists(_.toString.contains("lineitem"))
          case _ => false
        }
    }
    assert(!factBroadcast, s"lineitem broadcast!\n$p")
  }

  test("q18_large_orders: one lineitem pass feeds the HAVING probe, top-100 via TakeOrdered") {
    val p = plan("q18_large_orders")
    assert(p.contains("TakeOrderedAndProject"), s"\n$p")
    assert(!p.contains("CartesianProduct"), s"\n$p")
    assert(liveNodes(executed("q18_large_orders")).count {
      case f: FileSourceScanExec =>
        f.relation.location.rootPaths.exists(_.toString.contains("lineitem"))
      case _ => false
    } == 1, s"lineitem scanned more than once\n$p")
  }

  test("text_repetition is map-side up to the presentation sort") {
    // the top-bigram count is a per-row array_sort + fold (longest
    // equal run), NOT an explode + groupBy — the only exchange the
    // plan may carry is the final orderBy's range partitioning. The
    // earlier explode shape shuffled every bigram string twice
    // (measured 3.0 s vs 0.48 s at sf0.1).
    val nodes = liveNodes(executed("text_repetition"))
    val hashEx = nodes.collect {
      case e: ShuffleExchangeExec
        if e.outputPartitioning.isInstanceOf[HashPartitioning] => e
    }
    assert(hashEx.isEmpty, s"hash exchanges = ${hashEx.size}")
    assert(!plan("text_repetition").contains("Generate"),
      "bigram explode resurfaced")
  }

  test("time_resample: the spine side is generated, counts join stays small") {
    // the only full-data pass is the (day, type) count agg; the spine
    // (|days|×|types|) never touches the events table again
    val p = plan("time_resample")
    assert(liveNodes(executed("time_resample"))
      .count(_.isInstanceOf[FileSourceScanExec]) <= 3, s"\n$p")
    assert(!p.contains("CartesianProduct"), s"\n$p")
  }

  test("q12_shipmode: pushed date range, one conditional aggregate, no Expand") {
    val p = plan("q12_shipmode")
    assert(
      "PushedFilters: \\[[^\\]]*(LessThan|GreaterThan)".r.findFirstIn(p).isDefined,
      s"\n$p")
    // high/low ride ONE aggregate — a pivot or per-priority join would
    // show as Expand or a second join
    assert(!p.contains("Expand"), s"\n$p")
    assert(!p.contains("CartesianProduct"), s"\n$p")
  }

  test("q14_promo: broadcast part dim, ZERO shuffles of the fact") {
    val p = plan("q14_promo")
    assert("BroadcastHashJoin".r.findAllIn(p).size == 1, s"\n$p")
    assert(!p.contains("SortMergeJoin"), s"\n$p")
    // promo + total share one scalar aggregate: no hash exchange at all
    assert("Exchange hashpartitioning".r.findAllIn(p).isEmpty, s"\n$p")
  }

  test("q16_parts_supplier: anti-join exclusion, broadcast part, no cross product") {
    val p = plan("q16_parts_supplier")
    assert(p.contains("LeftAnti"), s"\n$p")
    assert(!p.contains("CartesianProduct"), s"\n$p")
    assert(!p.contains("Expand"), s"\n$p") // single countDistinct fuses
  }

  test("interval_weighted_avg: one user-window sort, one agg shuffle, no join") {
    val p = plan("interval_weighted_avg")
    assert("Window".r.findAllIn(p).size == 1, s"\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 2, s"\n$p")
    assert(!p.contains("Join"), s"\n$p")
  }

  test("dedup_lines census is one join-free aggregation chain") {
    val p = plan("dedup_lines")
    assert(!p.contains("Join"), s"\n$p")
    // single countDistinct + count fuse without Expand
    assert(!p.contains("Expand"), s"\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 2, s"\n$p")
  }

  test("dedup_lines_apply picks first occurrences WITHOUT a window") {
    // the keep-first choice is a groupBy min(struct) — a row_number
    // window over the line hash would sort the hottest boilerplate
    // line's full posting list in one task
    val p = plan("dedup_lines_apply")
    assert(!p.contains("Window"), s"\n$p")
    assert(!p.contains("CartesianProduct"), s"\n$p")
  }

  test("hll_intersect: register math only — no fact join, no Expand") {
    val p = plan("hll_intersect")
    assert(!p.contains("SortMergeJoin"), s"\n$p")
    assert(!p.contains("Expand"), s"\n$p")
  }

  test("q7/q8/q9: every dim broadcasts, ONE fact-fact exchange, no cross product") {
    for (n <- Seq("q7_nation_volume", "q8_market_share", "q9_product_profit")) {
      val p = plan(n)
      assert(!p.contains("SortMergeJoin"), s"$n\n$p")
      assert(!p.contains("CartesianProduct"), s"$n\n$p")
      assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, s"$n\n$p")
    }
  }

  test("q11_important_stock: nation semi-filter + 1-row total broadcast") {
    val p = plan("q11_important_stock")
    assert(p.contains("LeftSemi"), s"\n$p")
    assert(!p.contains("CartesianProduct"), s"\n$p")
    // the scalar total rides a 1-row broadcast nested loop — the q22
    // shape, NOT a re-scan of the per-part aggregate
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 2, s"\n$p")
  }

  test("q13_order_distribution: left join + two stacked aggs, no Expand") {
    val p = plan("q13_order_distribution")
    assert(!p.contains("Expand"), s"\n$p")
    assert(!p.contains("CartesianProduct"), s"\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 2, s"\n$p")
  }

  test("q15/q17/q20: decorrelated scalar/avg/threshold — no per-row subquery re-scan") {
    for (n <- Seq("q15_top_supplier", "q17_small_quantity", "q20_excess_stock")) {
      val p = plan(n)
      assert(!p.contains("CartesianProduct"), s"$n\n$p")
      assert("Exchange hashpartitioning".r.findAllIn(p).size <= 3, s"$n\n$p")
    }
    assert(plan("q20_excess_stock").contains("LeftSemi"))
  }

  test("q2_min_cost_supplier: argmin via rank window, broadcast dims, top-20 TakeOrdered") {
    val p = plan("q2_min_cost_supplier")
    assert("BroadcastHashJoin".r.findAllIn(p).size == 2, s"\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"\n$p")
    assert(!p.contains("CartesianProduct"), s"\n$p")
    // unit-cost agg + per-part rank share the part shuffle; no third exchange
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 2, s"\n$p")
  }

  test("q4_order_priority: EXISTS decorrelates to one semi join, dates pushed") {
    val p = plan("q4_order_priority")
    assert(p.contains("LeftSemi"), s"\n$p")
    assert(
      "PushedFilters: \\[[^\\]]*(GreaterThan|LessThan)".r.findFirstIn(p).isDefined,
      s"\n$p")
    assert(!p.contains("CartesianProduct"), s"\n$p")
  }

  test("fill_linear: backward and forward sweeps share ONE user shuffle") {
    // the asof_nearest shape: the forward window re-sorts inside the
    // partition the backward window already established
    val p = plan("fill_linear")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, s"\n$p")
    assert(!p.contains("Join"), s"\n$p")
  }

  test("stats_ks: cumulative CDF windows run over the binned census, join-free") {
    val p = plan("stats_ks")
    assert(!p.contains("Join"), s"\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 2, s"\n$p")
  }

  test("asof_tolerance keeps the asof sweep's single-shuffle plan") {
    val p = plan("asof_tolerance")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, s"\n$p")
    assert("Window".r.findAllIn(p).size == 1, s"\n$p")
    assert(!p.contains("Join"), s"\n$p") // never a per-key theta probe
  }

  test("rolling_median: one key window with a bounded ROWS frame, no self-join") {
    val p = plan("rolling_median")
    assert("Window".r.findAllIn(p).size == 1, s"\n$p")
    assert(!p.contains("Join"), s"\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 2, s"\n$p")
  }

  test("join_null_bypass: null keys route around the single join via a union") {
    val p = plan("join_null_bypass")
    assert(p.contains("Union"), s"\n$p")
    assert("Join".r.findAllIn(p).size == 1, s"null rows must bypass, not join\n$p")
    assert(!p.contains("CartesianProduct"), s"\n$p")
  }

  test("q19_disjunctive: the derived OR range reaches the lineitem scan") {
    // Catalyst must extract the branch-independent quantity
    // disjunction from the OR-of-ANDs and push it below the join —
    // the difference between scanning 3 quantity bands and the table
    val p = plan("q19_disjunctive")
    assert("PushedFilters: \\[[^\\]]*Or\\(".r.findFirstIn(p).isDefined, s"\n$p")
    assert(!p.contains("CartesianProduct"), s"\n$p")
  }

  test("q21_suppliers_waiting: semi + anti on the order key, top-20 TakeOrdered") {
    val p = plan("q21_suppliers_waiting")
    assert(p.contains("LeftSemi"), s"\n$p")
    assert(p.contains("LeftAnti"), s"\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"\n$p")
    assert(!p.contains("CartesianProduct"), s"\n$p")
  }

  test("q22_global_sales: anti join + one-row average broadcast, date pushed") {
    val p = plan("q22_global_sales")
    assert(p.contains("LeftAnti"), s"\n$p")
    assert(
      "PushedFilters: \\[[^\\]]*GreaterThanOrEqual\\(o_orderdate".r
        .findFirstIn(p).isDefined, s"\n$p")
    assert(!p.contains("SortMergeJoin"), s"\n$p")
  }

  test("ann_ivfpq_stored: serve plan reloads the store, zero Lloyd iterations") {
    // the production topology's whole point: training (Lloyd mean
    // steps = the only avg aggregates in this family) happens once in
    // the persisted-store build; the SERVE plan must read the two
    // store artifacts as plain parquet scans and contain no avg —
    // a regression that re-trains in-query would surface it here
    val nodes = allNodes(executed("ann_ivfpq_stored"))
    val storeScans = nodes.collect {
      case f: FileSourceScanExec
        if f.relation.location.rootPaths.exists(
          _.toString.contains("ivfpq_quantizer")) => f
    }
    assert(storeScans.size >= 2, // anchors + codebooks
      s"store scans = ${storeScans.size}")
    val p = nodes.mkString("\n")
    assert(!p.contains("avg("), "serve plan contains a training aggregate")
    // the in-session twin is the documented contrast: it DOES train
    assert(allNodes(executed("ann_ivfpq")).mkString("\n").contains("avg("))
  }

  test("decontaminate_bloom_stored: serve plan scans the cache, zero bloom-build aggs") {
    // the store topology's point (round 11): the packed-bitmask build
    // (bit_or aggregation over benchmark grams) happens once in the
    // content-keyed DatasetCache build; the SERVE plan must read the
    // packed words as a plain parquet scan of the cache artifact and
    // contain no bit_or — a regression that rebuilds per query would
    // surface here
    val nodes = allNodes(executed("decontaminate_bloom_stored"))
    val storeScans = nodes.collect {
      case f: FileSourceScanExec
        if f.relation.location.rootPaths.exists(
          _.toString.contains("decontam_bloom")) => f
    }
    assert(storeScans.nonEmpty, "no cache-artifact scan in the serve plan")
    val p = nodes.mkString("\n")
    assert(!p.contains("bit_or("), "serve plan contains the bloom-build aggregate")
    // the in-session twin is the documented contrast: it DOES build
    assert(allNodes(executed("decontaminate_bloom")).mkString("\n")
      .contains("bit_or("))
  }

  test("interval_coverage: gaps-and-islands rides ONE user shuffle, no self-join") {
    // window (user key) → island groupBy (user+isle) → user groupBy
    // all share the user hash partitioning; an interval×interval
    // self-join formulation would show a join here
    val p = plan("interval_coverage")
    assert(!p.contains("Join"), s"\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, s"\n$p")
  }

  test("growth_accounting: one user-keyed window pass, horizon broadcasts") {
    // the distinct (user, week) frame shuffles ONCE on user_id; the
    // horizon is a broadcast 1-row cross — a per-week self-join
    // formulation would show a merge join here
    val p = plan("growth_accounting")
    assert(!p.contains("SortMergeJoin"), s"\n$p")
    assert(!p.contains("ShuffledHashJoin"), s"\n$p")
  }

  test("events_user_entropy: census + user window share one shuffle, no join") {
    val p = plan("events_user_entropy")
    assert(!p.contains("Join"), s"\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, s"\n$p")
  }

  test("interval_merge: same one-user-shuffle islands contract as coverage") {
    val p = plan("interval_merge")
    assert(!p.contains("Join"), s"\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, s"\n$p")
  }

  test("stats_levene: median broadcast back, no window, no merge join") {
    val p = plan("stats_levene")
    assert(!p.contains("SortMergeJoin"), s"\n$p")
    assert(!p.contains("ShuffledHashJoin"), s"\n$p")
    assert(!p.contains("Window"), s"\n$p")
  }

  test("survival_km: risk-set windows never shuffle a join; horizon broadcasts") {
    val p = plan("survival_km")
    assert(!p.contains("SortMergeJoin"), s"\n$p")
    // user agg + duration agg — the windows run on the ≤|durations| frame
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 2, s"\n$p")
  }

  test("stats_anova: one group shuffle, no Expand (exact DECIMAL moments)") {
    val p = plan("stats_anova")
    assert(!p.contains("Expand"), s"\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, s"\n$p")
  }

  test("forecast_holt: dims broadcast; the fold is in-group, no extra shuffle") {
    val p = plan("forecast_holt")
    assert(!p.contains("SortMergeJoin"), s"\n$p")
    assert("BroadcastHashJoin".r.findAllIn(p).size == 2, s"\n$p")
  }

  test("mm_flac_duration: pure map-side parse — no join, no aggregate") {
    val p = plan("mm_flac_duration")
    assert(!p.contains("Join"), s"\n$p")
    assert(!p.contains("HashAggregate"), s"\n$p")
  }

  test("stats_mannwhitney: rank machinery rides the value census, join-free") {
    // ranking collapses to the (type, 4dp-value) census — the ordered
    // cumsum runs over ≤|distinct values| rows, never the raw data
    val p = plan("stats_mannwhitney")
    assert(!p.contains("Join"), s"\n$p")
  }

  test("stats_chi2: full-grid joins are cell-sized broadcasts, never a sort-merge") {
    // round 11 (ADVICE r10): the contingency table is the FULL
    // types×arms grid — distinct types cross a broadcast 2-row arm
    // frame, observed counts left-joined with 0-coalesce. Every join
    // runs on the ≤|types×arms| cell frame (broadcast-class); the
    // event scan still reaches only the census groupBy, so no
    // data-sized side ever sorts for a merge join.
    val p = plan("stats_chi2")
    assert(!p.contains("SortMergeJoin"), s"\n$p")
    // the only nested-loop is the 2-row arm-frame cross
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 1, s"\n$p")
  }

  test("basket_rules: keyed equi-joins and a TakeOrdered podium, no theta join") {
    // the only nested-loop is the 1-row basket-count broadcast (the
    // scalar-frame cross, same shape as decontaminate_semantic)
    val p = plan("basket_rules")
    assert(!p.contains("CartesianProduct"), s"\n$p")
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 1, s"\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"\n$p")
  }

  test("text_feature_hash: explode + one combine-capable shuffle, no vocabulary join") {
    val p = plan("text_feature_hash")
    assert(!p.contains("Join"), s"\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, s"\n$p")
  }

  test("ab_cohens_d: one keyed aggregation — no join, no window") {
    val p = plan("ab_cohens_d")
    assert(!p.contains("Join"), s"\n$p")
    assert(!p.contains("Window"), s"\n$p")
  }

  test("ab_srm: one keyed aggregation — no join, no window") {
    val p = plan("ab_srm")
    assert(!p.contains("Join"), s"\n$p")
    assert(!p.contains("Window"), s"\n$p")
  }

  test("stats_proportion_z: one keyed aggregation — no join, no window") {
    val p = plan("stats_proportion_z")
    assert(!p.contains("Join"), s"\n$p")
    assert(!p.contains("Window"), s"\n$p")
  }

  test("corr_spearman: rank maps broadcast onto the cut joint census, no merge join") {
    // the lineitem scan ends at the joint (x,y,t) census cut; every
    // downstream join carries a ≤50-row broadcast rank map (2 per
    // pair leg × 3 legs) and the only windows are prefix sums over
    // those marginal censuses
    val p = plan("corr_spearman")
    assert(!p.contains("SortMergeJoin"), s"\n$p")
    assert("BroadcastHashJoin".r.findAllIn(p).size == 6, s"\n$p")
  }

  test("stats_kruskal: census-only windows, broadcast-only joins") {
    // the global rank prefix sum runs over the value-grid census
    // (range-bounded), and the only join is the broadcast 1-row tie
    // frame — never a merge join of data-sized sides
    val p = plan("stats_kruskal")
    assert(!p.contains("SortMergeJoin"), s"\n$p")
    assert(!p.contains("ShuffledHashJoin"), s"\n$p")
  }

  test("conv_wilson: one keyed aggregation — no join, no window") {
    val p = plan("conv_wilson")
    assert(!p.contains("Join"), s"\n$p")
    assert(!p.contains("Window"), s"\n$p")
  }

  test("acf_lags: windows over the daily census only, broadcast-only joins") {
    // the lag() chain runs over the ≤|calendar| daily frame and the
    // mean is a broadcast 1-row crossJoin — no data-sized merge join
    val p = plan("acf_lags")
    assert(!p.contains("SortMergeJoin"), s"\n$p")
    assert(!p.contains("ShuffledHashJoin"), s"\n$p")
  }

  test("calendar_gaps: no join anywhere — distinct days, one window, one agg") {
    val p = plan("calendar_gaps")
    assert(!p.contains("Join"), s"\n$p")
  }

  test("sketch_kll_stored: serve plan never scans lineitem (store-only)") {
    // build-once/serve-many: the quantile serve runs on the ~k-row
    // stored frames; a lineitem scan in the serve plan would mean the
    // sketch is being rebuilt per query
    val p = plan("sketch_kll_stored")
    assert(!p.contains("lineitem"), s"\n$p")
    assert(p.contains("FileScan parquet"), s"\n$p") // the store scans
  }

  test("ann_filtered_ivf: label PREPENDS to the cell key; no post-filter top-k") {
    // the candidate join must be keyed on BOTH label and cell (the
    // predicate enforced by routing), and no label filter may sit
    // above it — a top-k-then-drop post-filter would lose recall
    val p = plan("ann_filtered_ivf")
    assert("BroadcastHashJoin \\[label[^\\]]*, cell[^\\]]*\\]".r
      .findFirstIn(p).isDefined, s"\n$p")
    // the only label-mentioning Filters are the join-key null guards
    // below the join — never a label EQUALITY post-filter (the
    // top-k-then-drop shape this operator exists to avoid)
    assert(!"Filter [^\\n]*label#\\d+L? = label".r.findFirstIn(p).isDefined,
      s"\n$p")
    assert(!p.contains("CartesianProduct"), s"\n$p")
  }

  test("ann_ndcg: no shuffled cartesian — IVF leg cell-keyed, exact leg broadcast") {
    // same contract as ann_recall/ann_pq: the only nested-loop joins
    // are broadcast crosses with provably tiny build sides (8-query
    // eval set, anchors, the 1-row ideal-DCG frame)
    val p = plan("ann_ndcg")
    assert(!p.contains("CartesianProduct"), s"\n$p")
  }

  test("abc_parts: cumulative share rides the two-phase scan, no data-sized single task") {
    // the running sum over the data-sized parts dimension must NOT be
    // a global (empty-partition) window: Cumsum.globalRunning's data
    // window is pid-partitioned. The only SinglePartition stages are
    // partition-count-sized: the offsets prefix (≤shuffle-partitions
    // rows) and the 1-row grand-total agg — both sit above partial
    // aggregates, never above raw data
    val p = plan("abc_parts")
    assert(p.contains("windowspecdefinition(__pid"), s"\n$p")
    assert("Exchange SinglePartition".r.findAllIn(p).size <= 2, s"\n$p")
    assert("Exchange SinglePartition[^\\n]*\\n[^\\n]*HashAggregate"
      .r.findAllIn(p).size ==
      "Exchange SinglePartition".r.findAllIn(p).size, s"\n$p")
  }

  test("text_zipf: rank podium is TakeOrdered, window only over the top-1000") {
    // the vocab census must reach the rank stage through a
    // TakeOrderedAndProject limit, never a full-vocab global sort to
    // one task carrying the whole census
    val p = plan("text_zipf")
    assert(p.contains("TakeOrderedAndProject"), s"\n$p")
  }

  test("stats_bootstrap_ci: one map-side-combined agg — no join, no window") {
    // the Poisson bootstrap's whole point: B resamples as local
    // multiplicities, partial-aggregated before the exchange — only
    // |types|·B partial rows cross the wire
    val p = plan("stats_bootstrap_ci")
    assert(!p.contains("Join"), s"\n$p")
    assert(!p.contains("Window"), s"\n$p")
    assert(p.contains("partial_sum") || p.contains("HashAggregate"), s"\n$p")
  }

  test("emb_outliers: centroid and threshold broadcast back — no window, no merge join") {
    val p = plan("emb_outliers")
    assert(!p.contains("SortMergeJoin"), s"\n$p")
    assert(!p.contains("ShuffledHashJoin"), s"\n$p")
    assert(!p.contains("Window"), s"\n$p")
  }

  test("dau_mau_stickiness: rolling MAU is a bucket-partitioned window max over registers") {
    // the rolling 28-day distinct must NOT rescan or explode users —
    // it rides the densified (days × 64) register frame: a window max
    // partitioned by bucket, no cartesian anywhere
    val p = plan("dau_mau_stickiness")
    assert(!p.contains("CartesianProduct"), s"\n$p")
    assert("windowspecdefinition\\(b#".r.findFirstIn(p).isDefined, s"\n$p")
  }

  test("corr_kendall: census self-joins broadcast — never a data-sized pair join") {
    // the O(n²)-over-data statistic must ride the ≤550-cell census:
    // every join is a broadcast of a census/tie frame
    val p = plan("corr_kendall")
    assert(!p.contains("SortMergeJoin"), s"\n$p")
    assert(!p.contains("ShuffledHashJoin"), s"\n$p")
    assert(!p.contains("CartesianProduct"), s"\n$p")
  }

  test("item_cosine: podium on TopKPerKeyExec (partial+final), not a row_number window") {
    val p = plan("item_cosine")
    assert("TopKPerKey".r.findAllIn(p).size == 2, s"\n$p")
    assert(!p.contains("Window"), s"\n$p")
  }

  test("ann_opq: permutation is a broadcast 1-row cross join — no shuffled cartesian") {
    // vec_id-keyed SortMergeJoins are adcTopK's designed corpus-side
    // code joins (same as ann_pq); what must NOT appear is a shuffled
    // cartesian from the 1-row perm frame
    val p = plan("ann_opq")
    assert(!p.contains("CartesianProduct"), s"\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), s"\n$p")
  }

  test("winsorize_stored: serve path broadcast-joins stored cuts — zero percentile aggregate") {
    // the build runs at most once into the DatasetCache; what this
    // query EXECUTES per run must show the cuts read back from the
    // store (a second parquet scan) and no percentile anywhere
    val p = plan("winsorize_stored")
    assert(!p.toLowerCase.contains("percentile"), s"\n$p")
    assert(p.contains("BroadcastHashJoin"), s"\n$p")
    assert(!p.contains("SortMergeJoin"), s"\n$p")
    assert("FileScan parquet".r.findAllIn(p).size == 2, s"\n$p")
  }

  test("mm_phash_stored: serve scans the band-store artifact, no history decode") {
    // the image-dedup store topology (round 16): the history half's
    // hashes band-slice ONCE into the DatasetCache; the SERVE plan
    // must read (band, bv) back as a parquet scan of the artifact —
    // a regression that re-decodes history pixels per query would
    // lose the artifact scan and re-derive the store in-plan
    val nodes = allNodes(executed("mm_phash_stored"))
    val storeScans = nodes.collect {
      case f: FileSourceScanExec
        if f.relation.location.rootPaths.exists(
          _.toString.contains("phash_bandstore")) => f
    }
    assert(storeScans.nonEmpty, "no band-store artifact scan in the serve plan")
  }

  test("pref_pairs_topk: literal-K windows get the partial top-k, never a full sort") {
    // the production DPO shape: rank ≤ 16 per language pushes
    // WindowGroupLimit below the exchange — each task keeps ≤16 rows
    // per language, so no task sorts a language whole (the caveat
    // pref_pairs' dynamic n/4 bound cannot avoid)
    val p = plan("pref_pairs_topk")
    assert("WindowGroupLimit".r.findAllIn(p).size >= 2, s"\n$p")
  }

  test("unigram_stored: serve plan reads stored costs — zero EM work per run") {
    // the two-round hard-EM runs at most once into the DatasetCache;
    // what EXECUTES per run is one parquet scan (the stored cost
    // table, collapsed to a one-row sorted-vocab broadcast — r17: the
    // segmenter is a native per-word DP, so the old span-explode →
    // cost-join → groupBy(w) map rebuild is gone) over the
    // checkpointed census — the EM's seed/viterbi explode-aggregate
    // chains are absent
    val p = plan("unigram_stored")
    assert("FileScan parquet".r.findAllIn(p).size == 1, s"\n$p")
    // the vocab row arrives via exactly one nested-loop broadcast (a
    // 1-row build side); no other join, no per-word Generate
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size == 1, s"\n$p")
    assert(!p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin"), s"\n$p")
    assert(!p.contains("Generate"), s"\n$p")
  }

  test("ann_sq8_stored: serve plan reads stored bounds — zero stats aggregation") {
    // fresh ann_sq8 derives per-dim min/max via posexplode+aggregate
    // (a Generate node); the stored serve must show only parquet
    // scans (corpus + queries + the one-row bounds artifact, the
    // latter broadcast once per codes side = 4 scans total) and no
    // generator at all
    val p = plan("ann_sq8_stored")
    assert("FileScan parquet".r.findAllIn(p).size == 4, s"\n$p")
    assert(!p.contains("Generate"), s"\n$p")
    assert(!p.contains("HashAggregate"), s"\n$p")
  }

  test("pipeline_crawl: parse chain cut once, dedup is a groupBy-min — no text-keyed window") {
    // the scored frame is Materialize.cut before fan-out, so the final
    // plan reads the checkpointed frame (zero parquet scans here; the
    // build+parse corpus scan runs once at construction)
    val p = plan("pipeline_crawl")
    assert(!p.contains("FileScan parquet"), s"\n$p")
    assert(!p.contains("Window"), s"\n$p")
    assert(!p.contains("CartesianProduct"), s"\n$p")
  }

  test("quality_adaptive_stored: serve path broadcast-joins stored cuts — zero percentile aggregate") {
    // build runs at most once into the DatasetCache; the per-run plan
    // must read the |langs|-row cuts back (second parquet scan),
    // broadcast them over the documents scan, and aggregate — no
    // percentile, no shuffle join (VERDICT r12 #6)
    val p = plan("quality_adaptive_stored")
    assert(!p.toLowerCase.contains("percentile"), s"\n$p")
    assert(p.contains("BroadcastHashJoin"), s"\n$p")
    assert(!p.contains("SortMergeJoin"), s"\n$p")
    assert("FileScan parquet".r.findAllIn(p).size == 2, s"\n$p")
  }

  test("html_main_text: one corpus scan, row-local extraction — no join, no window") {
    // synthesis + block split + density filter are all per-row Column
    // work; anything else would mean the extractor shuffled text
    val p = plan("html_main_text")
    assert("FileScan parquet".r.findAllIn(p).size == 1, s"\n$p")
    assert(!p.contains("Join") && !p.contains("Window"), s"\n$p")
  }

  test("ann_graph_search: per-hop beams are checkpointed — final plan is presentation-only") {
    // graph build + hops run at construction (Materialize.cut per
    // hop, lineage linear in hops); what executes per run is the rank
    // over the final checkpointed beam — zero parquet scans, no
    // cartesian
    val p = plan("ann_graph_search")
    assert(!p.contains("FileScan parquet"), s"\n$p")
    assert(!p.contains("CartesianProduct"), s"\n$p")
  }

  test("quality_nb_apply: model rides one broadcast row — no shuffled join on the scored corpus") {
    // training censuses aggregate (shuffles are fine there); the
    // SCORING side must be the 1-row params broadcast folded per doc —
    // no SortMergeJoin, no shuffled cartesian anywhere
    val p = plan("quality_nb_apply")
    assert(!p.contains("SortMergeJoin"), s"\n$p")
    assert(!p.contains("CartesianProduct"), s"\n$p")
    assert(p.contains("BroadcastNestedLoopJoin"), s"\n$p")
  }

  test("lm_kn_score: model slices broadcast-hash join the bigram stream — corpus text never shuffles") {
    // the KN census/params build at construction (Materialize.cut);
    // scoring = explode → 3 broadcast-hash model joins → one
    // map-side-combined (doc, lang) aggregation. No sort-merge join:
    // the corpus side must never shuffle on a model key.
    val p = plan("lm_kn_score")
    assert(!p.contains("SortMergeJoin"), s"\n$p")
    assert(!p.contains("CartesianProduct"), s"\n$p")
    assert(p.contains("BroadcastHashJoin"), s"\n$p")
  }

  test("lm_kn_stored: serve reads stored params — artifact + corpus scans only, no census build") {
    // build path (bigram census + fol/pre joins) runs at most once
    // into the DatasetCache; the serve plan is one corpus scan + four
    // model-slice scans of the stored artifact (bi/bo/cont/unk), all
    // broadcast-hash joined — no sort-merge join anywhere
    val p = plan("lm_kn_stored")
    assert("FileScan parquet".r.findAllIn(p).size == 5, s"\n$p")
    assert(!p.contains("SortMergeJoin"), s"\n$p")
    assert(p.contains("BroadcastHashJoin"), s"\n$p")
  }

  test("quality_nb_stored: serve reads stored params — corpus + artifact scans only, no census build") {
    // the token-census explode+groupBy runs at most once into the
    // DatasetCache; the per-run plan is the documents scan + the
    // stored params scan (collapsed to one broadcast row), the scored
    // corpus riding a broadcast nested-loop — no shuffled join
    val p = plan("quality_nb_stored")
    assert("FileScan parquet".r.findAllIn(p).size == 2, s"\n$p")
    assert(!p.contains("SortMergeJoin"), s"\n$p")
    assert(p.contains("BroadcastNestedLoopJoin"), s"\n$p")
  }

  test("langid_nb_stored: serve reads stored params — zero training on serve") {
    // the quality_nb_stored gate for the langid family (VERDICT r14
    // #7): the per-run plan is the documents scan + the stored params
    // scan collapsed to one broadcast row — no trigram census
    // explode+groupBy, no shuffled join
    val p = plan("langid_nb_stored")
    assert("FileScan parquet".r.findAllIn(p).size == 2, s"\n$p")
    assert(!p.contains("SortMergeJoin"), s"\n$p")
    assert(p.contains("BroadcastNestedLoopJoin"), s"\n$p")
  }

  test("ann_hnsw_stored: hop plans walk stored edges — no graph build anywhere") {
    // the beam loop checkpoints per hop, so the FINAL plan reads
    // checkpointed beams (the pipeline_crawl gate class) — stored-ness
    // is gated where it is visible: the first-hop expansion plan must
    // scan the adj1 ARTIFACT parquet and carry zero graph
    // construction (no plane-bucket shiftleft aggregation)
    import org.apache.spark.sql.functions._
    val e = graft.Tables.embeddings(spark, dir)
    val corpus = e.filter(col("vec_id") >= 16)
      .select(col("vec_id"), col("embedding"))
    val store = graft.sources.DatasetCache.getOrBuild(
        dir, Seq("embeddings.parquet"), "hnsw_adj_k3_mod8") { path =>
      graft.operators.Ann.symAdj(corpus,
          e.filter(col("vec_id") < 6).select(col("vec_id"), col("embedding")),
          graphK = 3)
        .write.mode("overwrite").parquet(s"$path/adj0")
      graft.operators.Ann.symAdj(corpus.filter(col("vec_id") % 8 === 0),
          e.filter(col("vec_id") < 6).select(col("vec_id"), col("embedding")),
          graphK = 3)
        .write.mode("overwrite").parquet(s"$path/adj1")
    }
    val adj1 = spark.read.parquet(s"$store/adj1")
    val hop = e.filter(col("vec_id") >= 8 && col("vec_id") < 16)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        lit(16L).as("node"))
      .join(adj1, col("node") === col("src"))
    val p = hop.queryExecution.executedPlan.toString
    assert(p.contains("adj1"), s"\n$p")
    assert(!p.contains("shiftleft"), s"\n$p")
    // and the final serve plan carries no lingering scan or shuffle
    // join — everything data-sized was checkpointed at construction
    val fp = plan("ann_hnsw_stored")
    assert(!fp.contains("FileScan parquet"), s"\n$fp")
    assert(!fp.contains("SortMergeJoin"), s"\n$fp")
    assert(!fp.contains("shiftleft"), s"\n$fp")
  }

  test("dsir_select: weight map and threshold ride broadcast rows — no shuffled join on the corpus") {
    val p = plan("dsir_select")
    assert(!p.contains("SortMergeJoin"), s"\n$p")
    assert(!p.contains("CartesianProduct"), s"\n$p")
    assert(p.contains("BroadcastNestedLoopJoin"), s"\n$p")
  }

  test("simjoin_edit: prefix-filtered candidates, exact verify — no cartesian anywhere") {
    val p = plan("simjoin_edit")
    assert(!p.contains("CartesianProduct"), s"\n$p")
    assert(p.contains("levenshtein"), s"\n$p")
  }

  test("anomaly_mad_stored: serve path broadcast-joins stored bands — zero percentile aggregate") {
    val p = plan("anomaly_mad_stored")
    assert(!p.toLowerCase.contains("percentile"), s"\n$p")
    assert(p.contains("BroadcastHashJoin"), s"\n$p")
    assert(!p.contains("SortMergeJoin"), s"\n$p")
    assert("FileScan parquet".r.findAllIn(p).size == 2, s"\n$p")
  }

  test("ingest_warc: one corpus scan feeds the record parse — no join, no window") {
    // the archive build + parse + census is scan → flatMap → one
    // keyed aggregation; any join or second scan would mean the
    // parser round-tripped something it shouldn't
    val p = plan("ingest_warc")
    assert("FileScan parquet".r.findAllIn(p).size == 1, s"\n$p")
    assert(!p.contains("Join") && !p.contains("Window"), s"\n$p")
  }

  test("unigram_train: EM runs at construction over the census — final plan is presentation-only") {
    // the trainer's EM rounds fold over Materialize.cut census/cost
    // frames (LogicalRDD); the query's own plan must show NO corpus
    // scan and only the presentation sort
    val p = plan("unigram_train")
    assert(!p.contains("FileScan parquet"), s"\n$p")
    assert("\\bSort \\[".r.findAllIn(p).size == 1, s"\n$p")
  }

  test("unigram_apply: piece costs broadcast onto the census — no corpus rescan, no merge join") {
    // r17: the segment DP is a native expression against a one-row
    // sorted-vocab broadcast — the whole apply is scan → nested-loop
    // broadcast → project → sort; the span explode (Generate), the
    // cost hash join and the per-word groupBy(w) Exchange are gone
    val p = plan("unigram_apply")
    assert(!p.contains("FileScan parquet"), s"\n$p")
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size == 1, s"\n$p")
    assert(!p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin"), s"\n$p")
    assert(!p.contains("Generate"), s"\n$p")
  }
}
