package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.PRound

import graft.functions.VectorFns

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * - `bruteForceTopK`: exact baseline — broadcast the (small) query
  *   set against the corpus; one pass, no corpus shuffle. Cosine is
  *   rounded before ranking so ordering is reproducible across
  *   engines.
  * - `ivfTopK`: the scale path — corpus and queries are assigned to
  *   the nearest of a deterministic anchor set (IVF coarse
  *   quantizer): either caller-provided anchors or [[kmeansAnchors]]
  *   (seeded Lloyd iterations). Search only touches the query's cell,
  *   so per-query cost drops by ~|cells|; recall < 1 by construction —
  *   [[ivfTopKNprobe]] trades probes for recall.
  */
object Ann {

  private def ranked(pairs: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    pairs.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
  }

  /** Two-stage serving re-rank — the standard production ANN
    * topology: a cheap compressed index (ADC/IVF-PQ/LSH) nominates
    * top-C candidates, then the TRUE vectors of just those C are
    * fetched and exactly re-scored for the final top-k (k ≤ C).
    * Recall can only improve over the compressed ranking: the exact
    * pass never evicts a true neighbor the candidate stage kept, it
    * only reorders (RetrievalSpec pins rerank ≥ ADC at equal k).
    *
    * Scale shape: `cands` is |Q|·C rows — broadcast; the corpus-sided
    * candidate fetch is a broadcast semi-style join, so the corpus
    * NEVER shuffles and only C vectors per query cross the wire;
    * query vectors ride a second broadcast. Output (query_id, rk,
    * vec_id, cosine) — same schema as [[bruteForceTopK]]. */
  def rerankTopK(cands: DataFrame, corpus: DataFrame, queries: DataFrame,
                 k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val pairs = corpus.select(col("vec_id"), col("embedding").as("cv"))
      .join(broadcast(cands.select(col("query_id"), col("vec_id"))), Seq("vec_id"))
      .join(broadcast(q), Seq("query_id"))
      .withColumn("cosine", PRound.pround(VectorFns.cosine(col("qv"), col("cv")), 6))
      .select(col("query_id"), col("vec_id"), col("cosine"))
    ranked(pairs, k).select(col("query_id"), col("rk"), col("vec_id"), col("cosine"))
  }

  /** FILTERED vector search — top-k restricted to corpus rows whose
    * `filterCol` equals the query's own: the metadata-constrained
    * serving shape ("nearest docs in MY language/tenant/category")
    * every production vector store grows. The predicate IS the join
    * key — an equi-join on `filterCol` replaces the cross join, so
    * pair expansion is bounded by the matching stratum, never the
    * corpus (pre-filtering, not the recall-losing post-filter of a
    * top-k-then-drop pipeline). At IVF scale the same key prepends to
    * the cell key. Output shaped like [[bruteForceTopK]]. */
  def filteredTopK(corpus: DataFrame, queries: DataFrame, filterCol: String,
                   k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col(filterCol),
      col("embedding").as("qv"))
    val c = corpus.select(col("vec_id"), col(filterCol), col("embedding").as("cv"))
    val pairs = c.join(broadcast(q), Seq(filterCol))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cosine", PRound.pround(VectorFns.cosine(col("qv"), col("cv")), 6))
      .select(col("query_id"), col("vec_id"), col("cosine"))
    ranked(pairs, k).select(col("query_id"), col("rk"), col("vec_id"), col("cosine"))
  }

  /** Exact top-k: (query_id, rk, vec_id, cosine). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val c = corpus.select(col("vec_id"), col("embedding").as("cv"))
    val pairs = c.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cosine", PRound.pround(VectorFns.cosine(col("qv"), col("cv")), 6))
      .select(col("query_id"), col("vec_id"), col("cosine"))
    ranked(pairs, k).select(col("query_id"), col("rk"), col("vec_id"), col("cosine"))
  }

  /** Deterministic seeded k-means coarse quantizer (Lloyd iterations)
    * for IVF: seeds are the k lowest-id vectors; assignment is argmax
    * of the 6-dp-rounded cosine (ties to the smaller anchor id); new
    * centroids are element-wise means rounded to 6 dp — every
    * iteration's fixed point is therefore reproducible in any engine
    * (the DuckDB oracle re-runs the identical iterations). Returns
    * (vec_id = cell id, embedding) shaped like any anchor set; cells
    * that lose all members drop out.
    *
    * Scale shape: one corpus×k broadcast scan plus one (cell, dim)
    * aggregation per iteration — no shuffle wider than k×dim rows.
    */
  def kmeansAnchors(vectors: DataFrame, k: Int, iters: Int): DataFrame = {
    val v = vectors.select(col("vec_id"), col("embedding"))
    var anchors = v.orderBy(col("vec_id")).limit(k)
    for (_ <- 1 to iters) {
      anchors = assignCells(v, anchors)
        .select(col("cell"), posexplode(col("embedding")).as(Seq("dim", "x")))
        .groupBy(col("cell"), col("dim"))
        .agg(PRound.pround(avg(col("x").cast("double")), 6).as("m"))
        .groupBy(col("cell"))
        .agg(sort_array(collect_list(struct(col("dim"), col("m")))).as("dm"))
        .select(col("cell").as("vec_id"),
          transform(col("dm"), s => s.getField("m")).as("embedding"))
    }
    anchors
  }

  /** Nearest-anchor cell id for every vector in `df`.
    *
    * Argmax over anchors is a map-side-combinable `max(struct(score,
    * -anchor_id))` aggregate — not a window, which would sort the
    * whole corpus×anchors product at 100 TB. Tie-break: highest score,
    * then smallest anchor id (the struct's second field is negated).
    */
  def assignCells(df: DataFrame, anchors: DataFrame): DataFrame = {
    // ROW-LOCAL argmax over a broadcast 1-row anchor array (r16, guide
    // §2.4): the previous shape cross-joined the broadcast anchors and
    // re-aggregated with groupBy(ALL input columns) — a corpus-wide
    // Exchange carrying the embeddings (and at 100 TB a full corpus
    // shuffle keyed on the vectors themselves). array_max over the
    // same (acos, -anchor_id) structs is the identical max(struct)
    // total order — same 6-dp rounded cosine, same smaller-id
    // tie-break — with zero shuffle.
    val arow = anchors.agg(sort_array(collect_list(struct(
      col("vec_id").as("anchor_id"), col("embedding").as("av")))).as("__anchors"))
    df.crossJoin(broadcast(arow))
      .withColumn("cell", -array_max(transform(col("__anchors"), a =>
        struct(
          PRound.pround(
            VectorFns.cosine(col("embedding"), a.getField("av")), 6).as("acos"),
          (-a.getField("anchor_id")).as("na")))).getField("na"))
      .drop("__anchors")
  }

  /** Hyperplane-sign LSH bucket id: bit i is set when dot(v, plane_i)
    * > 0. With deterministic planes (e.g. held-out corpus vectors),
    * the bucket assignment is reproducible across engines. */
  def lshBucket(df: DataFrame, planes: DataFrame): DataFrame = {
    // ROW-LOCAL sign fold over a broadcast 1-row plane array (r16; the
    // assignCells rationale): the previous crossJoin + groupBy(ALL
    // input columns) + sum(bit) shuffled the whole corpus keyed on the
    // embeddings. The fold adds the identical shiftleft bits (exact
    // integers — order-free), zero shuffle.
    import org.apache.spark.sql.GraftBridge.{column, expression}
    def shl(n: Column): Column = column(
      org.apache.spark.sql.catalyst.expressions.ShiftLeft(
        expression(lit(1L)), expression(n)))
    val prow = planes.agg(sort_array(collect_list(struct(
      col("vec_id").as("plane_id"), col("embedding").as("pv")))).as("__planes"))
    df.crossJoin(broadcast(prow))
      .withColumn("bucket", aggregate(col("__planes"), lit(0L), (acc, p) =>
        acc + when(VectorFns.dot(col("embedding"), p.getField("pv")) > 0,
          shl(p.getField("plane_id").cast("int")))
          .otherwise(lit(0L))).cast("int"))
      .drop("__planes")
  }

  /** LSH-bucketed ANN: candidates share the query's sign-bucket; exact
    * cosine top-k inside the bucket. Recall < 1 (single probe), like
    * any LSH with one table; scale path is bucket-keyed. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, planes: DataFrame, k: Int): DataFrame = {
    val c = lshBucket(corpus, planes)
      .select(col("bucket"), col("vec_id"), col("embedding").as("cv"))
    val q = lshBucket(queries, planes)
      .select(col("bucket"), col("vec_id").as("query_id"), col("embedding").as("qv"))
    val pairs = c.join(broadcast(q), Seq("bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cosine", PRound.pround(VectorFns.cosine(col("qv"), col("cv")), 6))
      .select(col("query_id"), col("vec_id"), col("cosine"))
    ranked(pairs, k).select(col("query_id"), col("rk"), col("vec_id"), col("cosine"))
  }

  /** LSH-bucketed k-NN GRAPH over the corpus itself — [[lshTopK]] with
    * queries == corpus: every vector's top-k same-bucket neighbors by
    * exact cosine. The graph is what SemDeDup-style clustering and
    * graph dedup consume. The candidate join is a SELF-join keyed on
    * the bucket (never broadcast — both sides are the corpus), so
    * pair expansion is bounded by bucket population; the plane count
    * is the dial (each plane roughly halves buckets). Vectors whose
    * bucket holds no neighbor emit no edges, matching the single-probe
    * recall contract of the LSH family. */
  def knnGraph(corpus: DataFrame, planes: DataFrame, k: Int): DataFrame = {
    val b = lshBucket(corpus, planes)
    val l = b.select(col("bucket"), col("vec_id").as("query_id"),
      col("embedding").as("qv"))
    val r = b.select(col("bucket"), col("vec_id"), col("embedding").as("cv"))
    val pairs = l.join(r, Seq("bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cosine", PRound.pround(VectorFns.cosine(col("qv"), col("cv")), 6))
      .select(col("query_id"), col("vec_id"), col("cosine"))
    ranked(pairs, k)
      .select(col("query_id").as("vec_id"), col("rk"),
        col("vec_id").as("nbr_id"), col("cosine"))
  }

  /** Hard-negative mining for retrieval/embedding training: per query
    * vector, the top-k nearest corpus vectors carrying a DIFFERENT
    * label — the "close but wrong" examples contrastive training
    * needs (same-label neighbors are positives; random negatives are
    * too easy to teach anything). Composition of the existing
    * machinery (VERDICT r10 #5): [[lshBucket]] keys the candidate
    * join exactly as in [[knnGraph]], and the label-DIFFERENCE
    * predicate rides the join filter — the inverse of
    * [[filteredTopK]]'s label equality. Scale shape: bucket-keyed
    * candidate join (never corpus×queries), exact cosine only inside
    * the bucket; single-probe recall < 1 by construction, gated by
    * the exact sweep ([[hardNegativesExact]]). Output shaped like
    * [[bruteForceTopK]]. */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, planes: DataFrame,
                    labelCol: String, k: Int): DataFrame = {
    val c = lshBucket(corpus.select(col("vec_id"), col(labelCol), col("embedding")), planes)
      .select(col("bucket"), col("vec_id"), col(labelCol).as("__cl"),
        col("embedding").as("cv"))
    val q = lshBucket(queries.select(col("vec_id"), col(labelCol), col("embedding")), planes)
      .select(col("bucket"), col("vec_id").as("query_id"),
        col(labelCol).as("__ql"), col("embedding").as("qv"))
    val pairs = c.join(broadcast(q), Seq("bucket"))
      .filter(col("vec_id") =!= col("query_id") && col("__cl") =!= col("__ql"))
      .withColumn("cosine", PRound.pround(VectorFns.cosine(col("qv"), col("cv")), 6))
      .select(col("query_id"), col("vec_id"), col("cosine"))
    ranked(pairs, k).select(col("query_id"), col("rk"), col("vec_id"), col("cosine"))
  }

  /** Exact hard-negative sweep — [[bruteForceTopK]] restricted to
    * different-label pairs: the ground truth [[hardNegatives]]'s
    * recall gate compares against (run over a sampled query set at
    * corpus scale, exactly like the other exact baselines). */
  def hardNegativesExact(corpus: DataFrame, queries: DataFrame,
                         labelCol: String, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"),
      col(labelCol).as("__ql"), col("embedding").as("qv"))
    val c = corpus.select(col("vec_id"), col(labelCol).as("__cl"),
      col("embedding").as("cv"))
    val pairs = c.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id") && col("__cl") =!= col("__ql"))
      .withColumn("cosine", PRound.pround(VectorFns.cosine(col("qv"), col("cv")), 6))
      .select(col("query_id"), col("vec_id"), col("cosine"))
    ranked(pairs, k).select(col("query_id"), col("rk"), col("vec_id"), col("cosine"))
  }

  /** Top-`nprobe` nearest-anchor cells per vector — the multi-probe
    * assignment. Runs on the custom TopKPerKey operator (bounded
    * heaps), not a window, so the corpus×anchors product is pruned
    * map-side. One output row per (vector, probed cell). */
  def assignCellsMulti(df: DataFrame, anchors: DataFrame, nprobe: Int): DataFrame = {
    val a = anchors.select(col("vec_id").as("anchor_id"), col("embedding").as("av"))
    val scored = df.crossJoin(broadcast(a))
      .withColumn("acos", PRound.pround(VectorFns.cosine(col("embedding"), col("av")), 6))
    TopK.perKey(scored, Seq("vec_id"), "acos", "anchor_id", nprobe)
      .select(df.columns.toIndexedSeq.map(col) :+ col("anchor_id").as("cell"): _*)
  }

  /** IVF top-k with nprobe probes per query: the query searches its
    * `nprobe` nearest cells (corpus vectors still live in exactly one
    * cell, so candidates stay unique). nprobe=2 roughly halves the
    * recall loss of single-probe IVF for ~2× probe cost. */
  def ivfTopKNprobe(corpus: DataFrame, queries: DataFrame, anchors: DataFrame,
                    k: Int, nprobe: Int): DataFrame = {
    val c = assignCells(corpus, anchors)
      .select(col("cell"), col("vec_id"), col("embedding").as("cv"))
    val q = assignCellsMulti(queries, anchors, nprobe)
      .select(col("cell"), col("vec_id").as("query_id"), col("embedding").as("qv"))
    val pairs = c.join(broadcast(q), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cosine", PRound.pround(VectorFns.cosine(col("qv"), col("cv")), 6))
      .select(col("query_id"), col("vec_id"), col("cosine"))
    ranked(pairs, k).select(col("query_id"), col("rk"), col("vec_id"), col("cosine"))
  }

  /** Radius (range) search: ALL corpus vectors within cosine ≥
    * `minCos` of each query, searched through the query's `nprobe`
    * nearest IVF cells — the "find everything at least this similar"
    * serving shape (dedup sweeps, policy matching, near-match audits)
    * where top-k's fixed k under- or over-fetches per query. Same
    * cell-keyed candidate join as [[ivfTopKNprobe]] (never
    * all-pairs); the threshold filter runs INSIDE the join projection
    * so only qualifying rows survive the exchange. Result size is
    * data-dependent — downstream treats it as a set, not a podium. */
  def rangeSearch(corpus: DataFrame, queries: DataFrame, anchors: DataFrame,
                  minCos: Double, nprobe: Int): DataFrame = {
    val c = assignCells(corpus, anchors)
      .select(col("cell"), col("vec_id"), col("embedding").as("cv"))
    val q = assignCellsMulti(queries, anchors, nprobe)
      .select(col("cell"), col("vec_id").as("query_id"), col("embedding").as("qv"))
    c.join(broadcast(q), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cosine", PRound.pround(VectorFns.cosine(col("qv"), col("cv")), 6))
      .filter(col("cosine") >= minCos)
      .select(col("query_id"), col("vec_id"), col("cosine"))
  }

  /** IVF top-k over a PRE-ROUTED postings frame — the serving shape of
    * an incrementally-maintained index: `assigned` already carries
    * (vec_id, embedding, cell) rows (a persisted index union a freshly
    * routed delta batch), so search never re-routes the corpus. Only
    * the queries are assigned here; the candidate join stays keyed on
    * the cell. */
  def ivfTopKAssigned(assigned: DataFrame, queries: DataFrame,
                      anchors: DataFrame, k: Int): DataFrame = {
    val c = assigned.select(col("cell"), col("vec_id"), col("embedding").as("cv"))
    val q = assignCells(queries, anchors)
      .select(col("cell"), col("vec_id").as("query_id"), col("embedding").as("qv"))
    val pairs = c.join(broadcast(q), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cosine", PRound.pround(VectorFns.cosine(col("qv"), col("cv")), 6))
      .select(col("query_id"), col("vec_id"), col("cosine"))
    ranked(pairs, k).select(col("query_id"), col("rk"), col("vec_id"), col("cosine"))
  }

  /** LABEL-AWARE IVF top-k (round 14, VERDICT r13 #5 — the promise in
    * [[filteredTopK]]'s scaladoc made real): at IVF scale the metadata
    * key PREPENDS to the cell key — candidates join on
    * (filterCol, cell), so the predicate is enforced by ROUTING, never
    * by the recall-losing top-k-then-drop post-filter (the plan
    * carries no label filter above the candidate join and no
    * post-rank filter at all — PlanShapeSpec gates it). Cells come
    * from the SHARED label-blind geometry (one anchor set serves every
    * tenant); the composite key also keeps per-tenant postings
    * colocated in a partitioned index at scale. Output shaped like
    * [[ivfTopK]]. */
  def filteredIvfTopK(corpus: DataFrame, queries: DataFrame,
                      anchors: DataFrame, filterCol: String,
                      k: Int): DataFrame = {
    val c = assignCells(corpus, anchors)
      .select(col(filterCol), col("cell"), col("vec_id"),
        col("embedding").as("cv"))
    val q = assignCells(queries, anchors)
      .select(col(filterCol), col("cell"), col("vec_id").as("query_id"),
        col("embedding").as("qv"))
    val pairs = c.join(broadcast(q), Seq(filterCol, "cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cosine",
        PRound.pround(VectorFns.cosine(col("qv"), col("cv")), 6))
      .select(col("query_id"), col("vec_id"), col("cosine"))
    ranked(pairs, k)
      .select(col("query_id"), col("rk"), col("vec_id"), col("cosine"))
  }

  /** IVF top-k with nprobe=1: (query_id, rk, vec_id, cosine). */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, anchors: DataFrame, k: Int): DataFrame = {
    val c = assignCells(corpus, anchors)
      .select(col("cell"), col("vec_id"), col("embedding").as("cv"))
    val q = assignCells(queries, anchors)
      .select(col("cell"), col("vec_id").as("query_id"), col("embedding").as("qv"))
    val pairs = c.join(broadcast(q), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cosine", PRound.pround(VectorFns.cosine(col("qv"), col("cv")), 6))
      .select(col("query_id"), col("vec_id"), col("cosine"))
    ranked(pairs, k).select(col("query_id"), col("rk"), col("vec_id"), col("cosine"))
  }

  /** Deterministic BEAM SEARCH over the symmetrized [[knnGraph]] — the
    * graph-ANN serving shape (HNSW/NSW's navigation layer, flattened
    * to one level so every step is engine-replayable; VERDICT r12 #4).
    *
    * The graph builds once ([[knnGraph]], then edges are symmetrized
    * NSW-style so search can back out of a directed dead end) and is
    * checkpointed; search then runs a FIXED `hops` rounds of
    * set-at-a-time expansion: the beam (per query, the best `beam`
    * nodes seen so far) pulls its neighbors, scores them, and the
    * union re-ranks — a batch best-first search where the beam IS the
    * priority queue. Scores are INTEGER micro-cosines
    * (round(cos·10⁶) as BIGINT), so ranking ties break identically in
    * any engine (node id ascending as the final key).
    *
    * Scale shape: the beam is |queries|·beam rows — broadcast-sized by
    * the same contract as every query side here — so each hop is one
    * broadcast join against the corpus-sized adjacency plus one
    * broadcast join against the corpus embeddings for scoring; the
    * corpus never shuffles and the per-hop beam is Materialize.cut so
    * lineage stays linear in `hops` (the incremental-near-dedup
    * survivor-checkpoint lesson). Entry points are the `entries`
    * lowest corpus ids — fixed and replayable, the role HNSW's top
    * layer plays. Recall < 1 by construction (graph connectivity +
    * beam width bound it); gate with the exact sweep. */
  def graphSearch(corpus: DataFrame, queries: DataFrame, planes: DataFrame,
                  graphK: Int, entries: Int, beam: Int, hops: Int,
                  k: Int): DataFrame = {
    val adj = symAdj(corpus, planes, graphK)
    val cve = corpus.select(col("vec_id").as("node"), col("embedding").as("cv"))
    val entry = cve.orderBy(col("node")).limit(entries)
    val q = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("qv"))
    val init = Materialize.cut(topBeam(
      q.crossJoin(broadcast(entry))
        .select(col("query_id"), col("qv"), col("node"), microCos), beam))
    finishTopK(beamLoop(init, adj, cve, beam, hops), k)
  }

  /** Layered graph-ANN serving — the HNSW shape with its hierarchy
    * kept (vs [[graphSearch]]'s single flattened layer): an UPPER
    * layer of hash-sampled nodes (`vec_id % layerMod == 0` — the
    * deterministic stand-in for HNSW's geometric level draw) carries
    * its own kNN graph; search walks the upper layer first from fixed
    * global entry points, then hands each query's best upper nodes to
    * the base layer as PER-QUERY entry points — the coarse-to-fine
    * navigation that saves base-layer hops on a big corpus. Both
    * layers run the same deterministic set-at-a-time beam
    * ([[beamLoop]]): integer micro-cosine keys, per-hop
    * Materialize.cut, the beam always the broadcast side. Upper-layer
    * scores ARE base-layer scores (same embeddings), so the handoff
    * re-scores nothing. Recall < 1 by construction; gate with the
    * exact sweep. */
  def hnswSearch(corpus: DataFrame, queries: DataFrame, planes: DataFrame,
                 graphK: Int, layerMod: Int, entries: Int, beam: Int,
                 hopsUpper: Int, hopsBase: Int, k: Int): DataFrame = {
    val upper = corpus.filter(col("vec_id") % layerMod === 0)
    hnswServe(corpus, queries,
      adjUpper = symAdj(upper, planes, graphK),
      adjBase = symAdj(corpus, planes, graphK),
      layerMod = layerMod, entries = entries, beam = beam,
      hopsUpper = hopsUpper, hopsBase = hopsBase, k = k)
  }

  /** The SERVE half of [[hnswSearch]]: both layers' adjacencies arrive
    * pre-built (e.g. read back from a store artifact — graphs build
    * offline, search runs online), so the per-run plan carries ZERO
    * graph construction: no LSH bucketing, no kNN self-join — just
    * the beam walk against the stored edges. */
  def hnswServe(corpus: DataFrame, queries: DataFrame,
                adjUpper: DataFrame, adjBase: DataFrame, layerMod: Int,
                entries: Int, beam: Int, hopsUpper: Int, hopsBase: Int,
                k: Int): DataFrame = {
    val upper = corpus.filter(col("vec_id") % layerMod === 0)
    val cve1 = upper.select(col("vec_id").as("node"), col("embedding").as("cv"))
    val cve0 = corpus.select(col("vec_id").as("node"), col("embedding").as("cv"))
    val q = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("qv"))
    val entry1 = cve1.orderBy(col("node")).limit(entries)
    val init1 = Materialize.cut(topBeam(
      q.crossJoin(broadcast(entry1))
        .select(col("query_id"), col("qv"), col("node"), microCos), beam))
    val upperOut = beamLoop(init1, adjUpper, cve1, beam, hopsUpper)
    // handoff: each query's best `entries` upper nodes enter the base
    // layer (scores carry over — same embedding space)
    val init0 = Materialize.cut(topBeam(upperOut, entries))
    finishTopK(beamLoop(init0, adjBase, cve0, beam, hopsBase), k)
  }

  /** Symmetrized kNN-graph adjacency (src, dst) — NSW-style, so search
    * can back out of a directed dead end; checkpointed once. Public:
    * the stored-graph serving path persists exactly this frame. */
  def symAdj(corpus: DataFrame, planes: DataFrame,
             graphK: Int): DataFrame = {
    val g = knnGraph(corpus, planes, graphK)
      .select(col("vec_id").as("src"), col("nbr_id").as("dst"))
    Materialize.cut(
      g.unionByName(g.select(col("dst").as("src"), col("src").as("dst")))
        .distinct())
  }

  /** round(cos(qv, cv)·10⁶) as BIGINT — the engine-exact ranking key. */
  private def microCos: Column =
    PRound.pround(VectorFns.cosine(col("qv"), col("cv")) * 1e6, 0)
      .cast("long").as("s")

  private def topBeam(all: DataFrame, beam: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("s").desc, col("node"))
    all.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= beam).drop("__rk")
  }

  /** `hops` rounds of set-at-a-time best-first expansion from `init`
    * (query_id, qv, node, s): the beam pulls its neighbors, scores
    * them, the union re-ranks. Beam and candidate sets are
    * |queries|·beam(·graphK) rows — ALWAYS the broadcast side;
    * adjacency and embeddings scan in place, shuffle-free; the
    * per-hop beam is Materialize.cut so lineage stays linear in
    * `hops`. */
  private def beamLoop(init: DataFrame, adj: DataFrame, cve: DataFrame,
                       beam: Int, hops: Int): DataFrame = {
    var bm = init
    for (_ <- 1 to hops) {
      val cand = broadcast(bm.select(col("query_id"), col("qv"), col("node")))
        .join(adj, col("node") === col("src"))
        .select(col("query_id"), col("qv"), col("dst").as("node"))
        .distinct()
      val exp = broadcast(cand).join(cve, Seq("node"))
        .select(col("query_id"), col("qv"), col("node"), microCos)
      bm = Materialize.cut(topBeam(bm.unionByName(exp).distinct(), beam))
    }
    bm
  }

  private def finishTopK(bm: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("s").desc, col("node"))
    bm.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("node").as("vec_id"),
        (col("s") / lit(1e6)).as("cosine"))
  }

  /** Scalar-quantized (SQ8) search — the THIRD compression family
    * next to PQ/OPQ (FAISS's SQ8 index): every dimension is quantized
    * independently to an 8-bit code against per-dim corpus min/max,
    * 4× compression with no codebook training at all, and search is
    * integer L2 in code space. Engine-exact end to end: values are
    * 6-dp micro-units (the PQ rounding contract), per-dim min/max are
    * integer aggregates, the code is floor of ONE IEEE division of
    * exactly-representable integers (≤5.1e8 / ≤4e6 — the
    * quality_nb_calibrate "floor of an exact IEEE division" rule, so
    * both engines compute identical bits; query codes CLAMP to
    * [0,255]), and the distance is a BIGINT sum — no float ranking
    * anywhere.
    *
    * Scale shape: the stats frame is |dims| rows (one map-side
    * combined agg) collapsed to ONE row of (mns, mxs) arrays that
    * rides a broadcast onto both sides — corpus codes are computed
    * map-side and the corpus never shuffles; queries broadcast as in
    * [[bruteForceTopK]]. At serving scale the code column is what a
    * store persists (4× smaller scans), with this same one-row stats
    * artifact as the quantizer.
    *
    * Output: (query_id, rk, vec_id, sq_dist) — distance ASC ranking,
    * vec_id tie-break. */
  private def sq8Micro(x: Column): Column =
    round(x.cast("double") * 1e6).cast("long")

  /** The SQ8 quantizer itself: ONE row of per-dim (mns, mxs) bounds
    * in 6-dp micro-units — the store artifact a production rollout
    * persists (cf. QuantizerStore for PQ). */
  def sq8Stats(corpus: DataFrame): DataFrame =
    corpus
      .select(posexplode(col("embedding")).as(Seq("dim", "x")))
      .select(col("dim"), sq8Micro(col("x")).as("xi"))
      .groupBy(col("dim")).agg(min(col("xi")).as("mn"), max(col("xi")).as("mx"))
      .agg(array_sort(collect_list(struct(col("dim"), col("mn"), col("mx"))))
        .as("st"))
      .select(transform(col("st"), e => e.getField("mn")).as("mns"),
        transform(col("st"), e => e.getField("mx")).as("mxs"))

  /** SQ8 search against a GIVEN quantizer frame (one (mns, mxs) row —
    * fresh from [[sq8Stats]] or read back from a store): codes are
    * computed map-side under the broadcast stats row, so the serve
    * plan carries zero corpus-wide aggregation. */
  def sq8TopKWith(corpus: DataFrame, queries: DataFrame, stats: DataFrame,
                  k: Int): DataFrame = {
    def codes(df: DataFrame, idCol: String, out: String): DataFrame =
      df.crossJoin(broadcast(stats))
        .select(col("vec_id").as(idCol),
          transform(col("embedding"), (x, i) => {
            val mn = element_at(col("mns"), i + 1)
            val mx = element_at(col("mxs"), i + 1)
            when(mx === mn, lit(0L)).otherwise(
              greatest(lit(0L), least(lit(255L),
                floor(((sq8Micro(x) - mn) * 255L).cast("double") /
                  (mx - mn).cast("double")).cast("long"))))
          }).as(out))
    val c = codes(corpus, "vec_id", "cc")
    val q = codes(queries, "query_id", "qc")
    val pairs = c.crossJoin(broadcast(q))
      .withColumn("sq_dist", aggregate(
        zip_with(col("cc"), col("qc"), (a, b) => (a - b) * (a - b)),
        lit(0L), (acc, d) => acc + d))
      .select(col("query_id"), col("vec_id"), col("sq_dist"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sq_dist").asc, col("vec_id"))
    pairs.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("vec_id"), col("sq_dist"))
  }

  def sq8TopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame =
    sq8TopKWith(corpus, queries, sq8Stats(corpus), k)

  /** Margin-based bitext mining (Artetxe & Schwenk, ACL 2019 — the
    * LASER/CCMatrix method): from two monolingual embedding pools
    * `x`/`y` (vec_id, embedding), mine aligned pairs as MUTUAL nearest
    * neighbors whose margin clears `minMargin`, where
    *
    *   margin(x,y) = cos(x,y) / ((nbhd(x) + nbhd(y)) / 2)
    *
    * and nbhd(v) is the mean of v's top-`kNbhd` cross-side cosines —
    * the hubness normalization absolute cosine lacks (a hub vector
    * close to EVERYTHING has a high neighborhood mean, so its pairs
    * need proportionally higher cosine to clear the same margin).
    *
    * Scale: candidates come from the [[lshBucket]] join (never X×Y);
    * the pair frame is cut once (three windows fan out of it).
    * Determinism: cosines pround 6, neighborhood means sorted-fold 6dp
    * (the bm25 sum discipline), the quotient one 4dp round; mutual-best
    * ranks tie-break on the partner id. Output: x_id, y_id, cosine,
    * margin. */
  def bitextMine(x: DataFrame, y: DataFrame, planes: DataFrame,
                 kNbhd: Int, minMargin: Double): DataFrame = {
    val bx = lshBucket(x, planes).select(col("bucket"),
      col("vec_id").as("x_id"), col("embedding").as("xv"))
    val by = lshBucket(y, planes).select(col("bucket"),
      col("vec_id").as("y_id"), col("embedding").as("yv"))
    val pairs = Materialize.cut(bx.join(by, Seq("bucket"))
      .select(col("x_id"), col("y_id"),
        PRound.pround(VectorFns.cosine(col("xv"), col("yv")), 6)
          .as("cosine")))
    def nbhdAvg(key: String, other: String, out: String) = {
      val w = Window.partitionBy(col(key))
        .orderBy(col("cosine").desc, col(other))
      pairs.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= kNbhd)
        .groupBy(col(key))
        .agg(sort_array(collect_list(col("cosine"))).as("cs"))
        .select(col(key), PRound.pround(
          aggregate(col("cs"), lit(0.0), (a, c) => a + c) / size(col("cs")),
          6).as(out))
    }
    val fwd = pairs.withColumn("rk", row_number().over(
        Window.partitionBy(col("x_id"))
          .orderBy(col("cosine").desc, col("y_id"))))
      .filter(col("rk") === 1)
      .select(col("x_id"), col("y_id"), col("cosine"))
    val bwd = pairs.withColumn("rk", row_number().over(
        Window.partitionBy(col("y_id"))
          .orderBy(col("cosine").desc, col("x_id"))))
      .filter(col("rk") === 1).select(col("x_id"), col("y_id"))
    fwd.join(bwd, Seq("x_id", "y_id"))
      .join(nbhdAvg("x_id", "y_id", "ax"), Seq("x_id"))
      .join(nbhdAvg("y_id", "x_id", "ay"), Seq("y_id"))
      .withColumn("margin", PRound.pround(
        col("cosine") / ((col("ax") + col("ay")) / 2), 4))
      .filter(col("margin") >= minMargin)
      .select(col("x_id"), col("y_id"), col("cosine"), col("margin"))
  }
}
