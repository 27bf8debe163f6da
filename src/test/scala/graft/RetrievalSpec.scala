package graft

import org.apache.spark.sql.functions._

/** Behavioral pins for the retrieval / canonical-dedup quartet
  * (text_bm25, index_postings, dedup_apply_best,
  * decontaminate_semantic) — semantics asserted against naive
  * recomputations on the same sf0.001 tables the oracle gate uses.
  */
class RetrievalSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("text_bm25: top-10, positive scores, and a naive per-doc recomputation") {
    val rows = run("text_bm25").collect()
    assert(rows.length == 10)
    assert(rows.forall(_.getDouble(1) > 0.0))

    // recompute the winner's score naively: same canon/tokens, same
    // k1/b, contributions rounded to 6 dp then summed ascending
    val docId = rows.head.getLong(0)
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), graft.functions.TextAnalysis.wsTokens(
        graft.functions.TextAnalysis.canonicalize(col("text"))).as("toks"))
      .filter(size(col("toks")) > 0)
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1))
    val n = docs.length.toDouble
    val avgdl = docs.map(_._2.length.toDouble).sum / docs.length
    val qterms = Seq("spark", "filter", "merge", "window")
    val df = qterms.map(t => t -> docs.count(_._2.contains(t)).toDouble).toMap
    val toks = docs.find(_._1 == docId).get._2
    val dl = toks.length.toDouble
    def r(x: Double, p: Int) = BigDecimal(x)
      .setScale(p, BigDecimal.RoundingMode.HALF_UP).toDouble
    val contribs = qterms.flatMap { t =>
      val tf = toks.count(_ == t).toDouble
      if (tf == 0) None
      else {
        val idf = math.log(1.0 + (n - df(t) + 0.5) / (df(t) + 0.5))
        Some(r(idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)), 6))
      }
    }
    val expected = r(contribs.sorted.sum, 4)
    assert(rows.head.getDouble(1) == expected,
      s"doc $docId: got ${rows.head.getDouble(1)}, naive $expected")
  }

  test("index_postings: heads capped at 8 while df counts every document") {
    val rows = run("index_postings")
      .select(col("term"), col("df"), col("postings_head")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val df = r.getLong(1)
      val head = r.getString(2).split(",")
      assert(df >= 5)
      assert(head.length == math.min(df, 8L),
        s"term ${r.getString(0)}: df=$df head=${head.length}")
      // ascending doc ids — the head is the FIRST 8 postings
      assert(head.map(_.toLong).sorted.sameElements(head.map(_.toLong)))
    }
    // df for one common term equals a naive distinct-doc count
    val term = rows.head.getString(0)
    val naive = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(graft.functions.TextAnalysis.wsTokens(
        graft.functions.TextAnalysis.canonicalize(col("text")))).as("t"))
      .filter(col("t") === term)
      .select(col("doc_id")).distinct().count()
    assert(rows.head.getLong(1) == naive)
  }

  test("dedup_apply_best keeps one doc per cluster and prefers quality over min id") {
    val best = run("dedup_apply_best").select(col("id")).collect().map(_.getLong(0)).toSet
    val minId = run("dedup_apply").select(col("id")).collect().map(_.getLong(0)).toSet
    // both policies keep exactly one member per cluster → same cardinality
    assert(best.size == minId.size)
    // exact-copy clusters tie on quality → min id wins in both; the
    // near-copy clusters (first word dropped) are where they may differ.
    // Wherever they DO differ, the quality-canonical keep must score
    // >= the min-id keep of the same cluster (here: its planted source).
    val near = minId.filter(id => minId.contains(id) && best.contains(id + 2000000))
    near.foreach { id =>
      val d = Tables.documents(spark, dir).filter(col("doc_id") === id)
        .select(col("text"),
          graft.functions.TextAnalysis.qualityScore(col("text")).as("q"),
          graft.functions.TextAnalysis.qualityScore(
            regexp_replace(col("text"), "^\\S+\\s+", "")).as("qNear"))
        .collect().head
      assert(d.getDouble(2) >= d.getDouble(1),
        s"cluster of $id kept the near copy but it scores lower")
    }
  }

  test("ann_knn_graph: per-vector edges match a naive same-bucket scan") {
    val edges = run("ann_knn_graph").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(edges.nonEmpty)
    val byVec = edges.groupBy(_._1)
    assert(byVec.values.forall(_.length <= 3))
    // recompute one vector's neighborhood brute-force: bucket by the
    // same 6 planes, rank same-bucket candidates by (cosine desc, id)
    val e = Tables.embeddings(spark, dir)
    val planes = e.filter(col("vec_id") < 6)
      .select(col("vec_id"), col("embedding"))
    val corpus = e.filter(col("vec_id") >= 16)
      .select(col("vec_id"), col("embedding"))
    val buckets = graft.operators.Ann.lshBucket(corpus, planes)
      .select(col("vec_id"), col("bucket")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val probe = byVec.keys.min
    val sameBucket = buckets.filter { case (id, b) =>
      b == buckets(probe) && id != probe
    }.keys.toSet
    val naive = Tables.embeddings(spark, dir)
      .filter(col("vec_id").isin(sameBucket.toSeq.map(Long.box): _*))
      .crossJoin(broadcast(e.filter(col("vec_id") === probe)
        .select(col("embedding").as("qv"))))
      .select(col("vec_id"), graft.functions.PRound.pround(
        graft.functions.VectorFns.cosine(col("embedding"), col("qv")), 6).as("c"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
      .sortBy { case (id, c) => (-c, id) }.take(3).map(_._1)
    assert(byVec(probe).sortBy(_._2).map(_._3).sameElements(naive))
  }

  test("filter_domains: dot-anchored suffix blocks subdomains, nothing else") {
    val rows = run("filter_domains").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    val expectedBlocked = Set(
      "src3.example.com", "cdn.src3.example.com",   // entry + subdomain
      "src7.example.com", "cdn.src7.example.com",
      "src11.example.com", "cdn.src11.example.com") // parent + child entries
    assert(rows.filter(_._3 == 1).map(_._1).toSet == expectedBlocked)
    // a non-entry that merely CONTAINS an entry is not blocked
    // (dot-anchoring): srcN domains beyond the list stay clean
    assert(rows.exists(r => r._3 == 0))
    // cdn.src11.example.com matches TWO entries (its exact entry AND
    // the src11 parent): n_docs must equal the true doc count, not 2×
    // — the per-doc flag aggregation (r7 ADVICE latent bug, fixed)
    val expected = Tables.documents(spark, dir)
      .filter(col("source") === "src11" && col("doc_id") % 3 === 0).count()
    assert(rows.find(_._1 == "cdn.src11.example.com").get._2 == expected)
  }

  test("filter_domains_scaled is bit-equal to the broadcast fast path") {
    val small = run("filter_domains").collect().map(_.toString).toSeq
    val scaled = run("filter_domains_scaled").collect().map(_.toString).toSeq
    assert(scaled == small)
  }

  test("ann_ivfpq_rerank: recall@5 dominates plain ADC recall per query") {
    // the rerank stage reorders the SAME candidate set by true
    // cosine, so every global-exact-top-5 member among the candidates
    // survives — recall can only go up vs the ADC ranking
    val adc = run("ann_ivfpq_recall").collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val rr = run("ann_ivfpq_rerank_recall").collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(rr.keySet == adc.keySet)
    adc.foreach { case (q, a) =>
      assert(rr(q) >= a, s"query $q: rerank ${rr(q)} < adc $a")
    }
  }

  test("stats_drift: top terms ordered by KL contribution, recomputed naively") {
    val rows = run("stats_drift").collect()
      .map(r => (r.getString(0), r.getDouble(3)))
    assert(rows.length == 10)
    assert(rows.map(_._2).sameElements(rows.map(_._2).sortBy(-_)))
    // recompute the winner's contribution from raw counts
    val (term, kl) = rows.head
    val toks = Tables.documents(spark, dir)
      .select((col("doc_id") % 2).as("b"),
        explode(graft.functions.TextAnalysis.wsTokens(
          graft.functions.TextAnalysis.canonicalize(col("text")))).as("t"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val ta = toks.count(_._1 == 0).toDouble
    val tb = toks.count(_._1 == 1).toDouble
    val ca = toks.count(x => x._1 == 0 && x._2 == term).toDouble
    val cb = toks.count(x => x._1 == 1 && x._2 == term).toDouble
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(kl == r6((ca / ta) * math.log((ca / ta) / (cb / tb))))
  }

  test("decontaminate_semantic flags exactly the vectors a brute-force scan flags") {
    val flagged = run("decontaminate_semantic").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val e = Tables.embeddings(spark, dir)
    val naive = e.filter(col("vec_id") >= 16).select(col("vec_id"), col("embedding"))
      .crossJoin(e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("b"), col("embedding").as("bv")))
      .select(col("vec_id"), graft.functions.PRound.pround(
        graft.functions.VectorFns.cosine(col("embedding"), col("bv")), 6).as("c"))
      .filter(col("c") >= 0.35)
      .groupBy(col("vec_id")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(flagged == naive)
    assert(flagged.nonEmpty)
  }
}
