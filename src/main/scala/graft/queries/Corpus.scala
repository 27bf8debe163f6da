package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.PRound
import graft.functions.TextAnalysis
import graft.operators.{Ann, Components, Dedup, EditJoin, GifCodec, JpegCodec, Materialize, Multimodal, NaiveBayes, PngCodec, Sampling, SimilarityJoin}

/** Block H — LLM-training-data pipeline operators (SURVEY.md §2.H):
  * dedup family, similarity search, text analysis.
  *
  * The raw corpus has no natural near-duplicates (max pairwise cosine
  * ≈ 0.40), so dedup queries *plant* duplicates deterministically
  * inside the query — exact copies at `id+1_000_000` and first-word-
  * dropped near copies at `id+2_000_000` — and the oracle replicates
  * the planting, making recall checkable.
  */
object Corpus {

  /** Okapi BM25 (k1=1.2, b=0.75) of every hit doc against the fixed
    * query-term set — shared by `text_bm25` (top-10) and
    * `search_hybrid` (lexical leg). Scale shape unchanged from
    * text_bm25's audit: tf filtered to query terms BEFORE any
    * shuffle, df broadcast, corpus length stats one exact sum/count
    * agg; 6-dp sorted-sum contributions so scores reproduce across
    * engines. Returns (doc_id, bm25), unranked. */
  private def bm25Scores(s: SparkSession, dir: String): DataFrame = {
    val qterms = Seq("spark", "filter", "merge", "window")
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), TextAnalysis.wsTokens(
        TextAnalysis.canonicalize(col("text"))).as("toks"))
      .filter(size(col("toks")) > 0)
    val lens = docs.select(col("doc_id"), size(col("toks")).cast("double").as("dl"))
    val stats = lens.agg(count(lit(1)).cast("double").as("n_docs"),
      (sum(col("dl")) / count(lit(1))).as("avgdl"))
    val tf = docs.select(col("doc_id"), explode(col("toks")).as("term"))
      .filter(col("term").isin(qterms: _*))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).cast("double").as("df"))
    val k1 = lit(1.2)
    val b = lit(0.75)
    val idf = log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5))
    tf.join(broadcast(dfreq), Seq("term"))
      .join(lens, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .select(col("doc_id"),
        PRound.pround(idf * col("tf") * (k1 + 1.0) /
          (col("tf") + k1 * (lit(1.0) - b + b * col("dl") / col("avgdl"))), 6)
          .as("c"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("c"))).as("cs"))
      .select(col("doc_id"),
        PRound.pround(aggregate(col("cs"), lit(0.0), (a, x) => a + x), 4)
          .as("bm25"))
  }

  /** documents ∪ planted exact copies ∪ planted near copies. */
  private[queries] def plantedDocs(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir).select(col("doc_id").as("id"), col("text"))
    d.unionByName(
        d.filter(col("id") % 25 === 0).select((col("id") + 1000000).as("id"), col("text")))
      .unionByName(
        d.filter(col("id") % 50 === 0).select((col("id") + 2000000).as("id"),
          regexp_replace(col("text"), "^\\S+\\s+", "").as("text")))
  }

  /** documents refolded as multi-line pages with PLANTED boilerplate —
    * newsletter header on every 3rd doc, rights footer on every 4th —
    * because the synthetic corpus is single-line prose with no organic
    * line structure. The body is split into two content lines so every
    * doc also carries unique lines; concat_ws skips the null
    * header/footer (both engines), so line positions stay compact. */
  private[queries] def multilineDocs(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(col("doc_id").as("id"),
      concat_ws("\n",
        when(col("doc_id") % 3 === 0,
          lit("Subscribe to our newsletter for daily updates")),
        substring(col("text"), 1, 100),
        nullif(substring(col("text"), 101, 100), lit("")),
        when(col("doc_id") % 4 === 0,
          lit("All rights reserved - contact the administrator")))
        .as("text"))

  /** Shared gram frames for the decontamination pair: (train grams,
    * benchmark grams), both keyed by md5 of the word 8-gram. The train
    * corpus carries PLANTED leaks — docs quoting a benchmark head
    * verbatim inside fresh surrounding text — the thing
    * decontamination exists to catch (organic 8-gram overlap in the
    * synthetic corpus is near zero, which would make the queries
    * vacuous). */
  private def decontamGrams(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val d = Tables.documents(s, dir)
    val train = d.select(col("doc_id"), col("text"))
      .unionByName(d.filter(col("doc_id") % 37 === 0)
        .select((col("doc_id") + 5000000).as("doc_id"),
          concat(lit("leaked quote follows "),
            substring(col("text"), 1, 120), lit(" and fresh tail words"))
            .as("text")))
    val bench = d.filter(col("doc_id") % 37 === 0)
      .select(col("doc_id").as("bench_id"),
        substring(col("text"), 1, 120).as("btext"))
    val bgrams = bench.select(col("bench_id"),
        explode(TextAnalysis.wordShingles(col("btext"), 8)).as("g"))
      .select(col("bench_id"), md5(col("g")).as("gh"))
    val tgrams = train.select(col("doc_id"),
        explode(TextAnalysis.wordShingles(col("text"), 8)).as("g"))
      .select(col("doc_id"), md5(col("g")).as("gh"))
    (tgrams, bgrams)
  }

  private def plantedVecs(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir).filter(col("vec_id") < 1000)
      .select(col("vec_id"), col("embedding"))
    e.unionByName(e.filter(col("vec_id") % 20 === 0)
      .select((col("vec_id") + 1000000).as("vec_id"), col("embedding")))
  }

  /** recall@5 of an approx ANN result (query_id, vec_id, …) against
    * the exact top-5 over the standard corpus/query splits. Left join
    * + conditional count so a zero-recall query still reports a row
    * (ann_recall's shape). At corpus scale the exact side runs over a
    * sampled query set; the 8-query split IS the sample here. */
  private def annRecall(approx: DataFrame, s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    val corpus = e.filter(col("vec_id") >= 16)
    val qs = e.filter(col("vec_id") >= 8 && col("vec_id") < 16)
    val exact = Ann.bruteForceTopK(corpus, qs, 5)
      .select(col("query_id").as("eq"), col("vec_id").as("ev"))
    exact.join(approx.select(col("query_id"), col("vec_id")),
        col("eq") === col("query_id") && col("ev") === col("vec_id"), "left")
      .groupBy(col("eq"))
      .agg(count(col("query_id")).as("n_hits"))
      .select(col("eq").as("query_id"), col("n_hits"),
        PRound.pround(col("n_hits") / 5.0, 4).as("recall_at_5"))
      .orderBy(col("query_id"))
  }

  /** The langid classifier's class list — documents.lang's domain,
    * sorted (the NaiveBayes tie-break order). */
  private val langidLangs = Seq("de", "en", "es", "fr", "zh")

  /** Per-language 8-char alphabets for the deterministic language
    * TAIL (VERDICT r14 #2 — the mm_* fixture discipline): testdata's
    * `lang` column is independent of its (English-ish) token content,
    * so the NB eval used to read at the chance ceiling. Each doc now
    * appends 32 characters drawn from its language's alphabet at
    * md5(doc_id)-keyed positions — genuinely language-skewed char-gram
    * content, deterministic from (doc_id, lang), replayed verbatim by
    * the oracle — so the trained model demonstrably beats both chance
    * and the marker heuristic (which still scores the UNmodified
    * text). */
  private val langidAlpha: Seq[(String, String)] = Seq(
    "de" -> "äöüßwzkg", "en" -> "theryngs", "es" -> "ñáéílors",
    "fr" -> "àèêçuvmp", "zh" -> "的一是了我不人在")

  /** (doc_id, lang, pred_marker, feats) — hashed char-TRIGRAM features
    * for the model-based language classifier (VERDICT r13 #2): the
    * first 96 chars of the lowercased whitespace-collapsed text plus
    * the 32-char [[langidAlpha]] language tail; every 3-char window
    * md5-hashes to one of 256 buckets (the text_feature_hash / DSIR
    * idiom), and the bucket id rides as a STRING token so the
    * NaiveBayes machinery applies unchanged. No vocabulary state at
    * any corpus size; the feature string is LET-BOUND once (the
    * bindOnce discipline — HOF lambdas have no CSE, a naive reference
    * would re-run the regex per window). `pred_marker` carries the
    * marker-word heuristic's prediction (on the FULL original text)
    * for the eval head-to-head. */
  private def langidFeatDocs(s: SparkSession, dir: String): DataFrame = {
    val alpha = langidAlpha.tail.foldLeft(
      when(col("lang") === langidAlpha.head._1, lit(langidAlpha.head._2))) {
      case (acc, (l, a)) => acc.when(col("lang") === l, lit(a))
    }.otherwise(lit("________"))
    val lh = md5(concat(col("doc_id").cast("string"), lit("-lt")))
    // nibble k of the doc hash indexes the language alphabet
    val tail = element_at(transform(array(lh), hb =>
      concat_ws("", transform(sequence(lit(1), lit(32)), k =>
        alpha.substr(
          (conv(hb.substr(k, lit(1)), 16, 10).cast("int") % 8) + 1,
          lit(1))))), 1)
    val t = concat(
      substring(regexp_replace(lower(col("text")), "\\s+", " "), 1, 96),
      tail)
    // Spark sequence(1, 0) DESCENDS instead of emitting empty — guard
    // the sub-3-char doc explicitly (the cdcChunks empty-doc lesson)
    val feats = element_at(transform(array(t), tb =>
      when(length(tb) >= 3,
        transform(sequence(lit(1), length(tb) - 2),
          i => conv(substring(md5(tb.substr(i, lit(3))), 31, 2), 16, 10)
            .cast("long").cast("string")))
        .otherwise(array().cast("array<string>"))), 1)
    Tables.documents(s, dir).select(col("doc_id"), col("lang"),
      // langIdHof, not langId: this projection already carries the
      // feats HOF (interpreted — no CSE), so the let-bound form halves
      // the five regexp_count passes (r16, kept in r17)
      TextAnalysis.langIdHof(col("text")).as("pred_marker"),
      feats.as("feats"))
  }

  /** The hash-split 80% train slice of [[langidFeatDocs]] (slot >=
    * 2000 — splitLabel's "train" side), teacher = ground-truth lang. */
  private def langidTrainDocs(s: SparkSession, dir: String): DataFrame =
    trainSlice(langidFeatDocs(s, dir))

  private def trainSlice(featDocs: DataFrame): DataFrame =
    Sampling.splitLabel(featDocs, "doc_id", 2000)
      .filter(col("split") === "train")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact" -> { (s, dir) =>
      Dedup.exact(plantedDocs(s, dir), "id", "text")
        .orderBy(col("text_hash"))
    },

    "dedup_minhash_lsh" -> { (s, dir) =>
      Dedup.minhashLsh(plantedDocs(s, dir), "id", "text")
        .select(col("id_a"), col("id_b"), PRound.pround(col("jaccard"), 4).as("jaccard"))
        .orderBy(col("id_a"), col("id_b"))
    },

    // MinHash accuracy gate (round 11) — the estimator-quality
    // contract for the near-dup family, as ann_recall is for ANN:
    // per LSH candidate pair, the signature-agreement estimate
    // (matches/numHashes — the quantity banding thresholds on) vs the
    // exact shingle Jaccard, with absolute error. Rounding happens at
    // the edge; err derives from the RAW doubles in both engines.
    "dedup_minhash_est" -> { (s, dir) =>
      Dedup.minhashEstimate(plantedDocs(s, dir), "id", "text")
        .select(col("id_a"), col("id_b"),
          PRound.pround(col("est"), 4).as("est_jaccard"),
          PRound.pround(col("jaccard"), 4).as("jaccard"),
          PRound.pround(col("abs_err"), 4).as("abs_err"))
        .orderBy(col("id_a"), col("id_b"))
    },

    // Threshold-sweep TUNING CURVE for the near-dedup verify stage —
    // the dial a dedup rollout turns before committing a cut: at each
    // candidate threshold t, how many LSH-candidate pairs the minhash
    // ESTIMATE admits vs the exact-Jaccard truth on the same pairs
    // (precision = est-admitted that are truly ≥ t, recall = truly-≥-t
    // pairs the estimate keeps). The ann_recall_curve shape applied to
    // dedup. Pair frame cut once; the 5-row threshold frame rides a
    // broadcast; census per t is one conditional agg.
    "dedup_rate_curve" -> { (s, dir) =>
      val pairs = Materialize.cut(
        Dedup.minhashEstimate(plantedDocs(s, dir), "id", "text")
          .select(PRound.pround(col("est"), 4).as("est"),
            PRound.pround(col("jaccard"), 4).as("j")))
      val ts = s.range(1).select(explode(array(
        Seq(0.5, 0.6, 0.7, 0.8, 0.9).map(lit): _*)).as("t"))
      pairs.crossJoin(broadcast(ts))
        .groupBy(col("t"))
        .agg(sum((col("est") >= col("t")).cast("long")).as("n_est"),
          sum((col("j") >= col("t")).cast("long")).as("n_true"),
          sum((col("est") >= col("t") && col("j") >= col("t"))
            .cast("long")).as("tp"))
        .select(col("t"), col("n_est"), col("n_true"), col("tp"),
          PRound.pround(when(col("n_est") > 0,
            col("tp").cast("double") / col("n_est")).otherwise(0.0), 4)
            .as("precision"),
          PRound.pround(when(col("n_true") > 0,
            col("tp").cast("double") / col("n_true")).otherwise(0.0), 4)
            .as("recall"))
        .orderBy(col("t"))
    },

    // Banding AUTO-TUNER (round 14, VERDICT r13 #9): the closed-form
    // (b, r) ↔ threshold algebra dedup_rate_curve measures
    // empirically — for every divisor split of a 12-hash signature,
    // the LSH S-curve's 0.5-crossing, uniform-prior FP/FN mass around
    // the 0.7 target, the corpus-size-scaled expected FP pairs, and
    // the minimizing plan ranked first. Powers are unrolled repeated
    // multiplication (libm pow is not portably rounded), masses fold
    // rounded contributions in sorted order; the whole computation is
    // a |divisors|×100 in-engine frame the oracle replays literally.
    "dedup_band_plan" -> { (s, dir) =>
      val nd = Tables.documents(s, dir).agg(count(lit(1)).as("n_docs"))
      Dedup.bandPlan(s, numHashes = 12, targetT = 0.7, nd)
        .orderBy(col("rank"))
    },

    "dedup_simhash" -> { (s, dir) =>
      Dedup.simhashPairs(plantedDocs(s, dir), "id", "text")
        .orderBy(col("id_a"), col("id_b"))
    },

    "dedup_simhash_near" -> { (s, dir) =>
      Dedup.simhashNear(plantedDocs(s, dir), "id", "text", maxHamming = 3)
        .orderBy(col("id_a"), col("id_b"))
    },

    // Exact shared-substring spans (the ExactSubstr/suffix-array
    // shape, re-expressed as fingerprint diagonals + gaps-and-islands
    // — see Dedup.substringRuns): planted exact copies surface as one
    // full-length diagonal-0 run, first-word-dropped near copies as a
    // diagonal-±1 run one token short — with the exact spans a
    // cut-the-duplicate-bytes policy needs, which pair-level scores
    // (minhash/simhash) cannot provide.
    "dedup_substring" -> { (s, dir) =>
      Dedup.substringRuns(plantedDocs(s, dir), "id", "text",
          w = 8, minRun = 12)
        .orderBy(col("id_a"), col("id_b"), col("start_a"))
    },

    // The apply step: cut every b-side span out, lower id keeps.
    // Exact copies empty out entirely (clean_hash null — subsuming
    // pairwise dedup_apply); near copies keep exactly their novel
    // tokens. The cleaned-corpus rebuild a cut-the-duplicate-bytes
    // policy actually ships.
    "dedup_substring_apply" -> { (s, dir) =>
      Dedup.substringApply(plantedDocs(s, dir), "id", "text",
          w = 8, minRun = 12)
        .orderBy(col("id"))
    },

    // CCNet-style LINE dedup census: whole normalized lines repeated
    // across >= 5 distinct documents (planted boilerplate header/
    // footer) with their document frequency and occurrence count. One
    // map-side-combinable aggregation keyed on the line md5 — the
    // cheapest dedup signal in the family.
    "dedup_lines" -> { (s, dir) =>
      Dedup.commonLines(multilineDocs(s, dir), "id", "text", minDocs = 5L)
        .orderBy(col("line"))
    },

    // The keep-first APPLY: the globally first (id, pos) occurrence of
    // every line survives, docs rebuilt from survivors. First-occurrence
    // choice is a skew-proof groupBy min(struct), never a row_number
    // window over the hottest boilerplate line's full posting list.
    "dedup_lines_apply" -> { (s, dir) =>
      Dedup.lineDedupApply(multilineDocs(s, dir), "id", "text")
        .orderBy(col("id"))
    },

    "dedup_ngram_jaccard" -> { (s, dir) =>
      val names = Tables.part(s, dir).select(col("p_name").as("name")).distinct()
        .withColumn("id", col("name"))
      Dedup.ngramJaccard(names, "id", "name", k = 3, threshold = 0.25)
        .select(col("id_a").as("name_a"), col("id_b").as("name_b"),
          PRound.pround(col("jaccard"), 4).as("jaccard"))
        .orderBy(col("name_a"), col("name_b"))
    },

    // Prefix-filtered Jaccard self-join over document heads — the
    // AllPairs/PPJoin candidate scheme on word-BIGRAM shingles (the
    // w-shingling a real text similarity join uses: this corpus's
    // 125-word vocabulary makes unigram sets hopelessly dense — 19M
    // candidate pairs at sf0.1 for ANY index — while bigrams are
    // selective, 0.4M pairs, and the prefix filter prunes the rest).
    // Only each set's rarest n-⌈t·n⌉+1 shingles are indexed. The
    // oracle runs the FULL inverted-index join: prefix filtering is
    // provably lossless, so results must match bit-for-bit — any
    // dropped pair fails the gate.
    "simjoin_prefix" -> { (s, dir) =>
      val w = filter(split(trim(regexp_replace(col("head"), "\\s+", " ")), " "),
        x => length(x) > 0)
      val docs = plantedDocs(s, dir)
        .select(col("id"), substring(col("text"), 1, 60).as("head"))
        .withColumn("w", w).filter(size(col("w")) >= 2)
        .select(col("id"), array_join(
          zip_with(slice(col("w"), lit(1), size(col("w")) - 1),
            slice(col("w"), lit(2), size(col("w")) - 1),
            (a, b) => concat(a, lit("_"), b)), " ").as("btext"))
      SimilarityJoin.selfJoinPrefix(docs, "id", "btext", 0.6)
        .select(col("k_a").as("id_a"), col("k_b").as("id_b"),
          PRound.pround(col("jaccard"), 4).as("jaccard"))
        .orderBy(col("id_a"), col("id_b"))
    },

    // Edit-distance similarity join (Ed-Join's q-gram prefix scheme,
    // operators.EditJoin): 40-char document heads plus planted
    // one-deletion mutations, levenshtein <= 1 verified per candidate.
    // Only each string's rarest qd+1 = 6 five-grams are indexed (q = 5
    // — the selectivity dial the §6 smoke justified); the oracle runs
    // the FULL TRIGRAM-index join, a DIFFERENT complete candidate
    // scheme — both are provably lossless, so any divergence fails the
    // gate. (Both engines' levenshtein agree on ASCII only — DuckDB's
    // is byte-level — which this corpus is, the standing canonicalize
    // assumption.)
    "simjoin_edit" -> { (s, dir) =>
      val base = Tables.documents(s, dir)
        .select(col("doc_id").as("id"), substring(col("text"), 1, 40).as("s"))
      val named = base.unionByName(
        base.filter(col("id") % 5 === 0)
          .select((col("id") + 1000000).as("id"),
            concat(substring(col("s"), 1, 4), substring(col("s"), 6, 40))
              .as("s")))
      EditJoin.selfJoin(named, "id", "s", d = 1, q = 5)
        .select(col("k_a").as("id_a"), col("k_b").as("id_b"), col("dist"))
        .orderBy(col("id_a"), col("id_b"))
    },

    // n-gram Jaccard ON DOCUMENTS: 60-char heads, trigram sets capped
    // by document frequency (<= 50) so stopword-grade grams don't
    // create quadratic candidate buckets.
    "dedup_ngram_docs" -> { (s, dir) =>
      val docs = plantedDocs(s, dir)
        .select(col("id"), substring(col("text"), 1, 60).as("head"))
      Dedup.ngramJaccard(docs, "id", "head", k = 3, threshold = 0.4,
          maxGramFreq = Some(50))
        .select(col("id_a"), col("id_b"), PRound.pround(col("jaccard"), 4).as("jaccard"))
        .orderBy(col("id_a"), col("id_b"))
    },

    // Benchmark DECONTAMINATION — the Gopher/GPT-style training-data
    // step distinct from dedup: a train doc sharing ANY word 8-gram
    // with the (synthetic) eval set is flagged, with the evidence
    // counts a pipeline logs before dropping. The benchmark side is
    // tiny by definition → broadcast; grams travel as md5 hashes
    // (fixed-width shuffle keys, never text). 8-grams are specific
    // enough that no df-cap is needed; a giant web corpus would add
    // the ngramJaccard-style cap as a skew guard.
    // Embedding-table health report — the pre-ANN sanity gate a
    // vector rollout runs first: per-label count, norm distribution
    // and zero-vector count (zero vectors poison cosine math).
    // Norms are row-local fixed-order arithmetic (portable); the
    // cross-row MEAN goes through 6-dp-rounded DECIMAL sums — the §4
    // no-float-SUM trick — so partial-aggregation order can't flip a
    // bit vs the oracle.
    // Embedding-space outlier gate (round 11) — the curation step
    // emb_norm_stats (norms) and dedup_embedding (near-dups) leave
    // open: vectors far from the corpus CENTROID are the corrupt/
    // off-distribution rows a training build drops before indexing.
    // Centroid = element-wise 6-dp mean (the kmeansAnchors
    // discipline — rounding absorbs partition-order ulps), scored by
    // cosine against the broadcast 1-row centroid, flagged below the
    // exact 1st-percentile cosine (broadcast back — never a global
    // sort). | 100 TB: one posexplode agg to |dims| rows, one
    // map-side score pass, one percentile agg.
    "emb_outliers" -> { (s, dir) =>
      import graft.functions.VectorFns
      val e = Tables.embeddings(s, dir).filter(col("vec_id") >= 16)
        .select(col("vec_id"), col("embedding"))
      val cent = e.select(posexplode(col("embedding")).as(Seq("dim", "x")))
        .groupBy(col("dim"))
        .agg(PRound.pround(avg(col("x").cast("double")), 6).as("m"))
        .agg(transform(array_sort(collect_list(struct(col("dim"), col("m")))),
          p => p.getField("m")).as("cv"))
      val scored = e.crossJoin(broadcast(cent))
        .select(col("vec_id"),
          PRound.pround(VectorFns.cosine(col("embedding"), col("cv")), 6)
            .as("cos_centroid"))
      val thr = scored.agg(PRound.pround(
        expr("percentile(cos_centroid, 0.01)"), 6).as("thr"))
      scored.crossJoin(broadcast(thr))
        .select(col("vec_id"), col("cos_centroid"),
          (col("cos_centroid") < col("thr")).as("is_outlier"))
        .orderBy(col("vec_id"))
    },

    "emb_norm_stats" -> { (s, dir) =>
      val nrm = PRound.pround(
        graft.functions.VectorFns.norm(col("embedding")), 6)
      Tables.embeddings(s, dir)
        .select(col("label"), nrm.as("nrm"))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n_vecs"),
          PRound.pround(
            sum(col("nrm").cast("decimal(18,6)")).cast("double") / count(lit(1)),
            6).as("mean_norm"),
          min(col("nrm")).as("min_norm"),
          max(col("nrm")).as("max_norm"),
          sum(when(col("nrm") === 0.0, lit(1L)).otherwise(lit(0L))).as("n_zero"))
        .orderBy(col("label"))
    },

    // Incremental dedup — the production DAILY shape: today's batch
    // dedups against the historical fingerprint STORE (md5 keys only,
    // never text — at 100 TB the store is a persisted hash table),
    // then within itself (keep lowest id). The batch carries PLANTED
    // re-fetches: every 13th historical page under a new id and a
    // double-fetch of every 41st fresh page — the duplication this
    // operator exists to catch (organic cross-day exact overlap in
    // the synthetic corpus is zero, which would make it vacuous).
    "dedup_incremental" -> { (s, dir) =>
      val d = Tables.documents(s, dir)
      val history = d.filter(col("doc_id") < 250)
      val batch = d.filter(col("doc_id") >= 250)
        .select(col("doc_id"), col("text"))
        .unionByName(d.filter(col("doc_id") < 250 && col("doc_id") % 13 === 0)
          .select((col("doc_id") + 1000000).as("doc_id"), col("text")))
        .unionByName(d.filter(col("doc_id") >= 250 && col("doc_id") % 41 === 0)
          .select((col("doc_id") + 2000000).as("doc_id"), col("text")))
      val store = history.select(md5(col("text")).as("h")).distinct()
      batch.select(col("doc_id"), md5(col("text")).as("h"))
        .join(store, Seq("h"), "left_anti")
        .groupBy(col("h"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
        .select(col("keep_id"), col("n_copies"))
        .orderBy(col("keep_id"))
    },

    // Incremental NEAR-dup dedup — the minhash twin of
    // dedup_incremental (which is exact-hash only): the historical
    // corpus persists as a DISTINCT (band, band-hash) fingerprint
    // store; today's batch is banded, semi-joined against the store
    // (any collision = near-known, dropped), and the within-batch
    // survivors near-dedup among themselves via the verified
    // minhash+components chain. The batch plants NEAR re-fetches of
    // history (first word dropped — the re-crawled page with a
    // tweaked headline) and exact within-batch double-fetches; the
    // oracle replays the identical band geometry.
    "dedup_incremental_near" -> { (s, dir) =>
      val d = Tables.documents(s, dir)
      val history = d.filter(col("doc_id") < 250)
        .select(col("doc_id").as("id"), col("text"))
      val batch = d.filter(col("doc_id") >= 250)
        .select(col("doc_id").as("id"), col("text"))
        .unionByName(d.filter(col("doc_id") < 250 && col("doc_id") % 13 === 0)
          .select((col("doc_id") + 1000000).as("id"),
            regexp_replace(col("text"), "^\\S+\\s+", "").as("text")))
        .unionByName(d.filter(col("doc_id") >= 250 && col("doc_id") % 41 === 0)
          .select((col("doc_id") + 2000000).as("id"), col("text")))
      val store = Dedup.bandStore(history, "id", "text")
      Dedup.incrementalNear(batch, store, "id", "text")
        .orderBy(col("keep_id"))
    },

    // Corpus-level duplicate 8-gram rate — the health metric behind
    // every dedup decision: what fraction of (per-doc-distinct) word
    // 8-grams recur across the corpus. Grams shuffle as md5 keys
    // (fixed-width, never text); the whole answer is one gram agg +
    // one scalar agg over the counts table.
    "corpus_dup_ngrams" -> { (s, dir) =>
      Tables.documents(s, dir)
        .select(explode(TextAnalysis.wordShingles(col("text"), 8)).as("g"))
        .select(md5(col("g")).as("gh"))
        .groupBy(col("gh")).agg(count(lit(1)).as("cnt"))
        .agg(sum(col("cnt")).as("n_occurrences"),
          count(lit(1)).as("n_distinct"),
          sum(when(col("cnt") > 1, lit(1L)).otherwise(lit(0L))).as("n_repeated"))
        .select(col("n_occurrences"), col("n_distinct"), col("n_repeated"),
          PRound.pround(lit(1.0) -
            col("n_distinct").cast("double") / col("n_occurrences").cast("double"),
            6).as("dup_rate"))
    },

    "decontaminate" -> { (s, dir) =>
      val (tgrams, bgrams) = decontamGrams(s, dir)
      tgrams.join(broadcast(bgrams), Seq("gh"))
        .filter(col("doc_id") =!= col("bench_id"))
        .groupBy(col("doc_id"))
        .agg(countDistinct(col("bench_id")).as("n_benchmark_docs"),
          countDistinct(col("gh")).as("n_shared_grams"))
        .orderBy(col("doc_id"))
    },

    // Bloom-side decontamination — the shape for when the benchmark
    // side outgrows a broadcast (hundreds of eval sets): a packed
    // Bloom bitmask over the benchmark grams (a few KB, broadcast
    // once) prunes the TRAIN grams map-side BEFORE the exact gram
    // join's exchange, so non-leaking rows — the overwhelming
    // majority at 100 TB — never shuffle. The exact join then removes
    // Bloom false positives; Bloom has no false negatives, so the
    // result is bit-identical to `decontaminate` (same oracle SQL).
    // The join is deliberately a shuffle join (merge hint): it models
    // the non-broadcastable benchmark side this variant exists for.
    "decontaminate_bloom" -> { (s, dir) =>
      val (tgrams, bgrams) = decontamGrams(s, dir)
      val bloom = graft.operators.Bloom.build(
        bgrams.select(col("gh")).distinct(), "gh")
      bloom.prune(tgrams, "gh")
        .join(bgrams.hint("shuffle_merge"), Seq("gh"))
        .filter(col("doc_id") =!= col("bench_id"))
        .groupBy(col("doc_id"))
        .agg(countDistinct(col("bench_id")).as("n_benchmark_docs"),
          countDistinct(col("gh")).as("n_shared_grams"))
        .orderBy(col("doc_id"))
    },

    // Store-served decontamination (round 11, VERDICT r10 #8 stretch):
    // the benchmark-gram Bloom filter builds AT MOST ONCE per dataset
    // generation into the content-keyed DatasetCache (the
    // ann_ivfpq_stored topology — the benchmark set is fixed while
    // daily train batches change, so rebuilding its filter per batch
    // is pure waste) and is served by reading the packed one-row
    // Array[Long] back. The stored filter is bit-identical to the
    // fresh build (deterministic md5-slice positions), so the shared
    // decontaminate_bloom oracle proves serve ≡ build.
    "decontaminate_bloom_stored" -> { (s, dir) =>
      val bloomBits = 1 << 15
      val bloomHashes = 4
      val (tgrams, bgrams) = decontamGrams(s, dir)
      // Geometry lives in the artifact name (ADVICE r11): the content
      // key only tracks documents.parquet, so without it a later
      // bits/hashes change would silently serve a stale filter with a
      // mismatched bit/hash layout.
      val store = graft.sources.DatasetCache.getOrBuild(
          dir, Seq("documents.parquet"),
          s"decontam_bloom_${bloomBits}x$bloomHashes") { path =>
        graft.operators.Bloom.build(bgrams.select(col("gh")).distinct(),
            "gh", bits = bloomBits, hashes = bloomHashes)
          .packed.write.mode("overwrite").parquet(path)
      }
      val bloom = graft.operators.Bloom.Filter(
        s.read.parquet(store), bits = bloomBits, hashes = bloomHashes)
      bloom.prune(tgrams, "gh")
        .join(bgrams.hint("shuffle_merge"), Seq("gh"))
        .filter(col("doc_id") =!= col("bench_id"))
        .groupBy(col("doc_id"))
        .agg(countDistinct(col("bench_id")).as("n_benchmark_docs"),
          countDistinct(col("gh")).as("n_shared_grams"))
        .orderBy(col("doc_id"))
    },

    // Containment near-dup: quotes (40-char substrings of other docs)
    // have tiny Jaccard against their source but containment ≈ 1 —
    // the asymmetric relation that catches wholesale quoting. Same
    // inverted index as the Jaccard variant.
    "dedup_containment" -> { (s, dir) =>
      val d = Tables.documents(s, dir)
      val heads = d.select(col("doc_id").as("id"),
        substring(col("text"), 1, 60).as("head"))
      val quotes = d.filter(col("doc_id") % 30 === 0)
        .select((col("doc_id") + 3000000).as("id"),
          substring(col("text"), 11, 40).as("head"))
      Dedup.ngramContainment(heads.unionByName(quotes), "id", "head", k = 3,
          threshold = 0.9, maxGramFreq = Some(50))
        .select(col("id_a"), col("id_b"),
          PRound.pround(col("containment"), 4).as("containment"))
        .orderBy(col("id_a"), col("id_b"))
    },

    // LSH-bucketed candidate generation (two rotated 8-plane sign
    // bucketings, union of candidates) — the join key is the bucket,
    // never a constant, so pair expansion is bounded by bucket size.
    "dedup_embedding" -> { (s, dir) =>
      val e = Tables.embeddings(s, dir)
      val planes1 = e.filter(col("vec_id") < 8)
        .select(col("vec_id"), col("embedding"))
      val planes2 = e.filter(col("vec_id") >= 8 && col("vec_id") < 16)
        .select((col("vec_id") - 8).as("vec_id"), col("embedding"))
      Dedup.embeddingPairsLsh(plantedVecs(s, dir), "vec_id", "embedding", 0.99,
          Seq(planes1, planes2))
        .select(col("id_a"), col("id_b"), PRound.pround(col("cosine"), 4).as("cosine"))
        .orderBy(col("id_a"), col("id_b"))
    },

    // Semantic dedup (the SemDeDup shape): k-means cells bound the
    // pair expansion the way bands do for minhash — cluster the
    // embedding space with the seeded Lloyd quantizer, then exact
    // cosine pairs ONLY within a cell. Catches paraphrase-grade
    // duplicates whose token overlap is too low for minhash. The cell
    // cap (embeddingPairsBlocked's maxBlock) is the skew guard for a
    // degenerate centroid absorbing a constant-vector flood; the
    // oracle replays the identical cap so it stays exact even if a
    // cell ever outgrows it. Recall caveat by construction: a pair
    // straddling a cell boundary is lost (planted exact duplicates
    // have identical vectors, hence identical deterministic
    // assignments — always same-cell; CorpusRecallSpec pins that).
    "dedup_semantic" -> { (s, dir) =>
      val corpus = plantedVecs(s, dir)
      val anchors = Ann.kmeansAnchors(
        corpus.select(col("vec_id"), col("embedding")), k = 4, iters = 1).cache()
      val cells = Ann.assignCells(corpus, anchors)
      Dedup.embeddingPairsBlocked(cells, "vec_id", "embedding",
          threshold = 0.95, blockCol = "cell", maxBlock = Some(2000))
        .select(col("id_a"), col("id_b"), PRound.pround(col("cosine"), 4).as("cosine"))
        .orderBy(col("id_a"), col("id_b"))
    },

    // Near-dup pairs are transitive — connected components turns the
    // minhash pair list into per-document cluster labels (min id of
    // the component), the step a real dedup pipeline needs before it
    // can drop anything.
    "dedup_components" -> { (s, dir) =>
      val pairs = Dedup.minhashLsh(plantedDocs(s, dir), "id", "text")
      Components.connected(pairs, "id_a", "id_b")
        .select(col("node").as("id"), col("component"))
        .orderBy(col("id"))
    },

    // Near-dup cluster-size histogram — the dedup report a pipeline
    // publishes before applying drops: clusters per size (clustered
    // docs only; singletons never enter the pair graph). Two tiny
    // aggs over the component labels.
    "dedup_cluster_stats" -> { (s, dir) =>
      val pairs = Dedup.minhashLsh(plantedDocs(s, dir), "id", "text")
      Components.connected(pairs, "id_a", "id_b")
        .groupBy(col("component")).agg(count(lit(1)).as("cluster_size"))
        .groupBy(col("cluster_size")).agg(count(lit(1)).as("n_clusters"))
        .orderBy(col("cluster_size"))
    },

    // Fixed-point PageRank over the near-dup graph: integer-arithmetic
    // centrality (micro-units, `div`-based damping) — bit-identical on
    // any engine/partitioning, unlike a floating-point neighbor sum.
    "graph_pagerank" -> { (s, dir) =>
      val pairs = Dedup.minhashLsh(plantedDocs(s, dir), "id", "text")
      Components.pagerankFixed(pairs, "id_a", "id_b", iters = 2)
        .select(col("node").as("id"), col("pr"))
        .orderBy(col("id"))
    },

    // k-core (k=2) of the co-purchase graph: parts co-ordered at
    // least twice, iteratively peeled of degree-<2 whiskers to the
    // cohesive core. Fixpoint runs on Spark with a per-round
    // Materialize.cut; the oracle replays a FIXED 10 peels — peeling
    // is idempotent at fixpoint, so the converged result matches the
    // fixed-round replay exactly (10 > the 6-round worst case across
    // the three test scales).
    "graph_kcore" -> { (s, dir) =>
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      val a = li.select(col("ok"), col("pk").as("p1"))
      val b = li.select(col("ok"), col("pk").as("p2"))
      val edges = a.join(b, Seq("ok")).filter(col("p1") < col("p2"))
        .groupBy(col("p1"), col("p2")).agg(count(lit(1)).as("support"))
        .filter(col("support") >= 2)
        .select(col("p1"), col("p2"))
      Components.kCore(edges, "p1", "p2", k = 2)
        .orderBy(col("node"))
    },

    // Triangle count over a synthetic interaction graph (97 nodes,
    // pseudo-random edges from orders) — degree-ORIENTED wedge
    // counting, hub-safe at scale; the oracle counts the same
    // triangles with the plain a<b<c triple join.
    "graph_triangles" -> { (s, dir) =>
      val edges = Tables.orders(s, dir).select(
        (col("o_custkey") % 97).as("a"),
        ((col("o_custkey") * 7 + col("o_orderkey")) % 97).as("b"))
      Components.triangleCount(edges, "a", "b")
    },

    // Link prediction on the same synthetic graph: top-20
    // non-adjacent pairs by neighbor-Jaccard (the common-neighbors
    // recommender). Wedge join keyed on the middle node — see
    // Components.linkPredict for the hub-quadratic note.
    "graph_link_predict" -> { (s, dir) =>
      val edges = Tables.orders(s, dir).select(
        (col("o_custkey") % 97).as("a"),
        ((col("o_custkey") * 7 + col("o_orderkey")) % 97).as("b"))
      Components.linkPredict(edges, "a", "b", topK = 20)
    },

    // Label-propagation communities over the near-dup graph — the
    // deterministic (most-frequent-neighbor-label, min-label ties)
    // synchronous variant, FIXED 3 rounds so the unrolled oracle
    // replays the exact same trajectory (sync LPA can oscillate, so a
    // fixpoint test is unsafe — the kCore fixed-round discipline).
    // Per round one neighbor join + one (node, label) census, all
    // keyed on node id: linear in |E| per round at any scale.
    "graph_lpa" -> { (s, dir) =>
      val pairs = Dedup.minhashLsh(plantedDocs(s, dir), "id", "text")
      Components.labelPropagation(pairs, "id_a", "id_b", rounds = 3)
        .select(col("node").as("id"), col("label").as("community"))
        .orderBy(col("id"))
    },

    // Modularity Q of the LPA partition — the quality score that turns
    // "we found communities" into a measurable claim: Q = Σ_c (e_c/m −
    // (a_c/2m)²). All counts are exact integers; each community's term
    // is pre-rounded to 6 dp and summed as DECIMAL (the stats_anova
    // order-independence discipline). The pair frame is cut once —
    // LPA and the edge census share one materialization, not two
    // minhash chains.
    "graph_modularity" -> { (s, dir) =>
      val pairs = Materialize.cut(
        Dedup.minhashLsh(plantedDocs(s, dir), "id", "text"))
      val labels = Components.labelPropagation(pairs, "id_a", "id_b", rounds = 3)
      val canon = pairs
        .select(least(col("id_a"), col("id_b")).as("u"),
          greatest(col("id_a"), col("id_b")).as("v"))
        .filter(col("u") =!= col("v")).distinct()
      val mRow = canon.agg(count(lit(1)).cast("double").as("m"))
      val deg = canon.select(col("u").as("node"))
        .unionByName(canon.select(col("v").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("deg"))
      val intra = canon
        .join(labels.select(col("node").as("u"), col("label").as("lu")), Seq("u"))
        .join(labels.select(col("node").as("v"), col("label").as("lv")), Seq("v"))
        .filter(col("lu") === col("lv"))
        .groupBy(col("lu").as("community")).agg(count(lit(1)).as("e_c"))
      val degC = deg.join(labels, Seq("node"))
        .groupBy(col("label").as("community")).agg(sum(col("deg")).as("a_c"))
      degC.join(intra, Seq("community"), "left")
        .crossJoin(broadcast(mRow))
        .select(col("m"),
          PRound.pround(
            coalesce(col("e_c"), lit(0L)).cast("double") / col("m") -
              (col("a_c").cast("double") / (lit(2.0) * col("m"))) *
              (col("a_c").cast("double") / (lit(2.0) * col("m"))), 6).as("t"))
        .agg(count(lit(1)).as("n_communities"),
          max(col("m")).cast("long").as("m_edges"),
          sum(col("t").cast("decimal(28,6)")).cast("double").as("q"))
    },

    // Hashing-trick featurizer (the fixed-dim bag-of-words every
    // downstream trainer consumes WITHOUT a vocabulary broadcast —
    // feature hashing, Weinberger et al.): token → md5 byte → bucket
    // mod 64, with a SIGN from the adjacent nibble so collisions
    // cancel in expectation instead of biasing upward. Featurizes the
    // id%25 batch (the per-batch serving shape); one explode + one
    // (doc, bucket) map-side-combined agg — linear, zero vocabulary
    // state at any corpus size.
    "text_feature_hash" -> { (s, dir) =>
      val toks = Tables.documents(s, dir)
        .filter(col("doc_id") % 25 === 0)
        .select(col("doc_id"), explode(TextAnalysis.wsTokens(
          TextAnalysis.canonicalize(col("text")))).as("w"))
      val h = md5(col("w"))
      toks
        .select(col("doc_id"),
          (conv(substring(h, 31, 2), 16, 10).cast("long") % 64).as("bucket"),
          when(conv(substring(h, 30, 1), 16, 10).cast("long") % 2 === 0, 1L)
            .otherwise(-1L).as("sgn"))
        .groupBy(col("doc_id"), col("bucket"))
        .agg(sum(col("sgn")).as("feat"), count(lit(1)).as("n_tokens"))
        .orderBy(col("doc_id"), col("bucket"))
    },

    // The actual deduplicated corpus: keep the canonical (min-id)
    // member of every near-dup cluster, pass everything unclustered
    // through untouched.
    "dedup_apply" -> { (s, dir) =>
      val docs = plantedDocs(s, dir)
      val pairs = Dedup.minhashLsh(docs, "id", "text")
      val drops = Components.connected(pairs, "id_a", "id_b")
        .filter(col("node") =!= col("component"))
        .select(col("node").as("id"))
      docs.join(drops, Seq("id"), "left_anti")
        .select(col("id"), md5(col("text")).as("text_hash"))
        .orderBy(col("id"))
    },

    "ann_bruteforce" -> { (s, dir) =>
      val e = Tables.embeddings(s, dir)
      Ann.bruteForceTopK(e.filter(col("vec_id") >= 8), e.filter(col("vec_id") < 8), 5)
        .orderBy(col("query_id"), col("rk"))
    },

    // Metadata-FILTERED vector search: each query's top-5 among
    // corpus vectors sharing its label — the constrained serving
    // shape ("nearest in my tenant/language") every vector store
    // grows. Pre-filtering via the label equi-join, never the
    // recall-losing top-k-then-drop post-filter.
    "ann_filtered" -> { (s, dir) =>
      val e = Tables.embeddings(s, dir)
      Ann.filteredTopK(e.filter(col("vec_id") >= 8),
          e.filter(col("vec_id") < 8), "label", 5)
        .orderBy(col("query_id"), col("rk"))
    },

    "ann_ivf" -> { (s, dir) =>
      val e = Tables.embeddings(s, dir)
      Ann.ivfTopK(
          corpus = e.filter(col("vec_id") >= 16),
          queries = e.filter(col("vec_id") >= 8 && col("vec_id") < 16),
          anchors = e.filter(col("vec_id") < 8),
          k = 5)
        .orderBy(col("query_id"), col("rk"))
    },

    // LABEL-AWARE IVF (round 14, VERDICT r13 #5): the constrained
    // search at index scale — the label PREPENDS to the cell key, so
    // candidates join on (label, cell) and the predicate is enforced
    // by routing, never by the recall-losing top-k-then-drop
    // post-filter (plan-gated: no label filter above the candidate
    // join). One label-blind anchor geometry serves every stratum.
    "ann_filtered_ivf" -> { (s, dir) =>
      val e = Tables.embeddings(s, dir)
        .select(col("vec_id"), col("label"), col("embedding"))
      Ann.filteredIvfTopK(
          corpus = e.filter(col("vec_id") >= 16),
          queries = e.filter(col("vec_id") >= 8 && col("vec_id") < 16),
          anchors = e.filter(col("vec_id") < 8),
          filterCol = "label", k = 5)
        .orderBy(col("query_id"), col("rk"))
    },

    // Its recall gate vs the EXACT per-label sweep (filteredTopK is
    // the exact constrained search) — recall@5 per query, the number
    // a per-tenant index rollout watches; the only loss source is
    // cell routing (the label constraint itself is exact on both
    // sides).
    "ann_filtered_ivf_recall" -> { (s, dir) =>
      val e = Tables.embeddings(s, dir)
        .select(col("vec_id"), col("label"), col("embedding"))
      val corpus = e.filter(col("vec_id") >= 16)
      val qs = e.filter(col("vec_id") >= 8 && col("vec_id") < 16)
      val approx = Ann.filteredIvfTopK(corpus, qs,
          e.filter(col("vec_id") < 8), "label", 5)
        .select(col("query_id"), col("vec_id"))
      val exact = Ann.filteredTopK(corpus, qs, "label", 5)
        .select(col("query_id"), col("vec_id"))
      exact.join(approx.withColumn("hit", lit(1)),
          Seq("query_id", "vec_id"), "left")
        .groupBy(col("query_id"))
        .agg(count(col("hit")).as("n_hits"),
          PRound.pround(count(col("hit")) / lit(5.0), 4).as("recall_at_5"))
        .orderBy(col("query_id"))
    },

    // Recall@k CURVE (k = 1..5) of the IVF path vs exact — the full
    // tuning curve, not one point: rank-aware join of the two top-5
    // lists, then one conditional count per k over the tiny pair set
    // (k values broadcast). recall@k = |approx∩exact among top-k| /
    // (k·|queries|); k rows with no hits still report 0.
    "ann_recall_curve" -> { (s, dir) =>
      val e = Tables.embeddings(s, dir)
      val corpus = e.filter(col("vec_id") >= 16)
      val qs = e.filter(col("vec_id") >= 8 && col("vec_id") < 16)
      val anchors = e.filter(col("vec_id") < 8)
      val approx = Ann.ivfTopK(corpus, qs, anchors, 5)
        .select(col("query_id"), col("vec_id"), col("rk").as("rka"))
      val exact = Ann.bruteForceTopK(corpus, qs, 5)
        .select(col("query_id"), col("vec_id"), col("rk").as("rke"))
      val pairs = exact.join(approx, Seq("query_id", "vec_id"))
      val nq = exact.agg(countDistinct(col("query_id")).as("nq"))
      val ks = s.range(1, 6).select(col("id").cast("int").as("k"))
      val hits = pairs.crossJoin(broadcast(ks))
        .filter(col("rka") <= col("k") && col("rke") <= col("k"))
        .groupBy(col("k")).agg(count(lit(1)).as("h"))
      ks.join(hits, Seq("k"), "left")
        .crossJoin(broadcast(nq))
        .select(col("k"),
          PRound.pround(
            coalesce(col("h"), lit(0L)) / (col("k") * col("nq")), 4)
            .as("recall"))
        .orderBy(col("k"))
    },

    // Recall@5 of ann_ivf's candidate list vs the exact top-5 on the
    // SAME splits — the quality dial a vector-search rollout watches
    // (nprobe/cell-count tuning is a recall/cost trade). At corpus
    // scale the exact side runs over a SAMPLED query set; here the
    // 8-query set is the sample.
    "ann_recall" -> { (s, dir) =>
      val e = Tables.embeddings(s, dir)
      val corpus = e.filter(col("vec_id") >= 16)
      val queries = e.filter(col("vec_id") >= 8 && col("vec_id") < 16)
      val anchors = e.filter(col("vec_id") < 8)
      val approx = Ann.ivfTopK(corpus, queries, anchors, 5)
        .select(col("query_id"), col("vec_id"))
      val exact = Ann.bruteForceTopK(corpus, queries, 5)
        .select(col("query_id").as("eq"), col("vec_id").as("ev"))
      // left join + conditional count so a query with ZERO recalled
      // neighbors still reports a row (a semi-join would drop it)
      exact.join(approx,
          col("eq") === col("query_id") && col("ev") === col("vec_id"), "left")
        .groupBy(col("eq"))
        .agg(count(col("query_id")).as("n_hits"))
        .select(col("eq").as("query_id"), col("n_hits"),
          PRound.pround(col("n_hits") / 5.0, 4).as("recall_at_5"))
        .orderBy(col("query_id"))
    },

    // MRR@5 of ann_ivf vs the exact nearest neighbor — the THIRD eval
    // lens beside recall (set overlap) and NDCG (graded order): "at
    // what position does the TRUE nearest neighbor show up", the
    // metric that matches 1-answer retrieval serving. Reciprocal rank
    // is 0 when the exact top-1 misses the approx list entirely —
    // queries never drop (the exact side is the base). Same plan
    // budget as ann_recall.
    "ann_mrr" -> { (s, dir) =>
      val e = Tables.embeddings(s, dir)
      val corpus = e.filter(col("vec_id") >= 16)
      val queries = e.filter(col("vec_id") >= 8 && col("vec_id") < 16)
      val anchors = e.filter(col("vec_id") < 8)
      val approx = Ann.ivfTopK(corpus, queries, anchors, 5)
        .select(col("query_id"), col("vec_id"), col("rk"))
      val exact1 = Ann.bruteForceTopK(corpus, queries, 1)
        .select(col("query_id").as("eq"), col("vec_id").as("ev"))
      exact1.join(approx,
          col("eq") === col("query_id") && col("ev") === col("vec_id"),
          "left")
        .select(col("eq").as("query_id"),
          coalesce(col("rk").cast("long"), lit(0L)).as("rank_of_nn"),
          PRound.pround(coalesce(lit(1.0) / col("rk").cast("double"),
            lit(0.0)), 4).as("rr_at_5"))
        .orderBy(col("query_id"))
    },

    // NDCG@5 of ann_ivf's ranking vs the exact top-5 — recall's
    // POSITION-AWARE upgrade (recall says "found 4 of 5"; NDCG says
    // "and put the best one first"): graded relevance 6−exact_rank on
    // the approx list, DCG terms rel/log2(rank+1) pre-rounded to 6 dp
    // and summed as DECIMAL (order-independent), normalized by the
    // ideal DCG derived in-frame from the same per-term sequence so
    // both engines share every fp step. A query whose probe cell
    // returned NOTHING still reports ndcg=0 (exact side is the base,
    // the ann_recall left-join rule). | 100 TB: adds two broadcast-k
    // podium frames on top of the cell-keyed IVF join — the sampled
    // eval set is the scale story, as in ann_recall.
    "ann_ndcg" -> { (s, dir) =>
      val e = Tables.embeddings(s, dir)
      val corpus = e.filter(col("vec_id") >= 16)
      val queries = e.filter(col("vec_id") >= 8 && col("vec_id") < 16)
      val anchors = e.filter(col("vec_id") < 8)
      val approx = Ann.ivfTopK(corpus, queries, anchors, 5)
        .select(col("query_id"), col("vec_id"), col("rk"))
      val exact = Ann.bruteForceTopK(corpus, queries, 5)
        .select(col("query_id").as("eq"), col("vec_id").as("ev"),
          col("rk").as("erk"))
      val rel = approx.join(exact,
          col("eq") === col("query_id") && col("ev") === col("vec_id"), "left")
        .select(col("query_id"), col("rk"),
          coalesce(lit(6) - col("erk"), lit(0)).cast("double").as("rel"))
      def dcgTerm(relC: org.apache.spark.sql.Column,
                  rkC: org.apache.spark.sql.Column) =
        PRound.pround(relC / (log(rkC.cast("double") + lit(1.0)) /
          log(lit(2.0))), 6).cast("decimal(28,6)")
      val perQ = rel.groupBy(col("query_id"))
        .agg(sum(dcgTerm(col("rel"), col("rk"))).as("dcg"))
      val ideal = s.range(1, 6)
        .select(dcgTerm((lit(6) - col("id")).cast("double"), col("id")).as("t"))
        .agg(sum(col("t")).as("idcg"))
      val base = exact.select(col("eq").as("query_id")).distinct()
      base.join(perQ, Seq("query_id"), "left")
        .crossJoin(broadcast(ideal))
        .select(col("query_id"),
          coalesce(col("dcg").cast("double"), lit(0.0)).as("dcg"),
          PRound.pround(coalesce(col("dcg").cast("double"), lit(0.0)) /
            col("idcg").cast("double"), 4).as("ndcg_at_5"))
        .orderBy(col("query_id"))
    },

    // IVF with a real coarse quantizer: deterministic seeded k-means
    // (2 Lloyd iterations over the corpus, 8 cells) replaces the
    // first-k-vectors placeholder; the oracle replays the identical
    // iterations.
    // Incremental index maintenance — the daily-batch ANN topology:
    // the quantizer is FIXED (the "loaded from QuantizerStore" role —
    // training it is ann_ivf_kmeans's job), the historical corpus
    // stripe plays the persisted postings table, and ONLY the delta
    // stripe is routed before the two posting sets union. At 100 TB
    // this is the whole point of IVF ingest: the day's routing cost is
    // |delta| × |cells| map-side work, the index is append-only, and
    // search (ivfTopKAssigned) never re-routes the corpus. The oracle
    // routes EVERYTHING in one pass with the same anchors — equality
    // is the split-route-union ≡ single-pass proof (same contract
    // shape as filter_domains vs filter_domains_scaled).
    "ann_incremental" -> { (s, dir) =>
      val e = Tables.embeddings(s, dir)
      val anchors = e.filter(col("vec_id") < 8)
      val hist  = e.filter(col("vec_id") >= 16 && pmod(col("vec_id"), lit(10)) < 8)
      val delta = e.filter(col("vec_id") >= 16 && pmod(col("vec_id"), lit(10)) >= 8)
      val qs = e.filter(col("vec_id") >= 8 && col("vec_id") < 16)
      val postings = Ann.assignCells(hist, anchors)
        .unionByName(Ann.assignCells(delta, anchors))
      Ann.ivfTopKAssigned(postings, qs, anchors, 5)
        .orderBy(col("query_id"), col("rk"))
    },

    "ann_ivf_kmeans" -> { (s, dir) =>
      val e = Tables.embeddings(s, dir)
      val corpus = e.filter(col("vec_id") >= 16).select(col("vec_id"), col("embedding"))
      val queries = e.filter(col("vec_id") >= 8 && col("vec_id") < 16)
        .select(col("vec_id"), col("embedding"))
      // cache: the quantizer output (8 tiny centroid rows) is consumed
      // by BOTH the corpus and the query assignment — uncached, the
      // whole 2-iteration training chain would run twice.
      val anchors = Ann.kmeansAnchors(corpus, k = 8, iters = 2).cache()
      Ann.ivfTopK(corpus, queries, anchors, 5)
        .orderBy(col("query_id"), col("rk"))
    },

    // IVF cell-balance report — the load dial an IVF rollout watches:
    // skewed cells turn nprobe routing into hotspots (one cell absorbs
    // the scan volume) and starve recall in the thin ones. One
    // assignment pass + a |cells|-row aggregation; share via an
    // unbounded window over the tiny counts table.
    "ann_cell_balance" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val e = Tables.embeddings(s, dir)
      val corpus = e.filter(col("vec_id") >= 16).select(col("vec_id"), col("embedding"))
      val anchors = Ann.kmeansAnchors(corpus, k = 4, iters = 1)
      val totW = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      Ann.assignCells(corpus, anchors)
        .groupBy(col("cell")).agg(count(lit(1)).as("n_vecs"))
        .withColumn("share", PRound.pround(
          col("n_vecs").cast("double") /
            sum(col("n_vecs")).over(totW).cast("double"), 4))
        .orderBy(col("cell"))
    },

    // Multi-probe IVF: each query searches its 2 nearest cells via the
    // custom TopKPerKey operator (no window sort on the probe ranking).
    "ann_ivf_nprobe2" -> { (s, dir) =>
      val e = Tables.embeddings(s, dir)
      Ann.ivfTopKNprobe(
          corpus = e.filter(col("vec_id") >= 16),
          queries = e.filter(col("vec_id") >= 8 && col("vec_id") < 16),
          anchors = e.filter(col("vec_id") < 8),
          k = 5, nprobe = 2)
        .orderBy(col("query_id"), col("rk"))
    },

    // Radius search through the same 2-probe IVF routing: every
    // corpus vector with cosine ≥ 0.2 of each query — the
    // variable-yield twin of the fixed-k queries above.
    "ann_range_search" -> { (s, dir) =>
      val e = Tables.embeddings(s, dir)
      Ann.rangeSearch(
          corpus = e.filter(col("vec_id") >= 16),
          queries = e.filter(col("vec_id") >= 8 && col("vec_id") < 16),
          anchors = e.filter(col("vec_id") < 8),
          minCos = 0.2, nprobe = 2)
        .orderBy(col("query_id"), col("vec_id"))
    },

    // Recall gate for the radius search: of ALL true neighbors
    // within θ (exact broadcast sweep), the fraction the 2-probe IVF
    // routing returned — the same audit discipline every top-k
    // variant carries, applied to the variable-yield operator.
    "ann_range_recall" -> { (s, dir) =>
      val e = Tables.embeddings(s, dir)
      val corpus = e.filter(col("vec_id") >= 16)
        .select(col("vec_id"), col("embedding").as("cv"))
      val qs = e.filter(col("vec_id") >= 8 && col("vec_id") < 16)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      val truth = corpus.crossJoin(broadcast(qs))
        .filter(col("vec_id") =!= col("query_id"))
        .filter(PRound.pround(
          graft.functions.VectorFns.cosine(col("qv"), col("cv")), 6) >= 0.2)
        .select(col("query_id").as("tq"), col("vec_id").as("tv"))
      val approx = Ann.rangeSearch(
          corpus = e.filter(col("vec_id") >= 16),
          queries = e.filter(col("vec_id") >= 8 && col("vec_id") < 16),
          anchors = e.filter(col("vec_id") < 8),
          minCos = 0.2, nprobe = 2)
        .select(col("query_id"), col("vec_id"))
      truth.join(approx,
          col("tq") === col("query_id") && col("tv") === col("vec_id"), "left")
        .groupBy(col("tq"))
        .agg(count(lit(1)).as("n_true"), count(col("query_id")).as("n_hit"))
        .select(col("tq").as("query_id"), col("n_true"), col("n_hit"),
          PRound.pround(col("n_hit").cast("double") / col("n_true"), 4)
            .as("recall"))
        .orderBy(col("query_id"))
    },

    "ann_lsh" -> { (s, dir) =>
      val e = Tables.embeddings(s, dir)
      Ann.lshTopK(
          corpus = e.filter(col("vec_id") >= 16),
          queries = e.filter(col("vec_id") >= 8 && col("vec_id") < 16),
          planes = e.filter(col("vec_id") < 8),
          k = 5)
        .orderBy(col("query_id"), col("rk"))
    },

    // Matryoshka truncation curve (Kusupati et al., NeurIPS 2022 —
    // the MRL evaluation every embedding rollout runs before serving
    // truncated vectors): recall@5 of brute-force search on the FIRST
    // d dimensions (d = 8/16/32/64) vs the full-dim exact top-5. The
    // dimension that first clears the recall bar is the serving dim —
    // a 8× cheaper index if 8 dims suffice. Four sliced searches
    // union into one frame; each is the broadcast-queries shape, the
    // corpus never shuffles.
    "emb_matryoshka" -> { (s, dir) =>
      val e = Tables.embeddings(s, dir)
      val corpus = e.filter(col("vec_id") >= 16)
      val qs = e.filter(col("vec_id") >= 8 && col("vec_id") < 16)
      val exact = Ann.bruteForceTopK(corpus, qs, 5)
        .select(col("query_id").as("eq"), col("vec_id").as("ev"))
      val truncated = Seq(8, 16, 32, 64).map { d =>
        Ann.bruteForceTopK(
            corpus.select(col("vec_id"),
              slice(col("embedding"), 1, d).as("embedding")),
            qs.select(col("vec_id"),
              slice(col("embedding"), 1, d).as("embedding")), 5)
          .select(lit(d).as("d"), col("query_id"), col("vec_id"))
      }.reduce(_ unionByName _)
      val nq = exact.agg(countDistinct(col("eq")).as("nq"))
      truncated
        .join(exact, col("query_id") === col("eq") &&
          col("vec_id") === col("ev"), "left")
        .groupBy(col("d"))
        .agg(count(col("ev")).as("n_hits"))
        .crossJoin(broadcast(nq))
        .select(col("d"), col("n_hits"),
          PRound.pround(col("n_hits").cast("double") / (col("nq") * 5), 4)
            .as("recall_at_5"))
        .orderBy(col("d"))
    },

    // Scalar quantization (SQ8) — the training-free compression
    // family next to PQ/OPQ: per-dim 8-bit codes against corpus
    // min/max, integer-L2 ranking in code space (operators.Ann
    // sq8TopK; the quantizer is ONE row of per-dim bounds).
    "ann_sq8" -> { (s, dir) =>
      val e = Tables.embeddings(s, dir)
      Ann.sq8TopK(
          corpus = e.filter(col("vec_id") >= 16),
          queries = e.filter(col("vec_id") >= 8 && col("vec_id") < 16),
          k = 5)
        .orderBy(col("query_id"), col("rk"))
    },

    // The SQ8 recall gate vs exact top-5 — the eval every compressed
    // index variant in this file carries (PQ/OPQ/IVF-PQ/LSH/HNSW
    // discipline).
    "ann_sq8_recall" -> { (s, dir) =>
      annRecall(queries("ann_sq8")(s, dir), s, dir)
    },

    // SQ8 SERVED from the store (the ann_ivfpq_stored topology on the
    // scalar quantizer): the one-row (mns, mxs) bounds frame is built
    // at most once per dataset generation into the DatasetCache and
    // every search run reads it back — the serve plan carries ZERO
    // corpus-wide min/max aggregation (codes are map-side under the
    // broadcast stats row). Stored bounds are bit-identical to the
    // fresh build, so the shared ann_sq8 oracle proves serve ≡ build.
    "ann_sq8_stored" -> { (s, dir) =>
      val e = Tables.embeddings(s, dir)
      val corpus = e.filter(col("vec_id") >= 16)
        .select(col("vec_id"), col("embedding"))
      val qs = e.filter(col("vec_id") >= 8 && col("vec_id") < 16)
        .select(col("vec_id"), col("embedding"))
      val store = graft.sources.DatasetCache.getOrBuild(
          dir, Seq("embeddings.parquet"), "sq8_minmax_6dp") { path =>
        Ann.sq8Stats(corpus).write.mode("overwrite").parquet(s"$path/stats")
      }
      Ann.sq8TopKWith(corpus, qs, s.read.parquet(s"$store/stats"), k = 5)
        .orderBy(col("query_id"), col("rk"))
    },

    // Product quantization ADC: 64-dim vectors → 4 subspace codes
    // (16× compression), per-subspace seeded-k-means codebooks
    // (1 Lloyd iteration, 4 codewords), lookup-table scoring against
    // the reconstructed vectors. The oracle replays training, encoding
    // and the fixed-order ADC sum.
    "ann_pq" -> { (s, dir) =>
      val e = Tables.embeddings(s, dir)
      val corpus = e.filter(col("vec_id") >= 16).select(col("vec_id"), col("embedding"))
      val queries = e.filter(col("vec_id") >= 8 && col("vec_id") < 16)
        .select(col("vec_id"), col("embedding"))
      // cache: the trained codebooks (16 tiny rows) feed encoding, the
      // codeword-norm table, and the query lookup table
      val cb = graft.operators.Pq.codebooks(corpus, m = 4, subDim = 16,
        k = 4, iters = 1).cache()
      graft.operators.Pq.adcTopK(corpus, queries, cb, m = 4, subDim = 16, k = 5)
        .orderBy(col("query_id"), col("rk"))
    },

    // OPQ-style PQ (VERDICT r11 #7 stretch): a variance-balanced
    // SNAKE permutation of the dimensions (the deterministic rotation
    // surrogate — permutations are orthogonal, so ADC scores keep
    // their meaning) is applied before codebook training, un-hoarding
    // the high-variance dims from any single subspace. Same chain as
    // ann_pq otherwise; ann_opq_recall quantifies the gain against
    // ann_pq_recall on the shared exact top-5.
    "ann_opq" -> { (s, dir) =>
      val e = Tables.embeddings(s, dir)
      val corpus = e.filter(col("vec_id") >= 16).select(col("vec_id"), col("embedding"))
      val qs = e.filter(col("vec_id") >= 8 && col("vec_id") < 16)
        .select(col("vec_id"), col("embedding"))
      val perm = graft.operators.Pq.varianceSnakePerm(corpus, m = 4).cache()
      val pc = graft.operators.Pq.permute(corpus, perm)
      val pqs = graft.operators.Pq.permute(qs, perm)
      val cb = graft.operators.Pq.codebooks(pc, m = 4, subDim = 16,
        k = 4, iters = 1).cache()
      graft.operators.Pq.adcTopK(pc, pqs, cb, m = 4, subDim = 16, k = 5)
        .orderBy(col("query_id"), col("rk"))
    },

    // IVF-PQ — the production vector-search composition: seeded-k-means
    // coarse quantizer (4 cells, 1 Lloyd iteration) routes vectors to
    // cells; PQ encodes RESIDUALS (vector − centroid) with a codebook
    // shared across cells (4 subspaces × 4 codewords, 1 iteration);
    // queries probe their 2 nearest cells; ADC scores decompose as
    // dot(q,c) + Σ_s LUT lookups. The oracle replays the whole chain.
    "ann_ivfpq" -> { (s, dir) =>
      val e = Tables.embeddings(s, dir)
      val corpus = e.filter(col("vec_id") >= 16).select(col("vec_id"), col("embedding"))
      val queries = e.filter(col("vec_id") >= 8 && col("vec_id") < 16)
        .select(col("vec_id"), col("embedding"))
      // cache: the coarse quantizer feeds routing (corpus + queries),
      // the residual chain, and every norm/LUT table; the codebooks
      // feed encoding plus the correction and query lookup tables.
      val anchors = Ann.kmeansAnchors(corpus, k = 4, iters = 1).cache()
      val cb = graft.operators.Pq.codebooks(
        graft.operators.Pq.residuals(corpus, anchors).select("vec_id", "embedding"),
        m = 4, subDim = 16, k = 4, iters = 1).cache()
      graft.operators.Pq.ivfPqTopK(corpus, queries, anchors, cb,
          m = 4, subDim = 16, k = 5, nprobe = 2)
        .orderBy(col("query_id"), col("rk"))
    },

    // Two-stage serving: IVF-PQ nominates top-10 ADC candidates, the
    // exact cosine of just those 10 true vectors re-ranks to the final
    // top-5 — the standard production topology (compressed index for
    // the sweep, exact math for the podium). The corpus never
    // shuffles: candidates and query vectors both broadcast into the
    // fetch (Ann.rerankTopK). Recall vs plain ADC at equal k is
    // gated ≥ in RetrievalSpec and measured by ann_ivfpq_rerank_recall.
    "ann_ivfpq_rerank" -> { (s, dir) =>
      val e = Tables.embeddings(s, dir)
      val corpus = e.filter(col("vec_id") >= 16).select(col("vec_id"), col("embedding"))
      val queries = e.filter(col("vec_id") >= 8 && col("vec_id") < 16)
        .select(col("vec_id"), col("embedding"))
      val anchors = Ann.kmeansAnchors(corpus, k = 4, iters = 1).cache()
      val cb = graft.operators.Pq.codebooks(
        graft.operators.Pq.residuals(corpus, anchors).select("vec_id", "embedding"),
        m = 4, subDim = 16, k = 4, iters = 1).cache()
      val cands = graft.operators.Pq.ivfPqTopK(corpus, queries, anchors, cb,
        m = 4, subDim = 16, k = 10, nprobe = 2)
      Ann.rerankTopK(cands, corpus, queries, k = 5)
        .orderBy(col("query_id"), col("rk"))
    },

    "ann_ivfpq_rerank_recall" -> { (s, dir) =>
      annRecall(queries("ann_ivfpq_rerank")(s, dir), s, dir)
    },

    // STORE-SERVED IVF-PQ — the production train-once/serve-many
    // topology the in-query demos above deliberately re-train per run
    // (their job is oracle-replaying the training chain): anchors and
    // codebooks train ONCE per dataset generation and persist via
    // operators.QuantizerStore at a content-keyed path
    // (sources.DatasetCache — regenerating the dataset invalidates the
    // key; concurrent first runs are lock-gated), and the SERVE side
    // reloads them as two broadcast-size parquet scans: zero Lloyd
    // iterations in the serve plan (plan-gated in PlanShapeSpec — no
    // aggregate anywhere upstream of the anchors/codebooks inputs).
    // kmeansAnchors/codebooks round training means to 6 dp, which
    // round-trips parquet bit-exactly, so the oracle is ann_ivfpq's
    // own full-chain replay: equality is the persist→reload→search
    // round-trip proof.
    "ann_ivfpq_stored" -> { (s, dir) =>
      val e = Tables.embeddings(s, dir)
      val corpus = e.filter(col("vec_id") >= 16).select(col("vec_id"), col("embedding"))
      val qs = e.filter(col("vec_id") >= 8 && col("vec_id") < 16)
        .select(col("vec_id"), col("embedding"))
      val store = graft.sources.DatasetCache.getOrBuild(
          dir, Seq("embeddings.parquet"), "ivfpq_quantizer") { path =>
        val anchors = Ann.kmeansAnchors(corpus, k = 4, iters = 1).cache()
        val cb = graft.operators.Pq.codebooks(
          graft.operators.Pq.residuals(corpus, anchors).select("vec_id", "embedding"),
          m = 4, subDim = 16, k = 4, iters = 1)
        graft.operators.QuantizerStore.save(anchors, cb, path)
        anchors.unpersist()
      }
      graft.operators.Pq.ivfPqTopK(corpus, qs,
          graft.operators.QuantizerStore.loadAnchors(s, store),
          graft.operators.QuantizerStore.loadCodebooks(s, store),
          m = 4, subDim = 16, k = 5, nprobe = 2)
        .orderBy(col("query_id"), col("rk"))
    },

    // IVF-PQ with SAMPLED training — the 100 TB shape: anchors and
    // codebooks train on a deterministic ~50% Bernoulli sample
    // (Sampling.bernoulli, md5-slot keyed) while the FULL corpus is
    // routed and encoded. One-line composition of verified pieces;
    // at real scale the sample rate drops to permyriad single digits
    // and training cost decouples from corpus size entirely.
    "ann_ivfpq_sampled" -> { (s, dir) =>
      val e = Tables.embeddings(s, dir)
      val corpus = e.filter(col("vec_id") >= 16).select(col("vec_id"), col("embedding"))
      val queries = e.filter(col("vec_id") >= 8 && col("vec_id") < 16)
        .select(col("vec_id"), col("embedding"))
      val train = graft.operators.Sampling.bernoulli(corpus, "vec_id", permyriad = 5000)
      val anchors = Ann.kmeansAnchors(train, k = 4, iters = 1).cache()
      val cb = graft.operators.Pq.codebooks(
        graft.operators.Pq.residuals(train, anchors).select("vec_id", "embedding"),
        m = 4, subDim = 16, k = 4, iters = 1).cache()
      graft.operators.Pq.ivfPqTopK(corpus, queries, anchors, cb,
          m = 4, subDim = 16, k = 5, nprobe = 2)
        .orderBy(col("query_id"), col("rk"))
    },

    // Recall gate for the sampled-training path: quantifies what the
    // 50% training sample costs in recall@5 vs exact — the dial that
    // justifies (or vetoes) shrinking the training read at 100 TB.
    "ann_ivfpq_sampled_recall" -> { (s, dir) =>
      annRecall(queries("ann_ivfpq_sampled")(s, dir), s, dir)
    },

    // Diversity-aware subsampling — the curation move that keeps a
    // shrunken corpus REPRESENTATIVE instead of i.i.d.: partition the
    // embedding space by LSH sign-bucket, then take a deterministic
    // per-bucket quota (md5-ranked). A uniform sample follows the
    // density and starves sparse regions; the quota caps dense ones.
    // Composition of two verified pieces (Ann.lshBucket +
    // Sampling.stratifiedK) — shuffle keyed on the bucket.
    "sample_diverse" -> { (s, dir) =>
      val e = Tables.embeddings(s, dir)
      val planes = e.filter(col("vec_id") < 4)
      val corpus = e.filter(col("vec_id") >= 8)
        .select(col("vec_id"), col("embedding"))
      val bucketed = Ann.lshBucket(corpus, planes)
        .select(col("vec_id"), col("bucket"))
      graft.operators.Sampling.stratifiedK(bucketed, Seq("bucket"), "vec_id", k = 4)
        .select(col("bucket"), col("vec_id"))
        .orderBy(col("bucket"), col("vec_id"))
    },

    // Recall gates for the COMPRESSED ANN paths (the round-5 gap:
    // ann_recall covered plain IVF only, so PQ / IVF-PQ / LSH shipped
    // without the dial a rollout tunes m/nprobe/bands against). Same
    // left-join + conditional-count shape as ann_recall, so zero-
    // recall queries still report a row.
    "ann_pq_recall" -> { (s, dir) =>
      annRecall(queries("ann_pq")(s, dir), s, dir)
    },

    "ann_ivfpq_recall" -> { (s, dir) =>
      annRecall(queries("ann_ivfpq")(s, dir), s, dir)
    },

    "ann_opq_recall" -> { (s, dir) =>
      annRecall(queries("ann_opq")(s, dir), s, dir)
    },

    "ann_lsh_recall" -> { (s, dir) =>
      annRecall(queries("ann_lsh")(s, dir), s, dir)
    },

    // Hard-negative mining (VERDICT r10 #5): per query, the top-5
    // nearest corpus vectors with a DIFFERENT label — the contrastive
    // training shape ("close but wrong"). LSH-bucketed candidate join
    // (knnGraph's scheme) + the inverse of ann_filtered's label
    // predicate; never corpus×queries.
    "ann_hard_negatives" -> { (s, dir) =>
      val e = Tables.embeddings(s, dir)
      Ann.hardNegatives(
          corpus = e.filter(col("vec_id") >= 16),
          queries = e.filter(col("vec_id") >= 8 && col("vec_id") < 16),
          planes = e.filter(col("vec_id") < 8),
          labelCol = "label", k = 5)
        .orderBy(col("query_id"), col("rk"))
    },

    // Recall@5 of the bucketed miner vs the exact different-label
    // sweep — the standard rollout dial (annRecall's left-join +
    // conditional-count shape, but the exact side carries the same
    // label-difference predicate, so the gate measures bucketing
    // loss, not filter loss).
    "ann_hard_negatives_recall" -> { (s, dir) =>
      val e = Tables.embeddings(s, dir)
      val corpus = e.filter(col("vec_id") >= 16)
      val qs = e.filter(col("vec_id") >= 8 && col("vec_id") < 16)
      val approx = queries("ann_hard_negatives")(s, dir)
        .select(col("query_id"), col("vec_id"))
      Ann.hardNegativesExact(corpus, qs, "label", 5)
        .select(col("query_id").as("eq"), col("vec_id").as("ev"))
        .join(approx,
          col("eq") === col("query_id") && col("ev") === col("vec_id"), "left")
        .groupBy(col("eq"))
        .agg(count(col("query_id")).as("n_hits"))
        .select(col("eq").as("query_id"), col("n_hits"),
          PRound.pround(col("n_hits") / 5.0, 4).as("recall_at_5"))
        .orderBy(col("query_id"))
    },

    // The canonical training-data curation chain as ONE query:
    // exact dedup (keep min id per content hash) → quality floor →
    // language filter. Composition of the verified pieces — what a
    // corpus pipeline actually ships.
    "corpus_curate" -> { (s, dir) =>
      val docs = plantedDocs(s, dir)
      val keep = docs.groupBy(md5(col("text")).as("h"))
        .agg(min(col("id")).as("id"))
        .select(col("id"))
      val t = col("text")
      docs.join(keep, "id")
        .select(col("id"),
          TextAnalysis.langId(t).as("lang"),
          TextAnalysis.qualityScore(t).as("quality"))
        .filter(col("quality") >= 0.5 && col("lang") === "en")
        .orderBy(col("id"))
    },

    // Bigram LM score — the perplexity-filter shape of corpus
    // curation: per-doc mean log P(w2|w1) under corpus-level bigram
    // MLE counts. Per-bigram log-probs round to 6 dp and sum over the
    // SORTED list (aggregate HOF), so the mean is reproducible across
    // engines despite float summation-order sensitivity.
    "text_lm_score" -> { (s, dir) =>
      val docs = Tables.documents(s, dir).select(col("doc_id"),
        TextAnalysis.wsTokens(TextAnalysis.canonicalize(col("text"))).as("toks"))
      val n = size(col("toks"))
      val bigrams = docs.filter(n >= 2)
        .select(col("doc_id"),
          explode(zip_with(
            slice(col("toks"), lit(1), n - 1),
            slice(col("toks"), lit(2), n - 1),
            (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
        .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      val uni = docs.select(explode(col("toks")).as("w1"))
        .groupBy(col("w1")).agg(count(lit(1)).as("c1"))
      val bi = bigrams.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
      bigrams
        .join(bi, Seq("w1", "w2"))
        .join(uni, Seq("w1"))
        .select(col("doc_id"),
          PRound.pround(log(col("c2").cast("double") / col("c1")), 6).as("lp"))
        .groupBy(col("doc_id"))
        .agg(sort_array(collect_list(col("lp"))).as("lps"))
        .select(col("doc_id"),
          PRound.pround(
            aggregate(col("lps"), lit(0.0), (a, x) => a + x) / size(col("lps")),
            4).as("lm_score"))
        .orderBy(col("doc_id"))
    },

    // Min-K% Prob membership score (Shi et al., ICLR 2024 — "Detecting
    // Pretraining Data from Large Language Models"): a doc whose
    // LOWEST-probability tokens are still probable under a reference
    // LM was likely seen in training — score = mean cost of the top
    // 20% highest-cost tokens (k = ceil(0.2·n)). Reference LM: the
    // corpus-level add-one unigram in integer micro-nats (the
    // NaiveBayes/DSIR cost discipline), so the per-token costs are
    // BIGINTs and the top-k SUM is tie-invariant — rows tied at the k
    // boundary carry equal costs, so row_number's arbitrary tie order
    // cannot change the answer. Scale shape: the cost table is
    // vocabulary-sized and BROADCAST onto the exploded token stream
    // (the KN lesson: broadcast-hash-join, never a one-row map fold —
    // map element_at is a linear scan); the only corpus-sized shuffle
    // keys on doc_id for the per-doc window.
    "lm_mink_score" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val occ = Tables.documents(s, dir).select(col("doc_id"),
          explode(TextAnalysis.wsTokens(
            TextAnalysis.canonicalize(col("text")))).as("w"))
      val census = occ.groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      val tots = census.agg(sum(col("cnt")).as("tot"), count(lit(1)).as("v"))
      val cost = census.crossJoin(broadcast(tots))
        .select(col("w"),
          PRound.pround(-log((col("cnt") + 1).cast("double") /
            (col("tot") + col("v")).cast("double")) * 1e6, 0)
            .cast("long").as("c"))
      val byDoc = Window.partitionBy(col("doc_id"))
      val ranked = occ.join(broadcast(cost), Seq("w"))
        .withColumn("rk", row_number().over(byDoc.orderBy(col("c").desc)))
        .withColumn("n", count(lit(1)).over(byDoc))
      ranked.filter(col("rk") <= ceil(col("n") * 0.2))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("k"), sum(col("c")).as("mink_cost"))
        .select(col("doc_id"), col("k"), col("mink_cost"),
          PRound.pround(
            col("mink_cost").cast("double") / col("k") / lit(1e6), 6)
            .as("mink_nats"))
        .orderBy(col("doc_id"))
    },

    // tf-idf: classic corpus term weighting; the per-document top-3
    // ranking runs on the custom TopKPerKey operator (string
    // tie-break), not a window sort.
    "text_tfidf" -> { (s, dir) =>
      val docs = Tables.documents(s, dir).select(col("doc_id"),
        TextAnalysis.wsTokens(TextAnalysis.canonicalize(col("text"))).as("toks"))
      val tf = docs.select(col("doc_id"), explode(col("toks")).as("term"))
        .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val total = Tables.documents(s, dir).agg(count(lit(1)).as("n_docs"))
      val scored = tf.join(dfreq, "term").crossJoin(broadcast(total))
        .select(col("doc_id"), col("term"),
          PRound.pround(col("tf") * log(col("n_docs").cast("double") / col("df")), 6)
            .as("score"))
      graft.operators.TopK.perKey(scored, Seq("doc_id"), "score", "term", 3)
        .orderBy(col("doc_id"), col("score").desc, col("term"))
    },

    // Symmetric int8 embedding quantization — the storage-scale path
    // for a 100 TB embedding corpus (4x smaller, dot products in
    // int). floor(x/scale + 0.5) is engine-portable; checksum + max
    // reconstruction error prove the round-trip.
    "emb_quantize" -> { (s, dir) =>
      val v = col("embedding")
      Tables.embeddings(s, dir)
        .withColumn("scale",
          array_max(transform(v, x => abs(x.cast("double")))) / lit(127.0))
        .withColumn("q", transform(v,
          x => floor(x.cast("double") / col("scale") + 0.5).cast("int")))
        // err computed BEFORE the select: aliasing the rounded scale
        // as "scale" in the same select list would lateral-alias-
        // shadow the raw scale inside the zip_with lambda
        .withColumn("err", array_max(zip_with(v, col("q"),
          (x, q) => abs(x.cast("double") - q * col("scale")))))
        .select(col("vec_id"), PRound.pround(col("scale"), 6).as("scale"),
          aggregate(col("q"), lit(0L), (a, x) => a + x.cast("long")).as("q_sum"),
          PRound.pround(col("err"), 6).as("max_err"))
        .orderBy(col("vec_id"))
    },

    "text_langid" -> { (s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"),
          TextAnalysis.langId(col("text")).as("pred"))
        .withColumn("correct", (col("lang") === col("pred")).cast("int"))
        .orderBy(col("doc_id"))
    },

    // The langid gate's per-class eval — the quality_nb_eval confusion
    // machinery on the language classifier: text_langid gives per-doc
    // predictions against the table's ground-truth lang; this
    // collapses them through ONE ≤|langs|²-row (lang, pred) census,
    // then per-class tp/fp/fn and precision/recall/F1 (the tie-free
    // 2·tp/(2·tp+fp+fn) form, rounded once). The census fan-out runs
    // on a broadcast-sized frame — the corpus is scanned once.
    "langid_eval" -> { (s, dir) =>
      import s.implicits._
      val cells = Tables.documents(s, dir)
        // langIdHof: the let-bound scores measured 1.30× on this
        // census input (r16 driver bench) — the single-column
        // projection loses less to interpreted eval than it gains
        // halving the regexp passes
        .select(col("lang"), TextAnalysis.langIdHof(col("text")).as("pred"))
        .groupBy(col("lang"), col("pred")).agg(count(lit(1)).as("n"))
      val langs = TextAnalysis.langMarkers.map(_._1)
      cells.crossJoin(broadcast(langs.toDF("cls")))
        .groupBy(col("cls"))
        .agg(
          sum(when(col("lang") === col("cls") && col("pred") === col("cls"),
            col("n")).otherwise(0L)).as("tp"),
          sum(when(col("lang") =!= col("cls") && col("pred") === col("cls"),
            col("n")).otherwise(0L)).as("fp"),
          sum(when(col("lang") === col("cls") && col("pred") =!= col("cls"),
            col("n")).otherwise(0L)).as("fn"))
        .select(col("cls"), col("tp"), col("fp"), col("fn"),
          PRound.pround(when(col("tp") + col("fp") > 0,
            col("tp").cast("double") / (col("tp") + col("fp")))
            .otherwise(lit(0.0)), 6).as("prec"),
          PRound.pround(when(col("tp") + col("fn") > 0,
            col("tp").cast("double") / (col("tp") + col("fn")))
            .otherwise(lit(0.0)), 6).as("rec"),
          PRound.pround(when(lit(2L) * col("tp") + col("fp") + col("fn") > 0,
            lit(2.0) * col("tp") /
              (lit(2L) * col("tp") + col("fp") + col("fn")))
            .otherwise(lit(0.0)), 6).as("f1"))
        .orderBy(col("cls"))
    },

    // MODEL-BASED language ID, train leg (VERDICT r13 #2 — the real
    // fastText shape, replacing nothing: the marker heuristic stays
    // as text_langid's zero-shot baseline): hashed char-trigram
    // features (the text_feature_hash / DSIR md5-bucket idiom — 256
    // buckets, no vocabulary state at any corpus size) feed the
    // NaiveBayes trainer in integer micro-nats, teacher = the table's
    // ground-truth lang column, trained on the hash-split 80% so the
    // held-out eval is honest. Census-bounded: the model is ≤ 5·256
    // cost rows + priors — a trivially broadcastable artifact.
    "langid_nb_train" -> { (s, dir) =>
      NaiveBayes.train(langidTrainDocs(s, dir), labelCol = "lang",
          tokensCol = "feats")
        .orderBy(col("label"), col("token"))
    },

    // Apply leg: the 5-class model rides ONE broadcast row of
    // bucket→cost maps; each document folds its own trigram-bucket
    // features — integer adds, argmin pred with the fixed
    // lexicographic tie-break, zero shuffle on the corpus.
    "langid_nb_apply" -> { (s, dir) =>
      // featurize ONCE (r16): the train slice and the scored corpus
      // both consume the 128-md5-per-doc featurize; a lineage cut of
      // the small (doc_id, lang, feats) frame replaces the second
      // full featurize pass with a checkpoint scan
      val fd = graft.operators.Materialize.cut(langidFeatDocs(s, dir)
        .select(col("doc_id"), col("lang"), col("feats")))
      val params = NaiveBayes.broadcastParams(
        NaiveBayes.train(trainSlice(fd), labelCol = "lang",
          tokensCol = "feats"), langidLangs)
      NaiveBayes.score(fd, params, langidLangs, tokensCol = "feats")
        .select(col("doc_id") +: col("lang") +: col("pred") +:
          langidLangs.map(l => col(s"cost_$l")): _*)
        .orderBy(col("doc_id"))
    },

    // Stored serve leg (VERDICT r14 #7 — every other model family
    // already had its build-once/serve-many topology; langid used to
    // re-train in all three queries): the 5×256 cost table persists
    // once to DatasetCache keyed by the corpus + split geometry, and
    // serving reads params + folds features — plan-gated zero
    // training on serve (PlanShapeSpec), shares langid_nb_apply's
    // oracle (stored ≡ fresh is the determinism contract).
    "langid_nb_stored" -> { (s, dir) =>
      val store = graft.sources.DatasetCache.getOrBuild(
          dir, Seq("documents.parquet"), "nb_langid_tri256_split80") { path =>
        NaiveBayes.train(langidTrainDocs(s, dir), labelCol = "lang",
            tokensCol = "feats")
          .write.mode("overwrite").parquet(s"$path/params")
      }
      val params = NaiveBayes.broadcastParams(
        s.read.parquet(s"$store/params"), langidLangs)
      NaiveBayes.score(
          langidFeatDocs(s, dir)
            .select(col("doc_id"), col("lang"), col("feats")),
          params, langidLangs, tokensCol = "feats")
        .select(col("doc_id") +: col("lang") +: col("pred") +:
          langidLangs.map(l => col(s"cost_$l")): _*)
        .orderBy(col("doc_id"))
    },

    // Eval leg — the langid_eval confusion harness on the HELD-OUT
    // 20%, with the marker heuristic scored on the SAME rows so the
    // per-class F1 gain of the trained model is one artifact: the
    // (lang, pred_nb, pred_marker) census collapses the corpus scan
    // to ≤ |langs|³ rows before the class fan-out. Since the
    // langidAlpha tail (VERDICT r14 #2) made the fixture genuinely
    // language-skewed, the eval is non-vacuous: macro-F1 ≈ 0.73 at
    // sf0.001 — materially above BOTH the 5-class chance ceiling
    // (0.2) and the marker heuristic (macro 0.135, which predicts the
    // majority class only and scores literal zero on es/fr/zh).
    "langid_eval_nb" -> { (s, dir) =>
      import s.implicits._
      // featurize ONCE for both split sides (r16, the apply pattern)
      val fd = graft.operators.Materialize.cut(langidFeatDocs(s, dir))
      val held = Sampling.splitLabel(fd, "doc_id", 2000)
        .filter(col("split") === "test")
      val params = NaiveBayes.broadcastParams(
        NaiveBayes.train(trainSlice(fd), labelCol = "lang",
          tokensCol = "feats"), langidLangs)
      val cells = NaiveBayes.score(
          held.select(col("doc_id"), col("lang"), col("pred_marker"),
            col("feats")),
          params, langidLangs, tokensCol = "feats")
        .groupBy(col("lang"), col("pred"), col("pred_marker"))
        .agg(count(lit(1)).as("n"))
      cells.crossJoin(broadcast(langidLangs.toDF("cls")))
        .groupBy(col("cls"))
        .agg(
          sum(when(col("lang") === col("cls") && col("pred") === col("cls"),
            col("n")).otherwise(0L)).as("tp"),
          sum(when(col("lang") =!= col("cls") && col("pred") === col("cls"),
            col("n")).otherwise(0L)).as("fp"),
          sum(when(col("lang") === col("cls") && col("pred") =!= col("cls"),
            col("n")).otherwise(0L)).as("fn"),
          sum(when(col("lang") === col("cls") &&
            col("pred_marker") === col("cls"), col("n")).otherwise(0L))
            .as("tp_m"),
          sum(when(col("lang") =!= col("cls") &&
            col("pred_marker") === col("cls"), col("n")).otherwise(0L))
            .as("fp_m"),
          sum(when(col("lang") === col("cls") &&
            col("pred_marker") =!= col("cls"), col("n")).otherwise(0L))
            .as("fn_m"))
        .select(col("cls"), col("tp"), col("fp"), col("fn"),
          PRound.pround(when(col("tp") + col("fp") > 0,
            col("tp").cast("double") / (col("tp") + col("fp")))
            .otherwise(lit(0.0)), 6).as("prec"),
          PRound.pround(when(col("tp") + col("fn") > 0,
            col("tp").cast("double") / (col("tp") + col("fn")))
            .otherwise(lit(0.0)), 6).as("rec"),
          PRound.pround(when(lit(2L) * col("tp") + col("fp") + col("fn") > 0,
            lit(2.0) * col("tp") /
              (lit(2L) * col("tp") + col("fp") + col("fn")))
            .otherwise(lit(0.0)), 6).as("f1"),
          PRound.pround(when(
            lit(2L) * col("tp_m") + col("fp_m") + col("fn_m") > 0,
            lit(2.0) * col("tp_m") /
              (lit(2L) * col("tp_m") + col("fp_m") + col("fn_m")))
            .otherwise(lit(0.0)), 6).as("f1_marker"))
        .orderBy(col("cls"))
    },

    // Character-entropy quality signal — low entropy flags repeated-
    // character spam and template junk, high flags binary/garbled
    // bytes; the cheap gibberish screen that runs before any model-
    // based scorer. Entirely ROW-LOCAL (per-row char census via
    // higher-order functions, no explode, no shuffle except the
    // presentation sort); contributions are 6-dp-rounded and sorted
    // before the fold — the bm25 cross-engine sum discipline.
    "text_char_entropy" -> { (s, dir) =>
      val cs = transform(sequence(lit(1), length(col("text"))),
        i => col("text").substr(i, lit(1)))
      val n = size(cs).cast("double")
      val counts = transform(array_distinct(cs),
        c => size(filter(cs, x => x === c)).cast("double"))
      val contribs = transform(counts,
        k => PRound.pround((k / n) * -log2(k / n), 6))
      Tables.documents(s, dir)
        .filter(length(col("text")) > 0)
        .select(col("doc_id"), length(col("text")).cast("long").as("n_chars"),
          PRound.pround(
            aggregate(sort_array(contribs), lit(0.0), (a, x) => a + x), 4)
            .as("char_entropy"))
        .orderBy(col("doc_id"))
    },

    "text_quality" -> { (s, dir) =>
      val t = col("text")
      val nWords = TextAnalysis.tokenCount(t).cast("double")
      val nChars = length(regexp_replace(t, "\\s", "")).cast("double")
      Tables.documents(s, dir)
        .select(col("doc_id"),
          nWords.cast("long").as("n_words"),
          PRound.pround(nChars / nWords, 4).as("avg_word_len"),
          TextAnalysis.qualityScore(t).as("quality"))
        .orderBy(col("doc_id"))
    },

    "text_tokens" -> { (s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("ws_tokens"),
          TextAnalysis.subwordCount(col("text")).cast("long").as("subword_tokens"))
        .orderBy(col("doc_id"))
    },

    // Flesch-style readability per document (round 11) — the quality
    // dimension text_quality/gopher don't cover (they measure
    // JUNKINESS; this measures DIFFICULTY, the filter for
    // kid-safe/simple-language corpus slices). Deterministic proxies:
    // sentences = punctuation-run count (min 1), words = the shared
    // canonical tokenizer, syllables = vowel-run count over the
    // canonical text (spaces break runs, so it is per-word exact for
    // the proxy). Entirely map-side; the score is double arithmetic
    // from exact longs through an identical sequence in both engines.
    "text_readability" -> { (s, dir) =>
      val canon = TextAnalysis.canonicalize(col("text"))
      val nWords = size(TextAnalysis.wsTokens(canon)).cast("long")
      val nSent = greatest(
        coalesce(regexp_count(col("text"), lit("[.!?]+")), lit(0)), lit(1))
        .cast("long")
      val nSyll = coalesce(regexp_count(canon, lit("[aeiouy]+")), lit(0))
        .cast("long")
      Tables.documents(s, dir)
        .select(col("doc_id"), nWords.as("n_words"), nSent.as("n_sentences"),
          nSyll.as("n_syllables"))
        .select(col("doc_id"), col("n_words"), col("n_sentences"),
          col("n_syllables"),
          when(col("n_words") > 0, PRound.pround(
            lit(206.835) -
              lit(1.015) * (col("n_words").cast("double") /
                col("n_sentences").cast("double")) -
              lit(84.6) * (col("n_syllables").cast("double") /
                col("n_words").cast("double")), 4))
            .otherwise(lit(null).cast("double")).as("flesch"))
        .orderBy(col("doc_id"))
    },

    // Zipf-law fit over the corpus vocabulary (round 11) — the
    // corpus-health diagnostic next to stats_drift: natural text has
    // log-frequency ≈ −1·log-rank; a slope far from −1 flags
    // boilerplate floods (too flat) or truncated vocab (too steep).
    // The census is vocabulary-bounded, the rank podium is a
    // TakeOrdered top-1000 by (freq desc, token) — a deterministic
    // total order — and the least-squares moments are per-term
    // 6-dp-rounded DECIMAL sums (order-independent), so the slope
    // evaluates in double from bit-identical inputs in both engines.
    "text_zipf" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val toks = Tables.documents(s, dir)
        .select(explode(TextAnalysis.wsTokens(
          TextAnalysis.canonicalize(col("text")))).as("tok"))
      val census = toks.groupBy(col("tok")).agg(count(lit(1)).as("c"))
      val top = census.orderBy(col("c").desc, col("tok")).limit(1000)
      val ranked = top.withColumn("rk",
        row_number().over(Window.orderBy(col("c").desc, col("tok"))))
      val x = log(col("rk").cast("double"))
      val y = log(col("c").cast("double"))
      def d6(v: org.apache.spark.sql.Column) =
        PRound.pround(v, 6).cast("decimal(28,6)")
      val a = ranked.agg(count(lit(1)).as("n"),
        sum(d6(x)).as("sx"), sum(d6(y)).as("sy"),
        sum(d6(x * x)).as("sxx"), sum(d6(x * y)).as("sxy"))
      val nD = col("n").cast("double")
      val sx = col("sx").cast("double"); val sy = col("sy").cast("double")
      val sxx = col("sxx").cast("double"); val sxy = col("sxy").cast("double")
      val slope = (nD * sxy - sx * sy) / (nD * sxx - sx * sx)
      a.select(col("n").as("n_terms"),
        PRound.pround(slope, 4).as("zipf_slope"),
        PRound.pround((sy - slope * sx) / nD, 4).as("intercept"))
    },

    "text_fingerprint" -> { (s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"),
          TextAnalysis.fingerprint(col("text")).as("fingerprint"))
        .orderBy(col("doc_id"))
    },

    // Rabin-Karp rolling-hash fingerprint (native expression).
    "text_rolling_hash" -> { (s, dir) =>
      import org.apache.spark.sql.GraftBridge.{column, expression}
      Tables.documents(s, dir)
        .select(col("doc_id"),
          column(graft.functions.expr.RollingHash(expression(col("text"))))
            .as("rhash"))
        .orderBy(col("doc_id"))
    },

    // PII scrub over a corpus with synthesized contact strings (the
    // raw docs carry none — planting makes redaction observable).
    "text_pii_redact" -> { (s, dir) =>
      val dirty = concat(col("text"), lit(" contact user"), col("doc_id"),
        lit("@example.com or +1-555-0"), col("doc_id"))
      Tables.documents(s, dir)
        .select(col("doc_id"), TextAnalysis.redactPii(dirty).as("clean"))
        .withColumn("n_emails_left",
          coalesce(regexp_count(col("clean"), lit("@")), lit(0)).cast("long"))
        .orderBy(col("doc_id"))
    },

    // k-anonymity census — the re-identification audit next to
    // text_pii_redact's direct-identifier scrub (Sweeney 2002): after
    // redaction, QUASI-identifiers (nation × market segment × account
    // balance band) can still single a record out if its equivalence
    // class is small. The census is one map-side-combined groupBy on
    // the class key; classes below k=4 are the rows a release must
    // suppress or generalize. At 100 TB the output stays
    // |class-space|-sized — the audit never moves the records, only
    // the class census.
    "pii_kanon" -> { (s, dir) =>
      Tables.customer(s, dir)
        .select(col("c_nationkey"), col("c_mktsegment"),
          floor(col("c_acctbal") / 2000).cast("long").as("bal_band"))
        .groupBy(col("c_nationkey"), col("c_mktsegment"), col("bal_band"))
        .agg(count(lit(1)).as("class_size"))
        .withColumn("k_anon", (col("class_size") >= 4).cast("long"))
        .orderBy(col("c_nationkey"), col("c_mktsegment"), col("bal_band"))
    },

    // The SQL surface: the SAME native expressions registered by
    // GraftExtensions, invoked via spark.sql text — oracle-checked, so
    // SQL users are proven to get bit-exact DataFrame-API results.
    "sql_functions" -> { (s, dir) =>
      Tables.documents(s, dir).createOrReplaceTempView("documents_v")
      s.sql("""
        SELECT doc_id,
          rolling_hash(text) AS rhash,
          size(word_shingles(text, 3)) AS n_shingles,
          simhash48(filter(split(trim(regexp_replace(regexp_replace(
            lower(text), '[^a-z0-9 ]', ' '), '\\s+', ' ')), ' '),
            t -> t != '')) AS simhash
        FROM documents_v ORDER BY doc_id""")
    },

    // Multimodal metadata path (SQL-expressible part): payload as a
    // binary column + typed metadata. The per-partition decode stub
    // lives in operators.Multimodal (spec-tested).
    "mm_meta" -> { (s, dir) =>
      val modality = when(substring(col("source"), 4, 10).cast("int") % 3 === 0, "image")
        .when(substring(col("source"), 4, 10).cast("int") % 3 === 1, "audio")
        .otherwise("text")
      Tables.documents(s, dir)
        .withColumn("blob", encode(col("text"), "UTF-8"))
        .select(col("doc_id"), modality.as("modality"),
          octet_length(col("blob")).cast("long").as("byte_len"),
          md5(col("blob")).as("content_hash"))
        .orderBy(col("doc_id"))
    },

    // URL canonicalization dedup — the crawl-frontier staple: the
    // SAME resource arrives under case variants, explicit default
    // ports, trailing slashes, utm_* tracking params and shuffled
    // query order; dedup on the raw url re-fetches all of them. The
    // messy urls are synthesized deterministically from doc_id/source
    // (the filter_domains convention) so every canonicalization rule
    // fires; UrlFns.canonicalize is pure map-side Column arithmetic
    // (regex + array HOFs, no UDF), and the only shuffle is the final
    // canonical-key count — at 100 TB the canonical url simply
    // REPLACES the raw url as every downstream dedup/partition key.
    "url_canon_dedup" -> { (s, dir) =>
      val d = Tables.documents(s, dir).select(col("doc_id"), col("source"))
      val k = col("doc_id")
      val scheme = when(k % 2 === 0, lit("http")).otherwise(lit("HTTPS"))
      val host = when(k % 4 < 2, concat(col("source"), lit(".Example.COM")))
        .otherwise(concat(col("source"), lit(".example.com")))
      val port = when(k % 3 === 0,
          when(k % 2 === 0, lit(":80")).otherwise(lit(":443")))
        .otherwise(lit(""))
      val path = concat(lit("/docs/"), (k % 7).cast("string"),
        when(k % 5 === 0, lit("/")).otherwise(lit("")))
      val query = when(k % 2 === 0,
          concat(lit("?utm_source=feed&id="), (k % 5).cast("string")))
        .otherwise(concat(lit("?id="), (k % 5).cast("string"),
          lit("&utm_campaign=x")))
      d.select(col("doc_id"),
          concat(scheme, lit("://"), host, port, path, query).as("url"))
        .select(col("doc_id"), col("url"),
          graft.functions.UrlFns.canonicalize(col("url")).as("canon"))
        .groupBy(col("canon"))
        .agg(count(lit(1)).as("n_urls"),
          countDistinct(col("url")).as("n_variants"),
          min(col("doc_id")).as("first_doc"))
        .orderBy(col("canon"))
    },

    // robots.txt frontier filtering (RFC 9309 / Google REP) — the
    // politeness gate between a URL frontier and the fetcher: per
    // host a small rule set (Allow/Disallow path prefixes, one
    // slot-keyed block-all host), per URL the LONGEST matching prefix
    // wins with Allow beating Disallow at equal length (the RFC's
    // least-restrictive tie-break), no match → allowed. The winner is
    // max over struct(len, is_allow) — lexicographic struct order IS
    // the RFC rule, engine-portable. Scale shape: rules are
    // hosts×≤4 rows and ride BROADCAST onto the frontier (prefix
    // predicate inside the join), each URL expands to ≤ its matching
    // rules, and the per-URL argmax map-side-combines into the one
    // narrow doc_id shuffle — the corpus text never moves.
    "crawl_robots_filter" -> { (s, dir) =>
      val k = col("doc_id")
      val frontier = Tables.documents(s, dir)
        .select(col("doc_id"), col("source").as("fsource"),
          concat(lit("/docs/"), (k % 7).cast("string"),
            when(k % 5 === 0, lit("/priv")).otherwise(lit("")),
            when(k % 3 === 0, lit("/x.html")).otherwise(lit(""))).as("path"))
      val hosts = Tables.documents(s, dir).select(col("source")).distinct()
      val rules = hosts.select(col("source"), explode(array(
          struct(lit("disallow").as("verdict"), lit("/docs/3").as("rp")),
          struct(lit("allow").as("verdict"), lit("/docs/3/x.html").as("rp")),
          struct(lit("disallow").as("verdict"), lit("/docs/5/priv").as("rp"))))
          .as("r"))
        .select(col("source").as("rsource"), col("r.verdict").as("verdict"),
          col("r.rp").as("rp"))
        .unionByName(hosts
          .filter(conv(substring(md5(col("source")), 32, 1), 16, 10)
            .cast("int") % 4 === 0)
          .select(col("source").as("rsource"),
            lit("disallow").as("verdict"), lit("/").as("rp")))
      frontier.join(broadcast(rules),
          col("fsource") === col("rsource") &&
            col("path").startsWith(col("rp")), "left")
        .groupBy(col("doc_id"), col("fsource"))
        .agg(max(when(col("rp").isNotNull,
          struct(length(col("rp")).as("l"),
            (col("verdict") === "allow").cast("int").as("a")))).as("best"))
        .groupBy(col("fsource").as("source"))
        .agg(count(lit(1)).as("n_urls"),
          sum((col("best").isNotNull && col("best.a") === 0).cast("long"))
            .as("n_blocked"),
          sum((col("best").isNull || col("best.a") === 1).cast("long"))
            .as("n_allowed"))
        .orderBy(col("source"))
    },

    // Politeness SCHEDULING — the step after the robots gate: a
    // crawler must space same-host fetches by the host's crawl-delay,
    // so the frontier becomes (host, slot) with fetch_at = slot ×
    // delay. Delay is a deterministic per-host assignment (md5 nibble
    // → 250/500/750/1000 ms — the crawl_robots_filter host-keying
    // idiom); slots are row_number per host in doc_id order. One
    // window shuffle keyed on the host — the same partitioning a real
    // fetcher wants, because the per-host queue IS the unit of
    // politeness; hosts schedule independently, so skew is bounded by
    // the biggest single host, not the corpus.
    "crawl_schedule" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val delay = (conv(substring(md5(col("source")), 32, 1), 16, 10)
        .cast("long") % 4 + 1) * 250
      val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      Tables.documents(s, dir)
        .select(col("doc_id"), col("source"))
        .withColumn("delay_ms", delay)
        .withColumn("slot", row_number().over(w).cast("long") - 1)
        .withColumn("fetch_at_ms", col("slot") * col("delay_ms"))
        .orderBy(col("doc_id"))
    },

    // Mojibake / encoding-quality gate (the ftfy-class check a crawl
    // pipeline runs before langid — double-encoded UTF-8 and decoder
    // replacement chars poison token statistics downstream): planted
    // corruption (the classic cp1252 read of a UTF-8 right single
    // quote, U+00E2 U+20AC U+2122, doc_id%4 times; U+FFFD replacement
    // chars doc_id%3 times) is counted BACK by the
    // occurrences-via-replace identity (len(x) − len(replace(x, pat)))
    // — pure codegen'd string Columns, char-based length in both
    // engines. Census per language with ONE integer-ratio division at
    // the edge (never an avg of per-doc doubles — summation order).
    "text_mojibake" -> { (s, dir) =>
      val moji = "\u00e2\u20ac\u2122"
      val repl = "\ufffd"
      val k = col("doc_id")
      val x = concat(
        lit(moji * 3).substr(lit(1), ((k % 4) * 3).cast("int")),
        lit(repl * 2).substr(lit(1), (k % 3).cast("int")),
        col("text"))
      Tables.documents(s, dir)
        .select(col("lang"),
          ((length(x) - length(replace(x, lit(moji), lit("")))) / 3)
            .cast("long").as("n_moji"),
          (length(x) - length(replace(x, lit(repl), lit(""))))
            .cast("long").as("n_repl"),
          length(x).cast("long").as("n_chars"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum((col("n_moji") > 0 || col("n_repl") > 0).cast("long"))
            .as("n_flagged"),
          sum(col("n_moji")).as("tot_moji"),
          sum(col("n_repl")).as("tot_repl"),
          PRound.pround(
            (lit(3L) * sum(col("n_moji")) + sum(col("n_repl")))
              .cast("double") / sum(col("n_chars")), 6).as("bad_ratio"))
        .orderBy(col("lang"))
    },

    // Multimodal near-dup: dHash perceptual fingerprints over the
    // payload bytes (Multimodal.dHash48 — honest-fake intensity =
    // sampled byte, real gradient/bit-pack machinery), then the SAME
    // banded-LSH candidate skeleton the simhash path uses
    // (Dedup.bandedHammingPairs): 4×12-bit bands key the self-join,
    // exact hamming only on candidates — never all-pairs, identical
    // 100 TB posture to dedup_simhash_near. Planted exact copies
    // guarantee hamming-0 pairs; near copies (first word dropped)
    // shift every sampled offset, exercising the gradient's
    // robustness-vs-miss behavior honestly.
    "mm_phash_pairs" -> { (s, dir) =>
      val sigs = plantedDocs(s, dir)
        .filter(length(col("text")) >= 54)
        .select(col("id"), Multimodal.dHash48(col("text")).as("phash"))
      Dedup.bandedHammingPairs(sigs, "id", "phash", maxHamming = 6)
        .orderBy(col("id_a"), col("id_b"))
    },

    // Multimodal near-dup on REAL pixels (VERDICT r12 #3): 18×12
    // grayscale PNGs with analytically-known pixel content are
    // round-tripped through a REAL encoder/decoder (zlib DEFLATE,
    // per-row filter type cycling 0..4 so every unfilter path — Sub/
    // Up/Average/Paeth — executes; operators.PngCodec), then dHash48
    // runs on the DECODED luma plane and the same banded-hamming
    // skeleton pairs candidates. Planted id-pairs share pixel content
    // up to a uniform +1 brightness shift — gradient signs identical,
    // hamming 0 — so PIXEL CONTENT, not byte length, decides the
    // match; the oracle replays the pixel formula analytically (the
    // mm_flac/mp3 "analytic inverse" discipline — DuckDB cannot
    // inflate, and does not need to: the codec round-trip is what the
    // Spark side proves).
    "mm_phash_real" -> { (s, dir) =>
      import s.implicits._
      val ids = Tables.documents(s, dir)
        .select(col("doc_id")).as[java.lang.Long]
      val sigs = PngCodec.pngPHash(PngCodec.synthPngs(ids)).toDF()
        .select(col("id"), col("phash"))
      Dedup.bandedHammingPairs(sigs, "id", "phash", maxHamming = 6)
        .orderBy(col("id_a"), col("id_b"))
    },

    // Incremental IMAGE dedup against a PERSISTED hamming band store
    // (round 16 — the daily-crawl serve topology the text side has
    // had since dedup_incremental_near, now for perceptual hashes):
    // the history half's decoded-pixel hashes build ONE fixed-width
    // (band, bv) store via DatasetCache — build-once/serve-many,
    // never pixels, never full hashes — and today's batch (new docs
    // plus re-posts of history images under new ids) probes it with
    // a band semi-join: any collision is near-known. At 100 TB the
    // store is the only thing that survives between runs and the
    // serve is one fixed-width join per batch; the oracle replays
    // the analytic phash formula AND the identical band geometry.
    "mm_phash_stored" -> { (s, dir) =>
      import s.implicits._
      val store = graft.sources.DatasetCache.getOrBuild(
          dir, Seq("documents.parquet"), "phash_bandstore_lt250_b4w12") { path =>
        val hist = Tables.documents(s, dir).select(col("doc_id"))
          .filter(col("doc_id") < 250).as[java.lang.Long]
        Dedup.hammingBandStore(
            PngCodec.pngPHash(PngCodec.synthPngs(hist)).toDF()
              .select(col("id"), col("phash")), "id", "phash")
          .write.mode("overwrite").parquet(s"$path/bands")
      }
      val bands = s.read.parquet(s"$store/bands")
      // today's crawl: new images plus RE-POSTED history bytes under
      // new ids — the serve decodes ONLY these files; history pixels
      // never re-decode (the whole point of the persisted store)
      val d = Tables.documents(s, dir)
      val newDocs = PngCodec.synthPngs(
        d.filter(col("doc_id") >= 250).select(col("doc_id"))
          .as[java.lang.Long])
      val reposts = PngCodec.synthPngs(
          d.filter(col("doc_id") < 250 && col("doc_id") % 13 === 0)
            .select(col("doc_id")).as[java.lang.Long])
        .map(r => r.copy(id = r.id + 1000000))
      val sigs = PngCodec.pngPHash(newDocs.union(reposts)).toDF()
        .select(col("id"), col("phash"))
      Dedup.hammingServeVerdicts(sigs, bands, "id", "phash")
        .orderBy(col("id"))
    },

    // Palette + Adam7 PNG near-dup (VERDICT r13 #1): the dominant
    // real-crawl PNG class — color-type 3 at ALL FOUR index depths
    // (1/2/4/8-bit big-endian packed), PLTE gray triples, and BOTH
    // interlace layouts (each planted pair is one flat + one Adam7
    // image of the SAME indices under a +1-shifted palette). dHash48
    // runs on the PALETTE-DECODED luma plane, so a hamming-0 match
    // proves the PLTE lookup, the sub-byte bit unpacking and the
    // 7-pass Adam7 reassembly all reproduced the pixels; the oracle
    // replays the analytic luma formula (DuckDB cannot inflate, and
    // does not need to — the codec round-trip is what Spark proves).
    "mm_phash_palette" -> { (s, dir) =>
      import s.implicits._
      val ids = Tables.documents(s, dir)
        .select(col("doc_id")).as[java.lang.Long]
      val sigs = PngCodec.pngPHash(PngCodec.synthPalettePngs(ids)).toDF()
        .select(col("id"), col("phash"))
      Dedup.bandedHammingPairs(sigs, "id", "phash", maxHamming = 6)
        .orderBy(col("id_a"), col("id_b"))
    },

    // Alpha-bearing PNG near-dup (round 14 — completes the real-crawl
    // PNG matrix after mm_phash_palette): color types 6 (RGBA, the
    // most common web PNG) and 4 (gray+alpha), each planted pair one
    // flat + one Adam7 image whose COLOR planes differ by the uniform
    // +1 shift while the ALPHA planes differ arbitrarily (alpha is
    // keyed on the full id, not the group) — so a hamming-0 match
    // proves the decoder reads the straight color channels and
    // ignores alpha for luma. Oracle replays the analytic BT.601 /
    // gray luma; alpha never appears in it, which IS the contract.
    "mm_phash_rgba" -> { (s, dir) =>
      import s.implicits._
      val ids = Tables.documents(s, dir)
        .select(col("doc_id")).as[java.lang.Long]
      val sigs = PngCodec.pngPHash(PngCodec.synthAlphaPngs(ids)).toDF()
        .select(col("id"), col("phash"))
      Dedup.bandedHammingPairs(sigs, "id", "phash", maxHamming = 6)
        .orderBy(col("id_a"), col("id_b"))
    },

    // JPEG near-dup on REAL baseline-decoded pixels (VERDICT r14 #1 —
    // the DOMINANT crawl image format, previously dims-only): 72×48
    // BLOCK-CONSTANT grayscale JPEGs round-trip through the real
    // operators.JpegCodec — marker walk, DQT/DHT, canonical Huffman,
    // restart markers, dequantize, IDCT — then dHash48 on the decoded
    // luma and the shared banded-hamming skeleton. Flat 8×8 blocks are
    // DC-only and the fixture quant's DC step 8 divides 8·(v−128)
    // exactly, so encode→decode is LOSSLESS by construction and the
    // oracle replays the block formula analytically (DuckDB cannot
    // Huffman, and does not need to). Each planted pair shares block
    // content up to a uniform +1 shift AND differs across the WHOLE
    // entropy layer (Annex K vs group-reversed Huffman tables, restart
    // interval 3, a COM segment) — different bytes, identical decoded
    // pixels: DECODED PIXEL CONTENT, not byte plumbing, decides the
    // match.
    "mm_phash_jpeg" -> { (s, dir) =>
      import s.implicits._
      val ids = Tables.documents(s, dir)
        .select(col("doc_id")).as[java.lang.Long]
      val sigs = JpegCodec.jpegPHash(JpegCodec.synthJpegs(ids)).toDF()
        .select(col("id"), col("phash"))
      Dedup.bandedHammingPairs(sigs, "id", "phash", maxHamming = 6)
        .orderBy(col("id_a"), col("id_b"))
    },

    // PROGRESSIVE JPEG near-dup (round 15 — the web's most common
    // JPEG shape, exercised IN-ENGINE, not just in the spec): the
    // same block-constant pattern family, but each pair is one
    // BASELINE and one PROGRESSIVE (SOF2, spectral-selection split —
    // a genuine multi-scan stream: DC scan then the 1..63 AC band
    // with EOB0 terminators) encoding. The quantized coefficients
    // are identical either way, so decoded pixels match up to the
    // uniform +1 shift and this query shares mm_phash_jpeg's
    // analytic oracle VERBATIM — progressive ≡ baseline on decoded
    // pixel content IS the multi-scan decoder's proof.
    "mm_phash_jpeg_prog" -> { (s, dir) =>
      import s.implicits._
      val ids = Tables.documents(s, dir)
        .select(col("doc_id")).as[java.lang.Long]
      val sigs = JpegCodec.jpegPHash(JpegCodec.synthJpegsProg(ids)).toDF()
        .select(col("id"), col("phash"))
      Dedup.bandedHammingPairs(sigs, "id", "phash", maxHamming = 6)
        .orderBy(col("id_a"), col("id_b"))
    },

    // VIDEO frame near-dup on REAL decoded frame content (VERDICT r14
    // #4 — the last multimodal fake retired): 3-frame MJPEG-in-AVI
    // containers round-trip through the real operators.AviCodec RIFF
    // walk (hdrl/strl/movi/idx1, JUNK + interleaved-audio skipping)
    // composed with the real JpegCodec baseline decode of FRAME 1;
    // dHash48 on the decoded luma, shared banded-hamming skeleton.
    // Frames 0/2 are keyed on the FULL id (the pair's other frames
    // differ arbitrarily) while frame 1 carries the group pattern up
    // to the uniform +1 shift — a hamming-0 match proves the walk
    // selected the right chunk AND the frame pixels decoded correctly.
    // Odd ids vary the whole stack: reversed Huffman tables + restart
    // markers inside the JPEG, JUNK + '01wb' chunks inside movi.
    "mm_video_phash" -> { (s, dir) =>
      import s.implicits._
      val ids = Tables.documents(s, dir)
        .select(col("doc_id")).as[java.lang.Long]
      val sigs = graft.operators.AviCodec
        .aviFramePHash(graft.operators.AviCodec.synthAvis(ids), frameIdx = 1)
        .toDF()
        .select(col("id"), col("phash"))
      Dedup.bandedHammingPairs(sigs, "id", "phash", maxHamming = 6)
        .orderBy(col("id_a"), col("id_b"))
    },

    // REAL-pixel thumbnail resize (the decode→resize→featurize step
    // of a vision ingest, on the real PngCodec path — the mandate's
    // "resize" leg made honest): every synthesized PNG decodes
    // through Inflater + unfilter, nearest-neighbor resizes 18×12 →
    // 6×4, and reduces to a position-weighted checksum + min/max. The
    // oracle replays the analytic pixel formula at the resized grid's
    // source indices (x = 3c, y = 3r) — pixel CONTENT, not byte
    // plumbing, decides every output value. Row-local mapPartitions,
    // zero shuffle.
    "mm_resize_real" -> { (s, dir) =>
      import s.implicits._
      val ids = Tables.documents(s, dir)
        .select(col("doc_id")).as[java.lang.Long]
      PngCodec.pngResizeStats(PngCodec.synthPngs(ids), tw = 6, th = 4)
        .toDF()
        .select(col("id"), col("width"), col("height"), col("rsum"),
          col("rmin"), col("rmax"))
        .orderBy(col("id"))
    },

    // Perceptual dedup on REAL LZW-decompressed pixels — the GIF twin
    // of mm_phash_real (the palette-indexed corpus shape ancient-web
    // crawl segments carry): analytically-known md5-mixed pixels
    // ("g"-seeded so GIF patterns are independent of the PNG leg)
    // round-trip through the real GifCodec — variable-width LZW,
    // clear resets, sub-block framing — then dHash48 on decoded luma
    // and the shared banded-hamming skeleton. Planted id-pairs share
    // pixel content up to a uniform +1 shift (hamming 0); the oracle
    // replays the pixel formula analytically (DuckDB cannot LZW, and
    // does not need to — the codec round-trip is what the Spark side
    // proves).
    "mm_gif_phash" -> { (s, dir) =>
      import s.implicits._
      val ids = Tables.documents(s, dir)
        .select(col("doc_id")).as[java.lang.Long]
      val sigs = GifCodec.gifPHash(GifCodec.synthGifs(ids)).toDF()
        .select(col("id"), col("phash"))
      Dedup.bandedHammingPairs(sigs, "id", "phash", maxHamming = 6)
        .orderBy(col("id_a"), col("id_b"))
    },

    // BM25 retrieval scoring (Okapi, k1=1.2, b=0.75) of the corpus
    // against a fixed query-term set — the search shape a curation
    // stack uses for topic targeting and eval-set mining. Per-term
    // contributions round to 6 dp and sum over the SORTED list (the
    // text_lm_score convention) so the score reproduces across
    // engines; the final top-10 is TakeOrderedAndProject, never a
    // global sort. Scale shape: tf is filtered to the query terms
    // BEFORE any shuffle (the per-doc agg carries only hits), df is a
    // |terms|-row broadcast, and corpus length stats are one map-side-
    // combined agg (sum/count, not avg, so the mean is exact integer
    // arithmetic until the single division).
    "text_bm25" -> { (s, dir) =>
      bm25Scores(s, dir)
        .orderBy(col("bm25").desc, col("doc_id"))
        .limit(10)
    },

    // Hybrid retrieval — the production RAG serving shape: a lexical
    // leg (BM25 against the query terms) and a vector leg (cosine
    // against the query embedding) each produce a global top-20 via
    // TakeOrderedAndProject, then RECIPROCAL-RANK FUSION merges them:
    // rrf = Σ 1/(60 + rank), absent-from-a-leg contributing 0 — rank
    // fusion needs no score calibration between the two systems,
    // which is why production stacks use it over score mixing. Ranks
    // are assigned by a window over the ALREADY-PRUNED 20-row frames
    // (the corpus never sees a global sort); the fuse join is
    // 20×20-row. documents.doc_id ↔ embeddings.vec_id align 1:1 in
    // the testdata, giving the doc-level join a real key.
    "search_hybrid" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      def rankTop(df: DataFrame, score: String, id: String, as: String) =
        df.orderBy(col(score).desc, col(id)).limit(20)
          .select(col(id).as("id"), row_number()
            .over(Window.orderBy(col(score).desc, col(id))).as(as))
      val lexR = rankTop(bm25Scores(s, dir), "bm25", "doc_id", "lex_rk")
      val e = Tables.embeddings(s, dir)
      val qv = e.filter(col("vec_id") === 8).select(col("embedding").as("qv"))
      val vecScores = e.filter(col("vec_id") >= 16)
        .crossJoin(broadcast(qv))
        .select(col("vec_id").as("vid"), PRound.pround(
          graft.functions.VectorFns.cosine(col("embedding"), col("qv")), 6)
          .as("cos"))
      val vecR = rankTop(vecScores, "cos", "vid", "vec_rk")
      lexR.join(vecR, Seq("id"), "full_outer")
        .select(col("id"),
          PRound.pround(
            coalesce(lit(1.0) / (lit(60.0) + col("lex_rk")), lit(0.0)) +
              coalesce(lit(1.0) / (lit(60.0) + col("vec_rk")), lit(0.0)), 6)
            .as("rrf"),
          col("lex_rk"), col("vec_rk"))
        .orderBy(col("rrf").desc, col("id"))
        .limit(10)
    },

    // Inverted-index build — term → (df, cf, posting head), the index
    // shape behind retrieval and contamination lookups. The posting
    // list is rank-capped INSIDE the term partition (row_number ≤ 8)
    // before any collection, so the collect carries at most 8 ids per
    // term no matter how common the term is — the stopword-row guard
    // an index build needs at corpus scale; df/cf come from the full
    // map-side-combined agg, not the capped head.
    "index_postings" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val tf = Tables.documents(s, dir)
        .select(col("doc_id"), explode(TextAnalysis.wsTokens(
          TextAnalysis.canonicalize(col("text")))).as("term"))
        .groupBy(col("term"), col("doc_id"))
        .agg(count(lit(1)).as("tf"))
      val stats = tf.groupBy(col("term"))
        .agg(count(lit(1)).as("df"), sum(col("tf")).as("cf"))
      val w = Window.partitionBy(col("term")).orderBy(col("doc_id"))
      val heads = tf.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 8)
        .groupBy(col("term"))
        .agg(concat_ws(",", sort_array(collect_list(col("doc_id"))))
          .as("postings_head"))
      stats.join(heads, Seq("term"))
        .filter(col("df") >= 5)
        .select(col("term"), col("df"), col("cf"), col("postings_head"))
        .orderBy(col("term"))
    },

    // Quality-canonical dedup apply: like dedup_apply, but every
    // near-dup cluster keeps its HIGHEST-quality member (min id breaks
    // ties) — the curation-grade policy: min-id keeps whatever crawled
    // first, quality-canonical keeps the cleanest capture. Planted
    // exact copies tie on quality and fall back to min id; the first-
    // word-dropped near copies genuinely differ, so the choice is
    // observable. One extra window over the (small) clustered subset
    // only; unclustered docs never enter the window.
    "dedup_apply_best" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val docs = plantedDocs(s, dir)
      val pairs = Dedup.minhashLsh(docs, "id", "text")
      val comp = Components.connected(pairs, "id_a", "id_b")
        .select(col("node").as("id"), col("component"))
      val w = Window.partitionBy(col("component"))
        .orderBy(col("q").desc, col("id"))
      val drops = docs.join(comp, Seq("id"))
        .select(col("id"), col("component"),
          TextAnalysis.qualityScore(col("text")).as("q"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") > 1)
        .select(col("id"))
      docs.join(drops, Seq("id"), "left_anti")
        .select(col("id"), md5(col("text")).as("text_hash"))
        .orderBy(col("id"))
    },

    // Embedding-space decontamination — the paraphrase-leak catcher
    // that n-gram decontamination (`decontaminate`) structurally
    // misses: flag corpus vectors whose cosine against ANY benchmark
    // vector clears the threshold. The benchmark side is provably
    // small (eval suites are thousands of vectors while the corpus is
    // billions) and broadcast, so the 100 TB side streams map-side
    // with NO shuffle before the per-vector agg; the threshold is
    // applied to the 6-dp-rounded cosine in both engines so boundary
    // membership is identical.
    "decontaminate_semantic" -> { (s, dir) =>
      val e = Tables.embeddings(s, dir)
      val corpus = e.filter(col("vec_id") >= 16)
        .select(col("vec_id"), col("embedding"))
      val bench = e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("bench_id"), col("embedding").as("bv"))
      corpus.crossJoin(broadcast(bench))
        .select(col("vec_id"),
          PRound.pround(
            graft.functions.VectorFns.cosine(col("embedding"), col("bv")), 6)
            .as("cos"))
        .filter(col("cos") >= 0.35)
        .groupBy(col("vec_id"))
        .agg(count(lit(1)).as("n_bench_hits"),
          PRound.pround(max(col("cos")), 4).as("max_cos"))
        .orderBy(col("vec_id"))
    },

    // Winnowing fingerprints (the MOSS scheme): per doc, hash every
    // 5-gram of the canonicalized text, take the minimum of each
    // 4-hash window, dedup — the guarantee is any shared substring of
    // length ≥ w+k−1 shares at least one fingerprint, at a fraction
    // ~2/(w+1) of positions stored. Pure per-row Column HOFs — the
    // whole fingerprinting is map-side, NO shuffle anywhere before
    // the output sort; emitted as (count, set-hash) so the result
    // stays narrow however long the doc is.
    "text_winnow" -> { (s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"), TextAnalysis.canonicalize(col("text")).as("c"))
        .select(col("doc_id"), expr(
          """CASE WHEN length(c) >= 5 THEN
            |  transform(sequence(1, length(c) - 4), i ->
            |    cast(conv(substring(md5(substring(c, i, 5)), 1, 8), 16, 10)
            |      as bigint))
            |ELSE array() END""".stripMargin).as("hs"))
        .select(col("doc_id"), expr(
          """CASE WHEN size(hs) >= 4 THEN
            |  transform(sequence(1, size(hs) - 3), i ->
            |    array_min(slice(hs, i, 4)))
            |ELSE array() END""".stripMargin).as("wins"))
        .select(col("doc_id"), size(col("wins")).cast("long").as("n_windows"),
          array_sort(array_distinct(col("wins"))).as("fps"))
        .select(col("doc_id"), col("n_windows"),
          size(col("fps")).cast("long").as("n_fp"),
          md5(array_join(transform(col("fps"), x => x.cast("string")), ","))
            .as("fp_hash"))
        .orderBy(col("doc_id"))
    },

    // Positional phrase search: documents containing the exact
    // adjacent-token phrase "spark filter", with occurrence counts —
    // the phrase-query primitive a positional inverted index serves.
    // Spark-first shape: per-doc positional arrays via a filter HOF,
    // phrase match = |intersect(positions(w1)+1, positions(w2))| —
    // ONE scan, zero shuffles before the final sort (at index-serving
    // scale the same intersection runs as an equi-join on
    // (doc, pos+1) against stored postings; index_postings is that
    // store). Positions are unique per doc so the intersection count
    // IS the occurrence count.
    "phrase_hits" -> { (s, dir) =>
      val toks = TextAnalysis.wsTokens(TextAnalysis.canonicalize(col("text")))
      def positions(term: String) = expr(
        s"filter(transform(toks, (t, i) -> IF(t = '$term', i + 1, -1)), p -> p > 0)")
      Tables.documents(s, dir)
        .select(col("doc_id"), toks.as("toks"))
        .select(col("doc_id"), positions("spark").as("pa"),
          positions("filter").as("pb"))
        .select(col("doc_id"),
          size(array_intersect(transform(col("pa"), x => x + 1), col("pb")))
            .cast("long").as("n_hits"))
        .filter(col("n_hits") > 0)
        .orderBy(col("doc_id"))
    },

    // PMI-scored collocations: top-20 adjacent word pairs by pointwise
    // mutual information over the bigram table's own margins — the
    // phrase-mining / tokenizer-seeding staple (a high-PMI pair is a
    // unit the tokenizer should not split). Bigrams form MAP-SIDE via
    // a HOF over each doc's token array — never a positional
    // self-join — so the only shuffles are the (w1,w2) count and two
    // vocab-sized margin aggs; the min-count filter runs BEFORE the
    // margin joins and the top-20 is TakeOrderedAndProject, ranked on
    // the 6-dp-rounded score with a word tie-break so the cut is
    // engine-portable.
    "bigram_pmi" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
        .select(TextAnalysis.wsTokens(
          TextAnalysis.canonicalize(col("text"))).as("toks"))
        .filter(size(col("toks")) >= 2)
      val bi = docs.select(explode(expr(
          """transform(sequence(1, size(toks) - 1),
            |  i -> struct(toks[i-1] AS w1, toks[i] AS w2))""".stripMargin))
          .as("b"))
        .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
      // ONE corpus explode + one (w1,w2) shuffle: total and both
      // margins re-aggregate the counted pair table (vocab²-bounded),
      // not the corpus — a naive four-consumer formulation re-scans
      // and re-explodes the corpus four times (measured 5.1 s). The
      // cut makes the single pass STRUCTURAL (plan-gated: zero file
      // scans downstream) instead of relying on runtime stage reuse.
      val pairTable = graft.operators.Materialize.cut(
        bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n_xy")))
      val tot = pairTable.agg(sum(col("n_xy")).cast("double").as("n_total"))
      val cnt = pairTable.filter(col("n_xy") >= 5)
      val lx = pairTable.groupBy(col("w1")).agg(sum(col("n_xy")).as("n_x"))
      val ry = pairTable.groupBy(col("w2")).agg(sum(col("n_xy")).as("n_y"))
      cnt.join(lx, "w1").join(ry, "w2").crossJoin(broadcast(tot))
        .select(col("w1"), col("w2"), col("n_xy"),
          PRound.pround(log(col("n_xy") * col("n_total") /
            (col("n_x") * col("n_y"))), 6).as("pmi"))
        .orderBy(col("pmi").desc, col("w1"), col("w2")).limit(20)
    },

    // Dominant principal direction of the embedding corpus by matrix-
    // free power iteration (2 steps) — the whitening / PCA-compression
    // primitive: the Gram matrix is never materialized, each step is
    // one corpus pass computing A^T(Av) with 6-dp DECIMAL per-dim
    // sums (partition-order-proof) and a sorted-fold norm. The
    // iterate is a 1-row broadcast; the only shuffle is the 64-key
    // contribution agg.
    "emb_pca_power" -> { (s, dir) =>
      graft.operators.Pca.powerIteration(
        Tables.embeddings(s, dir).filter(col("vec_id") >= 16)
          .select(col("embedding")),
        "embedding", dims = 64, iters = 2)
    },

    // Projection onto the learned dominant direction — the whitening/
    // top-PC feature per vector (emb_pca_power learns it, this ships
    // it): v rides a 1-row broadcast so the projection is one
    // map-side pass over the corpus.
    "emb_pca_project" -> { (s, dir) =>
      graft.operators.Pca.project(
        Tables.embeddings(s, dir).filter(col("vec_id") >= 16)
          .select(col("vec_id"), col("embedding")),
        "vec_id", "embedding", dims = 64, iters = 2)
        .orderBy(col("vec_id"))
    },

    // k-NN GRAPH construction (queries == corpus): every vector's
    // top-3 same-sign-bucket neighbors by exact cosine — the graph
    // SemDeDup clustering and graph dedup consume. Self-join keyed on
    // the bucket; 6 planes → 64 buckets bound the pair expansion.
    "ann_knn_graph" -> { (s, dir) =>
      val e = Tables.embeddings(s, dir)
      Ann.knnGraph(
          corpus = e.filter(col("vec_id") >= 16)
            .select(col("vec_id"), col("embedding")),
          planes = e.filter(col("vec_id") < 6)
            .select(col("vec_id"), col("embedding")),
          k = 3)
        .orderBy(col("vec_id"), col("rk"))
    },

    // Margin-based BITEXT MINING (Artetxe & Schwenk, ACL 2019 — the
    // LASER/CCMatrix method for mining aligned sentence pairs from two
    // monolingual embedding pools): sides = even/odd vec_ids, LSH
    // buckets bound the cross-side candidate join (never X×Y), margin
    // = cos(x,y) / mean of the two sides' top-4 neighborhood means —
    // the absolute-cosine fix for hubness. Mutual-best + margin ≥ 1.05
    // mined; cosines pround 6, neighborhood means sorted-fold 6dp, the
    // quotient one 4dp round — deterministic end to end.
    "bitext_mine" -> { (s, dir) =>
      val e = Tables.embeddings(s, dir)
      val planes = e.filter(col("vec_id") < 6)
        .select(col("vec_id"), col("embedding"))
      val corpus = e.filter(col("vec_id") >= 16)
        .select(col("vec_id"), col("embedding"))
      Ann.bitextMine(
          x = corpus.filter(col("vec_id") % 2 === 0),
          y = corpus.filter(col("vec_id") % 2 === 1),
          planes = planes, kNbhd = 4, minMargin = 1.05)
        .orderBy(col("x_id"))
    },

    // GRAPH-ANN serving (VERDICT r12 #4): deterministic beam search
    // over the symmetrized ann_knn_graph — the HNSW/NSW navigation
    // shape, flattened to one layer so every step replays in any
    // engine. Fixed geometry (4 entry points = lowest corpus ids,
    // beam 8, 3 hops, k=5), integer micro-cosine ranking keys, per-hop
    // beam checkpoint (lineage linear in hops). Each hop is one
    // broadcast join against the corpus-sized adjacency + one against
    // the embeddings — the corpus never shuffles during search.
    "ann_graph_search" -> { (s, dir) =>
      val e = Tables.embeddings(s, dir)
      Ann.graphSearch(
          corpus = e.filter(col("vec_id") >= 16)
            .select(col("vec_id"), col("embedding")),
          queries = e.filter(col("vec_id") >= 8 && col("vec_id") < 16)
            .select(col("vec_id"), col("embedding")),
          planes = e.filter(col("vec_id") < 6)
            .select(col("vec_id"), col("embedding")),
          graphK = 3, entries = 4, beam = 8, hops = 3, k = 5)
        .orderBy(col("query_id"), col("rk"))
    },

    // The standard recall gate on the SAME splits (the ann_recall
    // shape): beam-search top-5 vs exact top-5, left join so a query
    // with zero recalled neighbors still reports 0.
    "ann_graph_recall" -> { (s, dir) =>
      val e = Tables.embeddings(s, dir)
      val corpus = e.filter(col("vec_id") >= 16)
      val queries = e.filter(col("vec_id") >= 8 && col("vec_id") < 16)
      val approx = Ann.graphSearch(
          corpus.select(col("vec_id"), col("embedding")),
          queries.select(col("vec_id"), col("embedding")),
          e.filter(col("vec_id") < 6).select(col("vec_id"), col("embedding")),
          graphK = 3, entries = 4, beam = 8, hops = 3, k = 5)
        .select(col("query_id"), col("vec_id"))
      val exact = Ann.bruteForceTopK(corpus, queries, 5)
        .select(col("query_id").as("eq"), col("vec_id").as("ev"))
      exact.join(approx,
          col("eq") === col("query_id") && col("ev") === col("vec_id"), "left")
        .groupBy(col("eq"))
        .agg(count(col("query_id")).as("n_hits"))
        .select(col("eq").as("query_id"), col("n_hits"),
          PRound.pround(col("n_hits") / 5.0, 4).as("recall_at_5"))
        .orderBy(col("query_id"))
    },

    // LAYERED graph-ANN serving — the HNSW hierarchy kept (vs
    // ann_graph_search's single flattened layer): an upper layer of
    // hash-sampled nodes (vec_id % 8 == 0, the deterministic stand-in
    // for HNSW's geometric level draw) carries its own kNN graph;
    // search walks it first from fixed global entries, then hands
    // each query's best 4 upper nodes to the base layer as PER-QUERY
    // entry points — coarse-to-fine navigation that buys base hops
    // back on a big corpus. Same deterministic beam machinery
    // (integer micro-cosines, per-hop checkpoint, beam always the
    // broadcast side); 2 upper + 2 base hops, beam 8, k=5. Oracle =
    // both layers' beam chains unrolled as MATERIALIZED CTEs.
    "ann_hnsw" -> { (s, dir) =>
      val e = Tables.embeddings(s, dir)
      Ann.hnswSearch(
          corpus = e.filter(col("vec_id") >= 16)
            .select(col("vec_id"), col("embedding")),
          queries = e.filter(col("vec_id") >= 8 && col("vec_id") < 16)
            .select(col("vec_id"), col("embedding")),
          planes = e.filter(col("vec_id") < 6)
            .select(col("vec_id"), col("embedding")),
          graphK = 3, layerMod = 8, entries = 4, beam = 8,
          hopsUpper = 2, hopsBase = 2, k = 5)
        .orderBy(col("query_id"), col("rk"))
    },

    // ann_hnsw's SERVE topology (the quantizer-store story on the
    // graph): both layers' symmetrized adjacencies BUILD at most once
    // per dataset generation into the content-keyed DatasetCache
    // (geometry in the artifact name: k=3 graph, %8 upper layer) and
    // every search run reads them back — the per-run plan carries
    // ZERO graph construction (no LSH bucketing, no kNN self-join;
    // plan-gated), exactly how a production HNSW serves: graphs build
    // offline, queries walk stored edges. Stored adjacency is
    // bit-identical to the fresh build, so the shared ann_hnsw oracle
    // proves serve ≡ build.
    "ann_hnsw_stored" -> { (s, dir) =>
      val e = Tables.embeddings(s, dir)
      val corpus = e.filter(col("vec_id") >= 16)
        .select(col("vec_id"), col("embedding"))
      val planes = e.filter(col("vec_id") < 6)
        .select(col("vec_id"), col("embedding"))
      val store = graft.sources.DatasetCache.getOrBuild(
          dir, Seq("embeddings.parquet"), "hnsw_adj_k3_mod8") { path =>
        Ann.symAdj(corpus, planes, graphK = 3)
          .write.mode("overwrite").parquet(s"$path/adj0")
        Ann.symAdj(corpus.filter(col("vec_id") % 8 === 0), planes,
            graphK = 3)
          .write.mode("overwrite").parquet(s"$path/adj1")
      }
      Ann.hnswServe(corpus,
          e.filter(col("vec_id") >= 8 && col("vec_id") < 16)
            .select(col("vec_id"), col("embedding")),
          adjUpper = s.read.parquet(s"$store/adj1"),
          adjBase = s.read.parquet(s"$store/adj0"),
          layerMod = 8, entries = 4, beam = 8,
          hopsUpper = 2, hopsBase = 2, k = 5)
        .orderBy(col("query_id"), col("rk"))
    },

    // The standard recall gate on the SAME splits: layered top-5 vs
    // exact top-5, left join so zero-recall queries still report 0.
    "ann_hnsw_recall" -> { (s, dir) =>
      val e = Tables.embeddings(s, dir)
      val corpus = e.filter(col("vec_id") >= 16)
      val queries = e.filter(col("vec_id") >= 8 && col("vec_id") < 16)
      val approx = Ann.hnswSearch(
          corpus.select(col("vec_id"), col("embedding")),
          queries.select(col("vec_id"), col("embedding")),
          e.filter(col("vec_id") < 6).select(col("vec_id"), col("embedding")),
          graphK = 3, layerMod = 8, entries = 4, beam = 8,
          hopsUpper = 2, hopsBase = 2, k = 5)
        .select(col("query_id"), col("vec_id"))
      val exact = Ann.bruteForceTopK(corpus, queries, 5)
        .select(col("query_id").as("eq"), col("vec_id").as("ev"))
      exact.join(approx,
          col("eq") === col("query_id") && col("ev") === col("vec_id"), "left")
        .groupBy(col("eq"))
        .agg(count(col("query_id")).as("n_hits"))
        .select(col("eq").as("query_id"), col("n_hits"),
          PRound.pround(col("n_hits") / 5.0, 4).as("recall_at_5"))
        .orderBy(col("query_id"))
    },

    // Domain-blocklist ingest filter — the crawl-hygiene gate that
    // runs before any content processing: a domain is blocked if it
    // equals a blocklist entry or is a subdomain of one (dot-anchored
    // suffix, so "notsrc3.example.com" does NOT match
    // "src3.example.com"). The blocklist is broadcast (entries are
    // thousands of rows against billions of docs) — the small-list
    // fast path; filter_domains_scaled below is the same semantics
    // for multi-million-entry lists with NO broadcast. The list
    // deliberately carries a parent AND a child entry
    // (src11.example.com ⊃ cdn.src11.example.com), so a cdn.src11 doc
    // matches TWO entries: the per-doc flag aggregation BEFORE the
    // domain count is what keeps n_docs honest (counting the joined
    // rows directly would double-count exactly these docs — the r7
    // ADVICE latent bug, now observable and oracle-pinned).
    "filter_domains" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables.documents(s, dir).select(col("doc_id"), col("source"))
        .withColumn("domain",
          when(col("doc_id") % 3 === 0,
            concat(lit("cdn."), col("source"), lit(".example.com")))
          .otherwise(concat(col("source"), lit(".example.com"))))
      val bl = Seq("src3.example.com", "src7.example.com",
        "cdn.src11.example.com", "src11.example.com").toDF("entry")
      docs.join(broadcast(bl),
          col("domain") === col("entry") ||
            col("domain").endsWith(concat(lit("."), col("entry"))),
          "left")
        .groupBy(col("doc_id"), col("domain"))
        .agg(max(col("entry").isNotNull.cast("int")).as("blk"))
        .groupBy(col("domain"))
        .agg(count(lit(1)).as("n_docs"), max(col("blk")).as("blocked"))
        .orderBy(col("domain"))
    },

    // filter_domains at blocklist scale: a multi-million-entry list
    // cannot broadcast, and suffix matching is not an equi-condition —
    // until the domain is EXPLODED INTO ITS SUFFIX CHAIN
    // (cdn.src11.example.com → {cdn.src11.example.com,
    // src11.example.com, example.com, com}; ≤ label-count rows, DNS
    // caps labels at 127). "domain equals or is a subdomain of an
    // entry" is then `suffix = entry` — a plain shuffled equi-join
    // keyed on the suffix, both sides hash-partitioned, nothing
    // broadcast, nothing prefix-ranged. The shuffle_hash hint pins the
    // plan at bench scale (AQE would broadcast the tiny test list);
    // PlanShapeSpec gates the no-broadcast shape. The oracle is the
    // SAME SQL as filter_domains — the two queries' bit-equality IS
    // the smallpath/scaled equivalence proof.
    "filter_domains_scaled" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables.documents(s, dir).select(col("doc_id"), col("source"))
        .withColumn("domain",
          when(col("doc_id") % 3 === 0,
            concat(lit("cdn."), col("source"), lit(".example.com")))
          .otherwise(concat(col("source"), lit(".example.com"))))
      val bl = Seq("src3.example.com", "src7.example.com",
        "cdn.src11.example.com", "src11.example.com").toDF("entry")
      val labels = split(col("domain"), "\\.")
      docs
        .select(col("doc_id"), col("domain"),
          explode(transform(sequence(lit(1), size(labels)),
            i => array_join(slice(labels, i, size(labels)), "."))).as("suffix"))
        .join(bl.hint("shuffle_hash"), col("suffix") === col("entry"), "left")
        .groupBy(col("doc_id"), col("domain"))
        .agg(max(col("entry").isNotNull.cast("int")).as("blk"))
        .groupBy(col("domain"))
        .agg(count(lit(1)).as("n_docs"), max(col("blk")).as("blocked"))
        .orderBy(col("domain"))
    },

    // Token-distribution DRIFT between two crawl batches — the data-
    // quality monitor a continuous pipeline runs before admitting a
    // new batch: per-term probabilities in each batch, KL contribution
    // p_a·ln(p_a/p_b) over terms both batches saw, top-10 drifted
    // terms. One explode + one term-keyed agg (batch split by
    // conditional count, no second scan); batch totals are a 1-row
    // broadcast; the top-10 is TakeOrderedAndProject.
    "stats_drift" -> { (s, dir) =>
      val toks = Tables.documents(s, dir)
        .select((col("doc_id") % 2).as("b"),
          explode(TextAnalysis.wsTokens(
            TextAnalysis.canonicalize(col("text")))).as("term"))
      val counts = toks.groupBy(col("term"))
        .agg(sum((col("b") === 0).cast("long")).as("ca"),
          sum((col("b") === 1).cast("long")).as("cb"))
      val totals = counts.agg(sum(col("ca")).cast("double").as("ta"),
        sum(col("cb")).cast("double").as("tb"))
      counts.filter(col("ca") > 0 && col("cb") > 0)
        .crossJoin(broadcast(totals))
        .select(col("term"),
          PRound.pround(col("ca") / col("ta"), 6).as("p_a"),
          PRound.pround(col("cb") / col("tb"), 6).as("p_b"),
          PRound.pround((col("ca") / col("ta")) *
            log((col("ca") / col("ta")) / (col("cb") / col("tb"))), 6)
            .as("kl_term"))
        .orderBy(col("kl_term").desc, col("term"))
        .limit(10)
    })

  // ---------------------------------------------------------------- oracles

  /** Shared oracle of filter_domains and filter_domains_scaled — the
    * two queries returning ONE SQL's result is the broadcast ≡
    * suffix-explode equivalence proof. The per-doc flag is aggregated
    * BEFORE the per-domain count so a domain matching several entries
    * (the planted parent+child pair) never inflates n_docs. */
  private val filterDomainsSql =
    """WITH docs AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 3 = 0
      |         THEN 'cdn.' || source || '.example.com'
      |         ELSE source || '.example.com' END AS domain
      |  FROM documents),
      |bl AS (SELECT unnest(['src3.example.com', 'src7.example.com',
      |  'cdn.src11.example.com', 'src11.example.com']) AS entry),
      |perdoc AS (
      |  SELECT d.doc_id, d.domain,
      |    max(CASE WHEN b.entry IS NOT NULL THEN 1 ELSE 0 END) AS blk
      |  FROM docs d LEFT JOIN bl b
      |  ON d.domain = b.entry OR ends_with(d.domain, '.' || b.entry)
      |  GROUP BY d.doc_id, d.domain)
      |SELECT domain, count(*) AS n_docs, CAST(max(blk) AS INT) AS blocked
      |FROM perdoc GROUP BY domain ORDER BY domain""".stripMargin

  /** SQL twin of [[multilineDocs]]. */
  private[queries] val multilineSql =
    """docs AS (
      |  SELECT doc_id AS id, concat_ws(chr(10),
      |    CASE WHEN doc_id % 3 = 0
      |      THEN 'Subscribe to our newsletter for daily updates' END,
      |    substr(text, 1, 100),
      |    nullif(substr(text, 101, 100), ''),
      |    CASE WHEN doc_id % 4 = 0
      |      THEN 'All rights reserved - contact the administrator' END) AS text
      |  FROM documents)""".stripMargin

  private[queries] val plantedSql =
    """corpus AS (
      |  SELECT doc_id AS id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 25 = 0
      |  UNION ALL
      |  SELECT doc_id + 2000000, regexp_replace(text, '^\S+\s+', '')
      |  FROM documents WHERE doc_id % 50 = 0)""".stripMargin

  /** BM25 score chain shared by `text_bm25` and `search_hybrid` —
    * ends at `bm25sc(doc_id, bm25)`, unranked, replaying
    * [[bm25Scores]] CTE for CTE. */
  private val bm25ChainSql: String =
    """canon AS (
      |  SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text),
      |    '[^a-z0-9 ]', ' ', 'g'), '\s+', ' ', 'g')) AS c
      |  FROM documents),
      |toks AS (
      |  SELECT doc_id, [x for x in string_split(c, ' ') if x <> ''] AS t
      |  FROM canon),
      |lens AS (
      |  SELECT doc_id, CAST(len(t) AS DOUBLE) AS dl
      |  FROM toks WHERE len(t) > 0),
      |stats AS (
      |  SELECT CAST(count(*) AS DOUBLE) AS n_docs,
      |    CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
      |  FROM lens),
      |tf AS (
      |  SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf FROM (
      |    SELECT doc_id, unnest(t) AS term FROM toks)
      |  WHERE term IN ('spark', 'filter', 'merge', 'window')
      |  GROUP BY doc_id, term),
      |dfreq AS (
      |  SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term),
      |contrib AS (
      |  SELECT tf.doc_id,
      |    round(ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
      |      * tf.tf * (1.2 + 1.0)
      |      / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * l.dl / s.avgdl)), 6) AS c
      |  FROM tf JOIN dfreq d USING (term)
      |  JOIN lens l USING (doc_id) CROSS JOIN stats s),
      |agg AS (
      |  SELECT doc_id, list_sort(list(c)) AS cs FROM contrib GROUP BY doc_id),
      |bm25sc AS (
      |  SELECT doc_id, round(list_aggregate(cs, 'sum'), 4) AS bm25 FROM agg)""".stripMargin

  /** dHash sample grid shared with Multimodal.dHash48: intensity(i) =
    * codepoint at offset floor(L*i/54)+1, bit (r,c) set when the
    * horizontal gradient is positive. Generated term-by-term so the
    * oracle replays the identical 48-bit pack. */
  private val mmPhashSql: String = {
    val n = 54
    def v(i: Int) = s"ascii(substr(text, CAST(floor(L*$i/$n) AS INT)+1, 1))"
    val terms = (for { r <- 0 until 6; c <- 0 until 8 } yield {
      val k = r * 8 + c
      s"(CASE WHEN ${v(r * 9 + c)} > ${v(r * 9 + c + 1)} THEN ${1L << k} ELSE 0 END)"
    }).mkString(" +\n    ")
    s"""sigs AS (
       |  SELECT id, CAST($terms AS BIGINT) AS phash
       |  FROM (SELECT id, text, length(text) AS L FROM corpus
       |        WHERE length(text) >= $n))""".stripMargin
  }

  /** Shared CTE chain of the substring-dedup pair (w=8, df cap 50):
    * planted corpus → tokens → window hashes → df-capped index →
    * diagonal pairs → islands → maximal `runs` (unfiltered; each
    * consumer applies its own minRun filter). */
  private val substringRunsSql =
    s"""$plantedSql,
       |t AS (SELECT id, ${Curation.toksSql} AS toks FROM corpus),
       |wins AS (
       |  SELECT id, unnest(generate_series(1, len(toks) - 7)) AS pos, toks
       |  FROM t WHERE len(toks) >= 8),
       |h AS (SELECT id, CAST(pos AS INT) AS pos,
       |    md5(array_to_string(toks[pos:pos+7], ' ')) AS h FROM wins),
       |kept AS (
       |  SELECT id, pos, h FROM (
       |    SELECT id, pos, h, count(*) OVER (PARTITION BY h) AS df FROM h)
       |  WHERE df <= 50),
       |p AS (
       |  SELECT a.id AS id_a, b.id AS id_b, a.pos AS pa, b.pos AS pb
       |  FROM kept a JOIN kept b ON a.h = b.h AND a.id < b.id),
       |isl AS (
       |  SELECT id_a, id_b, pa, pb, pa - pb AS diag,
       |    pa - row_number() OVER (PARTITION BY id_a, id_b, pa - pb ORDER BY pa)
       |      AS g
       |  FROM p),
       |runs AS (
       |  SELECT id_a, id_b, CAST(min(pa) AS INT) AS start_a,
       |    CAST(min(pb) AS INT) AS start_b,
       |    CAST(count(*) + 7 AS BIGINT) AS run_tokens
       |  FROM isl GROUP BY id_a, id_b, diag, g)""".stripMargin

  /** PQ oracle: replays per-subspace seeded k-means (1 iteration, 4
    * codewords over 16-dim slices), corpus encoding, and fixed-order
    * ADC scoring against reconstructed vectors — generated per
    * subspace so the SQL stays mechanical. */
  /** PQ CTE chain (cs/qs … ranked) — shared by the ann_pq oracle and
    * its recall gate. */
  /** The PQ train/encode/ADC chain over caller-supplied `cs`/`qs` CTE
    * bodies — shared by the plain (ann_pq) and the permuted (ann_opq)
    * oracles. */
  private def pqChainOver(csBody: String, qsBody: String): String = {
    val m = 4; val subDim = 16; val kCw = 4
    val subCtes = (0 until m).map { s =>
      val lo = s * subDim + 1; val hi = (s + 1) * subDim
      val sv = s"CAST(c.embedding[$lo:$hi] AS DOUBLE[])"
      s"""seeds$s AS (
         |  SELECT vec_id AS code, CAST(embedding[$lo:$hi] AS DOUBLE[]) AS cw
         |  FROM cs ORDER BY vec_id LIMIT $kCw),
         |asg$s AS (
         |  SELECT vec_id, code FROM (
         |    SELECT c.vec_id, a.code,
         |      row_number() OVER (PARTITION BY c.vec_id ORDER BY
         |        round(list_cosine_similarity($sv, a.cw), 6) DESC, a.code) AS rk
         |    FROM cs c CROSS JOIN seeds$s a) WHERE rk = 1),
         |cb$s AS (
         |  SELECT code, list(m ORDER BY dim) AS cw FROM (
         |    SELECT code, dim, round(avg(x), 6) AS m FROM (
         |      SELECT a.code AS code, generate_subscripts($sv, 1) AS dim,
         |        unnest($sv) AS x
         |      FROM asg$s a JOIN cs c ON a.vec_id = c.vec_id)
         |    GROUP BY code, dim)
         |  GROUP BY code),
         |enc$s AS (
         |  SELECT vec_id, code FROM (
         |    SELECT c.vec_id, b.code,
         |      row_number() OVER (PARTITION BY c.vec_id ORDER BY
         |        round(list_cosine_similarity($sv, b.cw), 6) DESC, b.code) AS rk
         |    FROM cs c CROSS JOIN cb$s b) WHERE rk = 1),
         |nn$s AS (SELECT code, list_dot_product(cw, cw) AS n2 FROM cb$s),
         |lut$s AS (
         |  SELECT q.vec_id AS query_id, b.code,
         |    list_dot_product(CAST(q.embedding[$lo:$hi] AS DOUBLE[]), b.cw) AS d
         |  FROM qs q CROSS JOIN cb$s b)""".stripMargin
    }.mkString(",\n")
    s"""cs AS ($csBody),
       |qs AS ($qsBody),
       |$subCtes,
       |qn AS (
       |  SELECT vec_id AS query_id,
       |    sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
       |      CAST(embedding AS DOUBLE[]))) AS qn
       |  FROM qs),
       |scored AS (
       |  SELECT l0.query_id, e0.vec_id,
       |    (l0.d + l1.d + l2.d + l3.d) /
       |      (q.qn * sqrt(n0.n2 + n1.n2 + n2.n2 + n3.n2)) AS a
       |  FROM enc0 e0
       |  JOIN enc1 e1 ON e1.vec_id = e0.vec_id
       |  JOIN enc2 e2 ON e2.vec_id = e0.vec_id
       |  JOIN enc3 e3 ON e3.vec_id = e0.vec_id
       |  JOIN nn0 n0 ON n0.code = e0.code
       |  JOIN nn1 n1 ON n1.code = e1.code
       |  JOIN nn2 n2 ON n2.code = e2.code
       |  JOIN nn3 n3 ON n3.code = e3.code
       |  JOIN lut0 l0 ON l0.code = e0.code
       |  JOIN lut1 l1 ON l1.code = e1.code AND l1.query_id = l0.query_id
       |  JOIN lut2 l2 ON l2.code = e2.code AND l2.query_id = l0.query_id
       |  JOIN lut3 l3 ON l3.code = e3.code AND l3.query_id = l0.query_id
       |  JOIN qn q ON q.query_id = l0.query_id
       |  WHERE e0.vec_id <> l0.query_id),
       |ranked AS (
       |  SELECT query_id, vec_id, round(a, 6) AS approx_cosine,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY round(a, 6) DESC, vec_id) AS rk
       |  FROM scored)""".stripMargin
  }

  private val pqChainSql: String = pqChainOver(
    "SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 16",
    "SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 8 AND vec_id < 16")

  private val pqOracleSql: String =
    s"""WITH $pqChainSql
       |SELECT query_id, rk, vec_id, approx_cosine
       |FROM ranked WHERE rk <= 5 ORDER BY query_id, rk""".stripMargin

  /** ann_sq8 oracle chain: per-dim integer min/max over 6-dp
    * micro-units, 8-bit codes as floor of one exact IEEE division
    * (identical bits in both engines — integer operands ≤5.1e8/≤4e6
    * are exactly representable; query codes clamp to [0,255]),
    * integer-L2 ranking. Defines cs/qs/ranked for [[annRecallSql]]. */
  private val sq8ChainSql: String = {
    val xi = "CAST(round(CAST(e[i] AS DOUBLE) * 1000000) AS BIGINT)"
    val code =
      s"""CASE WHEN s.mxs[i] = s.mns[i] THEN 0
         |  ELSE greatest(0, least(255, CAST(floor(
         |    CAST(($xi - s.mns[i]) * 255 AS DOUBLE) /
         |    CAST(s.mxs[i] - s.mns[i] AS DOUBLE)) AS BIGINT))) END""".stripMargin
    s"""cs AS MATERIALIZED (
       |  SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 16),
       |qs AS (SELECT vec_id, embedding FROM embeddings
       |       WHERE vec_id >= 8 AND vec_id < 16),
       |stats AS (
       |  SELECT dim, min(xi) AS mn, max(xi) AS mx FROM (
       |    SELECT generate_subscripts(embedding, 1) AS dim,
       |      CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000)
       |        AS BIGINT) AS xi
       |    FROM cs)
       |  GROUP BY dim),
       |sarr AS (SELECT list(mn ORDER BY dim) AS mns,
       |                list(mx ORDER BY dim) AS mxs FROM stats),
       |ccode AS (
       |  SELECT vec_id, list_transform(generate_series(1, len(e)), i ->
       |    $code) AS cc
       |  FROM (SELECT vec_id, embedding AS e FROM cs) CROSS JOIN sarr s),
       |qcode AS (
       |  SELECT vec_id, list_transform(generate_series(1, len(e)), i ->
       |    $code) AS cc
       |  FROM (SELECT vec_id, embedding AS e FROM qs) CROSS JOIN sarr s),
       |pairs AS (
       |  SELECT q.vec_id AS query_id, c.vec_id,
       |    list_reduce(list_transform(generate_series(1, len(c.cc)),
       |      i -> (c.cc[i] - q.cc[i]) * (c.cc[i] - q.cc[i])),
       |      (a, b) -> a + b) AS sq_dist
       |  FROM ccode c CROSS JOIN qcode q),
       |ranked AS (
       |  SELECT query_id, vec_id, sq_dist,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY sq_dist, vec_id) AS rk
       |  FROM pairs)""".stripMargin
  }

  private val sq8OracleSql: String =
    s"""WITH $sq8ChainSql
       |SELECT query_id, rk, vec_id, sq_dist
       |FROM ranked WHERE rk <= 5 ORDER BY query_id, rk""".stripMargin

  /** ann_opq oracle: the variance-snake permutation (exact-integer
    * variance ranking — n·Σx²−(Σx)² over 6-dp micro-units, HUGEINT
    * exact — then snake-dealt to 4 subspaces), applied to both sides,
    * then the SAME PQ chain as ann_pq. `dim` is 1-based here
    * (generate_subscripts) vs Spark's 0-based posexplode — each
    * engine is internally consistent, so ranking and permutation
    * order coincide. */
  private val opqChainSql: String = {
    val m = 4
    val permCtes =
      s"""cs0 AS MATERIALIZED (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 16),
         |qs0 AS (SELECT vec_id, embedding FROM embeddings
         |        WHERE vec_id >= 8 AND vec_id < 16),
         |dimvar AS (
         |  SELECT dim, n * sxx - sx * sx AS v FROM (
         |    SELECT dim, count(*) AS n, sum(xi) AS sx, sum(xi * xi) AS sxx
         |    FROM (
         |      SELECT generate_subscripts(embedding, 1) AS dim,
         |        CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000)
         |          AS BIGINT) AS xi
         |      FROM cs0)
         |    GROUP BY dim)),
         |snake AS (
         |  SELECT dim, rk,
         |    CASE WHEN r0 < $m THEN r0 ELSE ${2 * m - 1} - r0 END AS s
         |  FROM (
         |    SELECT dim, rk, (rk - 1) % ${2 * m} AS r0 FROM (
         |      SELECT dim, row_number() OVER (ORDER BY v DESC, dim) AS rk
         |      FROM dimvar))),
         |perm AS (SELECT list(dim ORDER BY s, rk) AS p FROM snake)""".stripMargin
    permCtes + ",\n" + pqChainOver(
      """SELECT c.vec_id, list_transform(p.p, d -> c.embedding[d]) AS embedding
        |     FROM cs0 c CROSS JOIN perm p""".stripMargin,
      """SELECT q.vec_id, list_transform(p.p, d -> q.embedding[d]) AS embedding
        |     FROM qs0 q CROSS JOIN perm p""".stripMargin)
  }

  private val opqOracleSql: String =
    s"""WITH $opqChainSql
       |SELECT query_id, rk, vec_id, approx_cosine
       |FROM ranked WHERE rk <= 5 ORDER BY query_id, rk""".stripMargin

  /** Replays the full IVF-PQ chain: seeded 1-iteration coarse k-means
    * (4 cells), residuals as exact double subtraction against the
    * 6-dp-rounded centroids, per-subspace 1-iteration residual
    * codebooks (shared across cells), nprobe=2 query routing, and the
    * decomposed ADC score dot(q,c) + Σ_s LUT — every sum in the same
    * fixed left-assoc order as the Spark side. */
  private def ivfPqChainFor(trainWhere: String): String = {
    val m = 4; val subDim = 16; val kCw = 4; val kCells = 4
    val nprobe = 2
    val subCtes = (0 until m).map { s =>
      val lo = s * subDim + 1; val hi = (s + 1) * subDim
      s"""seedsq$s AS (
         |  SELECT vec_id AS code, rv[$lo:$hi] AS cw
         |  FROM tresid ORDER BY vec_id LIMIT $kCw),
         |asg$s AS (
         |  SELECT vec_id, code FROM (
         |    SELECT r.vec_id, a.code,
         |      row_number() OVER (PARTITION BY r.vec_id ORDER BY
         |        round(list_cosine_similarity(r.rv[$lo:$hi], a.cw), 6)
         |          DESC, a.code) AS rk
         |    FROM tresid r CROSS JOIN seedsq$s a) WHERE rk = 1),
         |cb$s AS (
         |  SELECT code, list(m ORDER BY dim) AS cw FROM (
         |    SELECT code, dim, round(avg(x), 6) AS m FROM (
         |      SELECT a.code AS code, generate_subscripts(r.rv[$lo:$hi], 1) AS dim,
         |        unnest(r.rv[$lo:$hi]) AS x
         |      FROM asg$s a JOIN tresid r ON a.vec_id = r.vec_id)
         |    GROUP BY code, dim)
         |  GROUP BY code),
         |enc$s AS (
         |  SELECT vec_id, code FROM (
         |    SELECT r.vec_id, b.code,
         |      row_number() OVER (PARTITION BY r.vec_id ORDER BY
         |        round(list_cosine_similarity(r.rv[$lo:$hi], b.cw), 6)
         |          DESC, b.code) AS rk
         |    FROM resid r CROSS JOIN cb$s b) WHERE rk = 1),
         |t$s AS (
         |  SELECT a.anchor_id AS cell, b.code,
         |    2 * list_dot_product(a.av[$lo:$hi], b.cw)
         |      + list_dot_product(b.cw, b.cw) AS t
         |  FROM cent a CROSS JOIN cb$s b),
         |lut$s AS (
         |  SELECT q.vec_id AS query_id, b.code,
         |    list_dot_product(CAST(q.embedding[$lo:$hi] AS DOUBLE[]), b.cw) AS d
         |  FROM qs q CROSS JOIN cb$s b)""".stripMargin
    }.mkString(",\n")
    s"""cs AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 16),
       |qs AS (SELECT vec_id, embedding FROM embeddings
       |       WHERE vec_id >= 8 AND vec_id < 16),
       |ts AS (SELECT vec_id, embedding FROM cs $trainWhere),
       |seeds AS (
       |  SELECT vec_id AS anchor_id, CAST(embedding AS DOUBLE[]) AS av
       |  FROM ts ORDER BY vec_id LIMIT $kCells),
       |it1 AS (
       |  SELECT vec_id, embedding, anchor_id AS cell FROM (
       |    SELECT c.vec_id, c.embedding, a.anchor_id,
       |      row_number() OVER (PARTITION BY c.vec_id ORDER BY
       |        round(list_cosine_similarity(CAST(c.embedding AS DOUBLE[]),
       |          a.av), 6) DESC, a.anchor_id) AS rk
       |    FROM ts c CROSS JOIN seeds a) WHERE rk = 1),
       |cent AS (
       |  SELECT cell AS anchor_id, list(m ORDER BY dim) AS av FROM (
       |    SELECT cell, dim, round(avg(x), 6) AS m FROM (
       |      SELECT cell, generate_subscripts(CAST(embedding AS DOUBLE[]), 1) AS dim,
       |             unnest(CAST(embedding AS DOUBLE[])) AS x
       |      FROM it1)
       |    GROUP BY cell, dim)
       |  GROUP BY cell),
       |ccell AS (
       |  SELECT vec_id, embedding, anchor_id AS cell FROM (
       |    SELECT c.vec_id, c.embedding, a.anchor_id,
       |      row_number() OVER (PARTITION BY c.vec_id ORDER BY
       |        round(list_cosine_similarity(CAST(c.embedding AS DOUBLE[]),
       |          a.av), 6) DESC, a.anchor_id) AS rk
       |    FROM cs c CROSS JOIN cent a) WHERE rk = 1),
       |cexp AS (
       |  SELECT vec_id, cell,
       |    generate_subscripts(CAST(embedding AS DOUBLE[]), 1) AS dim,
       |    unnest(CAST(embedding AS DOUBLE[])) AS x
       |  FROM ccell),
       |aexp AS (
       |  SELECT anchor_id AS cell, generate_subscripts(av, 1) AS dim,
       |    unnest(av) AS c
       |  FROM cent),
       |resid AS (
       |  SELECT vec_id, cell, list(r ORDER BY dim) AS rv FROM (
       |    SELECT ce.vec_id, ce.cell, ce.dim, ce.x - ae.c AS r
       |    FROM cexp ce JOIN aexp ae ON ae.cell = ce.cell AND ae.dim = ce.dim)
       |  GROUP BY vec_id, cell),
       |tresid AS (
       |  SELECT r.vec_id, r.cell, r.rv
       |  FROM resid r JOIN ts t ON t.vec_id = r.vec_id),
       |$subCtes,
       |cn AS (SELECT anchor_id AS cell, list_dot_product(av, av) AS cn2 FROM cent),
       |qn AS (
       |  SELECT vec_id AS query_id,
       |    sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
       |      CAST(embedding AS DOUBLE[]))) AS qn
       |  FROM qs),
       |qprobe AS (
       |  SELECT query_id, cell, qcdot FROM (
       |    SELECT q.vec_id AS query_id, a.anchor_id AS cell,
       |      list_dot_product(CAST(q.embedding AS DOUBLE[]), a.av) AS qcdot,
       |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
       |        round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
       |          a.av), 6) DESC, a.anchor_id) AS rk
       |    FROM qs q CROSS JOIN cent a) WHERE rk <= $nprobe),
       |scored AS (
       |  SELECT p.query_id, r.vec_id,
       |    (p.qcdot + l0.d + l1.d + l2.d + l3.d) /
       |      (q.qn * sqrt(cn.cn2 + t0.t + t1.t + t2.t + t3.t)) AS a
       |  FROM resid r
       |  JOIN qprobe p ON p.cell = r.cell AND r.vec_id <> p.query_id
       |  JOIN enc0 e0 ON e0.vec_id = r.vec_id
       |  JOIN enc1 e1 ON e1.vec_id = r.vec_id
       |  JOIN enc2 e2 ON e2.vec_id = r.vec_id
       |  JOIN enc3 e3 ON e3.vec_id = r.vec_id
       |  JOIN t0 ON t0.cell = r.cell AND t0.code = e0.code
       |  JOIN t1 ON t1.cell = r.cell AND t1.code = e1.code
       |  JOIN t2 ON t2.cell = r.cell AND t2.code = e2.code
       |  JOIN t3 ON t3.cell = r.cell AND t3.code = e3.code
       |  JOIN cn ON cn.cell = r.cell
       |  JOIN lut0 l0 ON l0.query_id = p.query_id AND l0.code = e0.code
       |  JOIN lut1 l1 ON l1.query_id = p.query_id AND l1.code = e1.code
       |  JOIN lut2 l2 ON l2.query_id = p.query_id AND l2.code = e2.code
       |  JOIN lut3 l3 ON l3.query_id = p.query_id AND l3.code = e3.code
       |  JOIN qn q ON q.query_id = p.query_id),
       |ranked AS (
       |  SELECT query_id, vec_id, round(a, 6) AS approx_cosine,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY round(a, 6) DESC, vec_id) AS rk
       |  FROM scored)""".stripMargin
  }

  private val ivfPqChainSql: String = ivfPqChainFor("")

  /** Same chain with anchors AND codebooks trained on the ~50%
    * deterministic Bernoulli sample (md5-slot < 5000 permyriad, the
    * Sampling.bernoulli predicate) — the 100 TB training shape: the
    * full corpus is still routed and encoded, only the training
    * passes read the sample. */
  private val ivfPqSampledChainSql: String = ivfPqChainFor(
    s"WHERE (${Scale.hexN("md5(CAST(vec_id AS VARCHAR))", 1, 8)}) % 10000 < 5000")

  private val ivfPqOracleSql: String =
    s"""WITH $ivfPqChainSql
       |SELECT query_id, rk, vec_id, approx_cosine
       |FROM ranked WHERE rk <= 5 ORDER BY query_id, rk""".stripMargin

  private val ivfPqSampledOracleSql: String =
    s"""WITH $ivfPqSampledChainSql
       |SELECT query_id, rk, vec_id, approx_cosine
       |FROM ranked WHERE rk <= 5 ORDER BY query_id, rk""".stripMargin

  /** IVF-PQ chain extended with the exact-rerank stage: top-10 ADC
    * candidates re-scored on true cosines (the Ann.rerankTopK twin);
    * ends in `reranked`. */
  private val ivfPqRerankChainSql: String =
    s"""$ivfPqChainSql,
       |cand AS (SELECT query_id, vec_id FROM ranked WHERE rk <= 10),
       |rr AS (
       |  SELECT n.query_id, n.vec_id,
       |    round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
       |      CAST(c.embedding AS DOUBLE[])), 6) AS cosine
       |  FROM cand n JOIN qs q ON q.vec_id = n.query_id
       |              JOIN cs c ON c.vec_id = n.vec_id),
       |reranked AS (
       |  SELECT query_id, vec_id, cosine,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY cosine DESC, vec_id) AS rk
       |  FROM rr)""".stripMargin

  private val ivfPqRerankOracleSql: String =
    s"""WITH $ivfPqRerankChainSql
       |SELECT query_id, rk, vec_id, cosine
       |FROM reranked WHERE rk <= 5 ORDER BY query_id, rk""".stripMargin

  /** LSH CTE chain (cs/qs … ranked) — shared by the ann_lsh oracle
    * and its recall gate. */
  private val lshChainSql: String =
    """cs AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 16),
      |qs AS (SELECT vec_id, embedding FROM embeddings
      |       WHERE vec_id >= 8 AND vec_id < 16),
      |planes AS (
      |  SELECT vec_id AS plane_id, embedding AS pv
      |  FROM embeddings WHERE vec_id < 8),
      |cb AS (
      |  SELECT e.vec_id, e.embedding,
      |    CAST(sum(CASE WHEN list_dot_product(CAST(e.embedding AS DOUBLE[]),
      |        CAST(p.pv AS DOUBLE[])) > 0
      |      THEN (1 << p.plane_id) ELSE 0 END) AS INT) AS bucket
      |  FROM cs e
      |  CROSS JOIN planes p GROUP BY e.vec_id, e.embedding),
      |qb AS (
      |  SELECT e.vec_id, e.embedding,
      |    CAST(sum(CASE WHEN list_dot_product(CAST(e.embedding AS DOUBLE[]),
      |        CAST(p.pv AS DOUBLE[])) > 0
      |      THEN (1 << p.plane_id) ELSE 0 END) AS INT) AS bucket
      |  FROM qs e
      |  CROSS JOIN planes p GROUP BY e.vec_id, e.embedding),
      |scored AS (
      |  SELECT q.vec_id AS query_id, c.vec_id,
      |    round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
      |      CAST(c.embedding AS DOUBLE[])), 6) AS cosine
      |  FROM qb q JOIN cb c ON q.bucket = c.bucket AND c.vec_id <> q.vec_id),
      |ranked AS (
      |  SELECT query_id, vec_id, cosine,
      |    row_number() OVER (PARTITION BY query_id
      |      ORDER BY cosine DESC, vec_id) AS rk
      |  FROM scored)""".stripMargin

  /** LSH chain with labels and a label-DIFFERENCE candidate predicate
    * — the hard-negative miner's oracle chain (lshChainSql's shape;
    * cs/qs carry the label so the recall wrapper's exact sweep can
    * apply the same predicate). */
  private val hardNegChainSql: String =
    """cs AS (SELECT vec_id, label, embedding FROM embeddings WHERE vec_id >= 16),
      |qs AS (SELECT vec_id, label, embedding FROM embeddings
      |       WHERE vec_id >= 8 AND vec_id < 16),
      |planes AS (
      |  SELECT vec_id AS plane_id, embedding AS pv
      |  FROM embeddings WHERE vec_id < 8),
      |cb AS (
      |  SELECT e.vec_id, e.label, e.embedding,
      |    CAST(sum(CASE WHEN list_dot_product(CAST(e.embedding AS DOUBLE[]),
      |        CAST(p.pv AS DOUBLE[])) > 0
      |      THEN (1 << p.plane_id) ELSE 0 END) AS INT) AS bucket
      |  FROM cs e
      |  CROSS JOIN planes p GROUP BY e.vec_id, e.label, e.embedding),
      |qb AS (
      |  SELECT e.vec_id, e.label, e.embedding,
      |    CAST(sum(CASE WHEN list_dot_product(CAST(e.embedding AS DOUBLE[]),
      |        CAST(p.pv AS DOUBLE[])) > 0
      |      THEN (1 << p.plane_id) ELSE 0 END) AS INT) AS bucket
      |  FROM qs e
      |  CROSS JOIN planes p GROUP BY e.vec_id, e.label, e.embedding),
      |scored AS (
      |  SELECT q.vec_id AS query_id, c.vec_id,
      |    round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
      |      CAST(c.embedding AS DOUBLE[])), 6) AS cosine
      |  FROM qb q JOIN cb c ON q.bucket = c.bucket
      |    AND c.vec_id <> q.vec_id AND c.label <> q.label),
      |ranked AS (
      |  SELECT query_id, vec_id, cosine,
      |    row_number() OVER (PARTITION BY query_id
      |      ORDER BY cosine DESC, vec_id) AS rk
      |  FROM scored)""".stripMargin

  /** Wraps an ANN CTE chain (must define qs, cs and ranked) with the
    * exact-top-5 replay and the recall@5 left-join — the oracle twin
    * of [[annRecall]]. */
  private def annRecallSql(chain: String, rel: String = "ranked"): String =
    s"""WITH $chain,
       |approx AS (SELECT query_id, vec_id FROM $rel WHERE rk <= 5),
       |escored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id,
       |    round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
       |      CAST(c.embedding AS DOUBLE[])), 6) AS cosine
       |  FROM qs q JOIN cs c ON c.vec_id <> q.vec_id),
       |eranked AS (
       |  SELECT query_id, vec_id,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY cosine DESC, vec_id) AS rk
       |  FROM escored),
       |exact AS (SELECT query_id, vec_id FROM eranked WHERE rk <= 5)
       |SELECT e.query_id, count(a.vec_id) AS n_hits,
       |  round(count(a.vec_id) / 5.0, 4) AS recall_at_5
       |FROM exact e LEFT JOIN approx a
       |  ON a.query_id = e.query_id AND a.vec_id = e.vec_id
       |GROUP BY e.query_id ORDER BY e.query_id""".stripMargin

  /** DuckDB nibble arithmetic for the first 12 hex chars of an md5
    * (48 bits, positive in a signed BIGINT). */
  private def hex12ToBigint(h: String): String =
    (0 until 12).map { i =>
      val mult = 1L << (4 * (11 - i))
      s"(strpos('0123456789abcdef', substr($h, ${i + 1}, 1)) - 1) * ${mult}::BIGINT"
    }.mkString(" + ")

  /** CTE chain ending in sigs(id, simhash), parameterized by the
    * source relation (must expose id, text). */
  private def simhashSigChain(source: String): String = {
    val votes = (0 until 48).map(j =>
      s"sum(CASE WHEN (hv >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS v$j").mkString(",\n    ")
    val sig = (0 until 48).map(j =>
      s"CASE WHEN v$j > 0 THEN ${1L << j}::BIGINT ELSE 0::BIGINT END").mkString(" + ")
    s"""canon AS (
       |  SELECT id, trim(regexp_replace(regexp_replace(lower(text),
       |    '[^a-z0-9 ]', ' ', 'g'), '\\s+', ' ', 'g')) AS c
       |  FROM $source),
       |tok AS (
       |  SELECT id, unnest(
       |    [x for x in string_split(c, ' ') if x <> '']) AS tok
       |  FROM canon WHERE c <> ''),
       |hv AS (
       |  SELECT id, ${hex12ToBigint("md5(tok)")} AS hv FROM tok),
       |voted AS (
       |  SELECT id,
       |    $votes
       |  FROM hv GROUP BY id),
       |sigs AS (
       |  SELECT id, CAST($sig AS BIGINT) AS simhash FROM voted)""".stripMargin
  }

  /** Shared CTE chain ending in sigs(id, simhash) for the simhash oracles. */
  private lazy val simhashSigCtes: String =
    s"$plantedSql,\n${simhashSigChain("corpus")}"

  /** MinHash+LSH CTE chain (toks → … → verif(id_a, id_b, j)),
    * parameterized by the source relation (must expose id, text) so
    * the pipeline oracle can run the same chain over a FILTERED corpus
    * (exact-dedup survivors). */
  /** toks → sh → sigs → banded chain over `(id, text)` relation
    * `source`, every CTE name prefixed with `p` so two corpora (a
    * history store and a batch) can be banded in ONE query. Replays
    * [[graft.operators.Dedup.minhashBanded]]'s default geometry:
    * 3-word shingles, 6 components of 5 md5 hex chars, 2 bands of 3. */
  private def minhashBandedCtes(source: String, p: String): String =
    s"""${p}toks AS (
       |  SELECT id, [x for x in
       |    string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ')
       |    if x <> ''] AS t
       |  FROM $source),
       |${p}sh AS (
       |  SELECT id, list_distinct(
       |    [array_to_string(t[i:i+2], ' ') for i in range(1, len(t) - 1)]) AS sh
       |  FROM ${p}toks WHERE len(t) >= 3),
       |${p}sigs AS (
       |  SELECT id, sh,
       |    list_aggregate([substr(md5(x), 1, 5) for x in sh], 'min') AS s0,
       |    list_aggregate([substr(md5(x), 6, 5) for x in sh], 'min') AS s1,
       |    list_aggregate([substr(md5(x), 11, 5) for x in sh], 'min') AS s2,
       |    list_aggregate([substr(md5(x), 16, 5) for x in sh], 'min') AS s3,
       |    list_aggregate([substr(md5(x), 21, 5) for x in sh], 'min') AS s4,
       |    list_aggregate([substr(md5(x), 26, 5) for x in sh], 'min') AS s5
       |  FROM ${p}sh),
       |${p}banded AS (
       |  SELECT id, sh,
       |    unnest([md5(s0 || '|' || s1 || '|' || s2),
       |            md5(s3 || '|' || s4 || '|' || s5)]) AS bh,
       |    generate_subscripts([s0, s3], 1) AS band
       |  FROM ${p}sigs)""".stripMargin

  private[queries] def minhashVerifCtes(source: String): String =
    s"""${minhashBandedCtes(source, "")},
       |cand AS (
       |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
       |  FROM banded a JOIN banded b
       |    ON a.band = b.band AND a.bh = b.bh AND a.id < b.id),
       |verif AS (
       |  SELECT id_a, id_b,
       |    len(list_intersect(sa.sh, sb.sh))
       |      / len(list_distinct(sa.sh || sb.sh)) AS j
       |  FROM cand
       |  JOIN sh sa ON sa.id = id_a
       |  JOIN sh sb ON sb.id = id_b)""".stripMargin

  /** Shared MinHash+LSH CTE chain ending in verif(id_a, id_b, j) —
    * used by the pair, components, and apply oracles. */
  private lazy val minhashChain: String =
    s"$plantedSql,\n${minhashVerifCtes("corpus")}"

  /** Recursive min-label closure (verif → comp(node, component)) —
    * the oracle twin of [[graft.operators.Components.connected]],
    * parameterized by the Jaccard verification threshold so callers
    * interpolate the SAME constant they pass the Spark side
    * ([[graft.operators.Dedup.minhashLsh]]'s `threshold`).
    * Needs WITH RECURSIVE. */
  private def componentClosureAt(threshold: Double): String =
    s"""edges AS (SELECT id_a AS u, id_b AS v FROM verif WHERE j >= $threshold),
      |und AS (SELECT u, v FROM edges UNION SELECT v AS u, u AS v FROM edges),
      |cnodes AS (SELECT DISTINCT u AS node FROM und),
      |reach AS (
      |  SELECT node, node AS r FROM cnodes
      |  UNION
      |  SELECT reach.node, und.v AS r FROM reach JOIN und ON und.u = reach.r),
      |comp AS (SELECT node, min(r) AS component FROM reach GROUP BY node)""".stripMargin

  /** Full minhash → components chain over an arbitrary (id, text)
    * relation, for pipeline oracles. Needs WITH RECURSIVE. */
  private[queries] def componentCtesFrom(source: String,
                                         threshold: Double = 0.5): String =
    s"${minhashVerifCtes(source)},\n${componentClosureAt(threshold)}"

  private lazy val componentCtes: String =
    s"$minhashChain,\n${componentClosureAt(0.5)}"

  /** The IVF probe chain (anchors/qs/cs → cell routing → ranked) —
    * shared by the ann_ivf and ann_recall oracles. */
  /** Shared CTE prefix: the ann_knn_graph build (sign-bucketed exact-
    * cosine top-3 neighbor lists over the >=16 corpus) — final tables
    * `gscored`/`granked`; reused verbatim by the graph-search pair. */
  private val knnGraphChainSql: String =
    """cs AS (
      |  SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 16),
      |planes AS (
      |  SELECT vec_id AS plane_id, embedding AS pv
      |  FROM embeddings WHERE vec_id < 6),
      |cb AS (
      |  SELECT e.vec_id, e.embedding,
      |    CAST(sum(CASE WHEN list_dot_product(CAST(e.embedding AS DOUBLE[]),
      |        CAST(p.pv AS DOUBLE[])) > 0
      |      THEN (1 << p.plane_id) ELSE 0 END) AS INT) AS bucket
      |  FROM cs e CROSS JOIN planes p GROUP BY e.vec_id, e.embedding),
      |gscored AS (
      |  SELECT a.vec_id, b.vec_id AS nbr_id,
      |    round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
      |      CAST(b.embedding AS DOUBLE[])), 6) AS cosine
      |  FROM cb a JOIN cb b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id),
      |granked AS (
      |  SELECT vec_id, nbr_id, cosine,
      |    row_number() OVER (PARTITION BY vec_id
      |      ORDER BY cosine DESC, nbr_id) AS rk
      |  FROM gscored)""".stripMargin

  /** The beam-search chain (Ann.graphSearch's fixed geometry: entries
    * 4, beam 8, hops 3) unrolled hop-by-hop as MATERIALIZED CTEs — the
    * graph_lpa discipline. Integer micro-cosine keys make every rank
    * deterministic; the final beam is `beam3`. */
  private val graphBeamChainSql: String = {
    def hopSql(i: Int): String =
      s"""exp$i AS (
         |  SELECT DISTINCT b.query_id, b.qv, a.dst AS node
         |  FROM beam${i - 1} b JOIN adj a ON a.src = b.node),
         |sc$i AS (
         |  SELECT e.query_id, e.qv, e.node,
         |    CAST(round(list_cosine_similarity(CAST(e.qv AS DOUBLE[]),
         |      CAST(c.embedding AS DOUBLE[])) * 1e6) AS BIGINT) AS s
         |  FROM exp$i e JOIN cs c ON c.vec_id = e.node),
         |beam$i AS MATERIALIZED (
         |  SELECT query_id, qv, node, s FROM (
         |    SELECT u.*, row_number() OVER (PARTITION BY query_id
         |      ORDER BY s DESC, node) AS rk2
         |    FROM (SELECT DISTINCT * FROM
         |      (SELECT * FROM beam${i - 1} UNION ALL SELECT * FROM sc$i)) u)
         |  WHERE rk2 <= 8)""".stripMargin
    val search =
      """adj AS MATERIALIZED (
        |  SELECT DISTINCT src, dst FROM (
        |    SELECT vec_id AS src, nbr_id AS dst FROM granked WHERE rk <= 3
        |    UNION ALL
        |    SELECT nbr_id AS src, vec_id AS dst FROM granked WHERE rk <= 3)),
        |q AS (
        |  SELECT vec_id AS query_id, embedding AS qv FROM embeddings
        |  WHERE vec_id >= 8 AND vec_id < 16),
        |entry AS (
        |  SELECT vec_id AS node, embedding AS cv FROM cs
        |  ORDER BY vec_id LIMIT 4),
        |beam0 AS MATERIALIZED (
        |  SELECT query_id, qv, node,
        |    CAST(round(list_cosine_similarity(CAST(qv AS DOUBLE[]),
        |      CAST(cv AS DOUBLE[])) * 1e6) AS BIGINT) AS s
        |  FROM q CROSS JOIN entry)""".stripMargin
    (Seq(knnGraphChainSql, search) ++ (1 to 3).map(hopSql)).mkString(",\n")
  }

  /** The LAYERED beam chain (Ann.hnswSearch's fixed geometry: upper
    * layer vec_id%8==0, entries 4, beam 8, 2 upper + 2 base hops)
    * unrolled as MATERIALIZED CTEs — the graphBeamChainSql generator
    * parameterized by (beam prefix, adjacency, embedding side). The
    * final base beam is `bbeam2`. */
  private val hnswBeamChainSql: String = {
    def hopSql(pfx: String, i: Int, adj: String, cs: String): String =
      s"""${pfx}exp$i AS (
         |  SELECT DISTINCT b.query_id, b.qv, a.dst AS node
         |  FROM ${pfx}beam${i - 1} b JOIN $adj a ON a.src = b.node),
         |${pfx}sc$i AS (
         |  SELECT e.query_id, e.qv, e.node,
         |    CAST(round(list_cosine_similarity(CAST(e.qv AS DOUBLE[]),
         |      CAST(c.embedding AS DOUBLE[])) * 1e6) AS BIGINT) AS s
         |  FROM ${pfx}exp$i e JOIN $cs c ON c.vec_id = e.node),
         |${pfx}beam$i AS MATERIALIZED (
         |  SELECT query_id, qv, node, s FROM (
         |    SELECT u.*, row_number() OVER (PARTITION BY query_id
         |      ORDER BY s DESC, node) AS rk2
         |    FROM (SELECT DISTINCT * FROM
         |      (SELECT * FROM ${pfx}beam${i - 1}
         |       UNION ALL SELECT * FROM ${pfx}sc$i)) u)
         |  WHERE rk2 <= 8)""".stripMargin
    val upperGraph =
      """cs1 AS (SELECT vec_id, embedding FROM cs WHERE vec_id % 8 = 0),
        |cb1 AS (
        |  SELECT e.vec_id, e.embedding,
        |    CAST(sum(CASE WHEN list_dot_product(CAST(e.embedding AS DOUBLE[]),
        |        CAST(p.pv AS DOUBLE[])) > 0
        |      THEN (1 << p.plane_id) ELSE 0 END) AS INT) AS bucket
        |  FROM cs1 e CROSS JOIN planes p GROUP BY e.vec_id, e.embedding),
        |gscored1 AS (
        |  SELECT a.vec_id, b.vec_id AS nbr_id,
        |    round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |      CAST(b.embedding AS DOUBLE[])), 6) AS cosine
        |  FROM cb1 a JOIN cb1 b ON a.bucket = b.bucket
        |    AND a.vec_id <> b.vec_id),
        |granked1 AS (
        |  SELECT vec_id, nbr_id,
        |    row_number() OVER (PARTITION BY vec_id
        |      ORDER BY cosine DESC, nbr_id) AS rk
        |  FROM gscored1),
        |adj1 AS MATERIALIZED (
        |  SELECT DISTINCT src, dst FROM (
        |    SELECT vec_id AS src, nbr_id AS dst FROM granked1 WHERE rk <= 3
        |    UNION ALL
        |    SELECT nbr_id AS src, vec_id AS dst FROM granked1 WHERE rk <= 3)),
        |adj AS MATERIALIZED (
        |  SELECT DISTINCT src, dst FROM (
        |    SELECT vec_id AS src, nbr_id AS dst FROM granked WHERE rk <= 3
        |    UNION ALL
        |    SELECT nbr_id AS src, vec_id AS dst FROM granked WHERE rk <= 3)),
        |q AS (
        |  SELECT vec_id AS query_id, embedding AS qv FROM embeddings
        |  WHERE vec_id >= 8 AND vec_id < 16),
        |entry1 AS (
        |  SELECT vec_id AS node, embedding AS cv FROM cs1
        |  ORDER BY vec_id LIMIT 4),
        |ubeam0 AS MATERIALIZED (
        |  SELECT query_id, qv, node,
        |    CAST(round(list_cosine_similarity(CAST(qv AS DOUBLE[]),
        |      CAST(cv AS DOUBLE[])) * 1e6) AS BIGINT) AS s
        |  FROM q CROSS JOIN entry1)""".stripMargin
    val handoff =
      """bbeam0 AS MATERIALIZED (
        |  SELECT query_id, qv, node, s FROM (
        |    SELECT u.*, row_number() OVER (PARTITION BY query_id
        |      ORDER BY s DESC, node) AS rk2
        |    FROM ubeam2 u)
        |  WHERE rk2 <= 4)""".stripMargin
    (Seq(knnGraphChainSql, upperGraph) ++
      (1 to 2).map(hopSql("u", _, "adj1", "cs1")) ++
      Seq(handoff) ++
      (1 to 2).map(hopSql("b", _, "adj", "cs"))).mkString(",\n")
  }

  /** ann_hnsw's full oracle — shared by `ann_hnsw` and
    * `ann_hnsw_stored` (serve ≡ build). */
  private lazy val annHnswSql: String =
    s"""WITH $hnswBeamChainSql,
       |final AS (
       |  SELECT query_id, node, s,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY s DESC, node) AS rk
       |  FROM bbeam2)
       |SELECT query_id, rk, node AS vec_id, s / 1e6 AS cosine
       |FROM final WHERE rk <= 5 ORDER BY query_id, rk""".stripMargin

  private val ivfChainSql: String =
    """anchors AS (SELECT vec_id AS anchor_id, embedding AS av
      |  FROM embeddings WHERE vec_id < 8),
      |qs AS (SELECT vec_id, embedding FROM embeddings
      |  WHERE vec_id >= 8 AND vec_id < 16),
      |cs AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 16),
      |qcell AS (
      |  SELECT vec_id AS query_id, embedding AS qv, anchor_id AS cell FROM (
      |    SELECT q.vec_id, q.embedding, a.anchor_id,
      |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
      |        round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
      |          CAST(a.av AS DOUBLE[])), 6) DESC, a.anchor_id) AS rk
      |    FROM qs q CROSS JOIN anchors a)
      |  WHERE rk = 1),
      |ccell AS (
      |  SELECT vec_id, embedding AS cv, anchor_id AS cell FROM (
      |    SELECT c.vec_id, c.embedding, a.anchor_id,
      |      row_number() OVER (PARTITION BY c.vec_id ORDER BY
      |        round(list_cosine_similarity(CAST(c.embedding AS DOUBLE[]),
      |          CAST(a.av AS DOUBLE[])), 6) DESC, a.anchor_id) AS rk
      |    FROM cs c CROSS JOIN anchors a)
      |  WHERE rk = 1),
      |scored AS (
      |  SELECT q.query_id, c.vec_id,
      |    round(list_cosine_similarity(CAST(q.qv AS DOUBLE[]),
      |      CAST(c.cv AS DOUBLE[])), 6) AS cosine
      |  FROM qcell q JOIN ccell c ON q.cell = c.cell
      |  WHERE c.vec_id <> q.query_id),
      |ranked AS (
      |  SELECT query_id, vec_id, cosine,
      |    row_number() OVER (PARTITION BY query_id
      |      ORDER BY cosine DESC, vec_id) AS rk
      |  FROM scored)""".stripMargin

  /** Shared by `decontaminate` and `decontaminate_bloom` — the Bloom
    * variant is bit-identical by construction (no false negatives;
    * the exact join removes false positives). */
  private val decontaminateSql: String =
    """WITH train AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 5000000,
      |    'leaked quote follows ' || substr(text, 1, 120) ||
      |      ' and fresh tail words'
      |  FROM documents WHERE doc_id % 37 = 0),
      |bench AS (
      |  SELECT doc_id AS bench_id, substr(text, 1, 120) AS btext
      |  FROM documents WHERE doc_id % 37 = 0),
      |btok AS (
      |  SELECT bench_id, [x for x in
      |    string_split(trim(regexp_replace(btext, '\s+', ' ', 'g')), ' ')
      |    if x <> ''] AS t
      |  FROM bench),
      |bg AS (
      |  SELECT bench_id, unnest(list_distinct(
      |    [array_to_string(t[i:i+7], ' ') for i in range(1, len(t) - 6)])) AS g
      |  FROM btok WHERE len(t) >= 8),
      |ttok AS (
      |  SELECT doc_id, [x for x in
      |    string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ')
      |    if x <> ''] AS t
      |  FROM train),
      |tg AS (
      |  SELECT doc_id, unnest(list_distinct(
      |    [array_to_string(t[i:i+7], ' ') for i in range(1, len(t) - 6)])) AS g
      |  FROM ttok WHERE len(t) >= 8)
      |SELECT doc_id,
      |  CAST(count(DISTINCT bench_id) AS BIGINT) AS n_benchmark_docs,
      |  CAST(count(DISTINCT g) AS BIGINT) AS n_shared_grams
      |FROM tg JOIN bg USING (g)
      |WHERE doc_id <> bench_id
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** The 2-iteration power-method chain (v0 → … → v2/n2) shared by
    * the emb_pca_power and emb_pca_project oracles — the exact replay
    * of [[graft.operators.Pca.iterate]] with dims=64, iters=2. */
  private val pcaChainSql: String =
    """xs AS (
      |  SELECT CAST(embedding AS DOUBLE[]) AS x
      |  FROM embeddings WHERE vec_id >= 16),
      |v0 AS (SELECT list_transform(generate_series(1, 64), i -> 0.125) AS v),
      |d1 AS (SELECT x, round(list_dot_product(x, v0.v), 6) AS d FROM xs, v0),
      |c1 AS (
      |  SELECT t.dim, sum(CAST(round(d * x[t.dim], 6) AS DECIMAL(28,6))) AS s
      |  FROM d1, generate_series(1, 64) AS t(dim) GROUP BY t.dim),
      |s1 AS (SELECT dim, CAST(s AS DOUBLE) AS s FROM c1),
      |n1 AS (SELECT sqrt(list_aggregate(list_sort(list(s * s)), 'sum')) AS nrm
      |       FROM s1),
      |v1 AS (
      |  SELECT list_transform(list_sort(list(struct_pack(dim := dim,
      |    vj := s / (SELECT nrm FROM n1)))), p -> p.vj) AS v
      |  FROM s1),
      |d2 AS (SELECT x, round(list_dot_product(x, (SELECT v FROM v1)), 6) AS d
      |       FROM xs),
      |c2 AS (
      |  SELECT t.dim, sum(CAST(round(d * x[t.dim], 6) AS DECIMAL(28,6))) AS s
      |  FROM d2, generate_series(1, 64) AS t(dim) GROUP BY t.dim),
      |s2 AS (SELECT dim, CAST(s AS DOUBLE) AS s FROM c2),
      |n2 AS (SELECT sqrt(list_aggregate(list_sort(list(s * s)), 'sum')) AS nrm
      |       FROM s2),
      |v2 AS (
      |  SELECT list_transform(list_sort(list(struct_pack(dim := dim,
      |    vj := s / (SELECT nrm FROM n2)))), p -> p.vj) AS v
      |  FROM s2)""".stripMargin

  /** Marker-heuristic prediction CASE chain (the text_langid oracle
    * formula), reused by the langid_nb eval head-to-head. */
  private def markerPredSql: String = {
    val scores = TextAnalysis.langMarkers.map { case (lang, m) =>
      s"len(regexp_extract_all(lower(text), '\\b(${m.mkString("|")})\\b')) AS s_$lang"
    }.mkString(",\n    ")
    val langs = TextAnalysis.langMarkers.map(_._1)
    val g = s"greatest(${langs.map("s_" + _).mkString(", ")})"
    val pred = langs.map(l => s"WHEN s_$l = $g THEN '$l'").mkString(" ")
    s"""msc AS (
       |  SELECT doc_id, lang, text, $scores
       |  FROM documents),
       |mpred AS (
       |  SELECT doc_id, lang, text, CASE $pred END AS pred_marker
       |  FROM msc)""".stripMargin
  }

  /** Shared CTE chain of the langid_nb oracle family: hashed
    * char-trigram features (md5 last-two-hex bucket, the
    * text_feature_hash idiom), the 80%-slice NB model in integer
    * micro-nats (the nbModelSql shape, 5 classes), and per-doc
    * per-class integer costs over the FULL corpus. */
  private def langidNbSql: String = {
    val langVals = langidLangs.map(l => s"('$l')").mkString(", ")
    // the langidAlpha language-tail replay: 32 unrolled alphabet picks
    // (engine-exact — no lambdas, the list_reduce flake lesson)
    val alphaCase = "CASE lang " + langidAlpha.map { case (l, a) =>
      s"WHEN '$l' THEN '$a'"
    }.mkString(" ") + " ELSE '________' END"
    val tailExpr = (1 to 32).map { k =>
      s"substr(alpha, (strpos('0123456789abcdef', substr(lh, $k, 1)) - 1)" +
        s" % 8 + 1, 1)"
    }.mkString(" || ")
    s"""$markerPredSql,
       |lt AS (
       |  SELECT doc_id, lang, pred_marker,
       |    substr(regexp_replace(lower(text), '\\s+', ' ', 'g'), 1, 96) ||
       |      $tailExpr AS t
       |  FROM (SELECT *, $alphaCase AS alpha,
       |          md5(CAST(doc_id AS VARCHAR) || '-lt') AS lh
       |        FROM mpred)),
       |lf AS MATERIALIZED (
       |  SELECT doc_id, lang, pred_marker,
       |    [CAST((strpos('0123456789abcdef',
       |             substr(md5(substr(t, i, 3)), 31, 1)) - 1) * 16 +
       |          (strpos('0123456789abcdef',
       |             substr(md5(substr(t, i, 3)), 32, 1)) - 1) AS VARCHAR)
       |     for i in range(1, len(t) - 1)] AS feats
       |  FROM lt),
       |ltrain AS (SELECT * FROM lf WHERE ${Curation.slotSql("doc_id")} >= 2000),
       |lcensus AS MATERIALIZED (
       |  SELECT lang AS label, token, count(*) AS cnt
       |  FROM (SELECT lang, unnest(feats) AS token FROM ltrain)
       |  GROUP BY 1, 2),
       |ltotals AS (
       |  SELECT label, CAST(sum(cnt) AS BIGINT) AS total
       |  FROM lcensus GROUP BY label),
       |lvocab AS (
       |  SELECT CAST(count(DISTINCT token) AS BIGINT) AS v FROM lcensus),
       |lmodel AS MATERIALIZED (
       |  SELECT c.label, c.token, CAST(c.cnt AS BIGINT) AS cnt,
       |    CAST(round(-ln((c.cnt + 1.0) / (t.total + v.v)) * 1e6) AS BIGINT)
       |      AS cost
       |  FROM lcensus c JOIN ltotals t ON t.label = c.label
       |  CROSS JOIN lvocab v
       |  UNION ALL
       |  SELECT n.label, '__prior__', CAST(n.n AS BIGINT),
       |    CAST(round(-ln(CAST(n.n AS DOUBLE) / a.n_all) * 1e6) AS BIGINT)
       |  FROM (SELECT lang AS label, count(*) AS n FROM ltrain GROUP BY 1) n
       |  CROSS JOIN (SELECT CAST(count(*) AS DOUBLE) AS n_all FROM ltrain) a
       |  UNION ALL
       |  SELECT t.label, '__unseen__', CAST(0 AS BIGINT),
       |    CAST(round(-ln(1.0 / (t.total + v.v)) * 1e6) AS BIGINT)
       |  FROM ltotals t CROSS JOIN lvocab v),
       |lpercls AS MATERIALIZED (
       |  SELECT d.doc_id, l.label AS cls,
       |    CAST(sum(coalesce(m.cost, u.cost)) AS BIGINT) AS tc
       |  FROM (SELECT doc_id, unnest(feats) AS token FROM lf) d
       |  CROSS JOIN (VALUES $langVals) l(label)
       |  JOIN lmodel u ON u.label = l.label AND u.token = '__unseen__'
       |  LEFT JOIN lmodel m ON m.label = l.label AND m.token = d.token
       |    AND m.token NOT IN ('__prior__', '__unseen__')
       |  GROUP BY d.doc_id, l.label),
       |lcost AS MATERIALIZED (
       |  SELECT b.doc_id, b.lang, b.pred_marker, l.label,
       |    CAST(p.cost + coalesce(pc.tc, 0) AS BIGINT) AS cost
       |  FROM lf b
       |  CROSS JOIN (VALUES $langVals) l(label)
       |  JOIN lmodel p ON p.label = l.label AND p.token = '__prior__'
       |  LEFT JOIN lpercls pc ON pc.doc_id = b.doc_id AND pc.cls = l.label),
       |lpred AS MATERIALIZED (
       |  SELECT doc_id, lang, pred_marker, label AS pred FROM (
       |    SELECT *, row_number() OVER (PARTITION BY doc_id
       |      ORDER BY cost, label) AS rk
       |    FROM lcost) WHERE rk = 1)""".stripMargin
  }

  /** The mm_phash_jpeg oracle — the analytic BLOCK contract of
    * JpegCodec.synthJpegs: dHash cell (r,c) samples pixel (8c, 8r) =
    * the constant of block (bx=c, by=r); v = byte bx of
    * md5("j(id÷2)-by") mod 200 + id mod 2 — the Huffman/restart/IDCT
    * plumbing in between is what the Spark side proves (lossless for
    * DC-only blocks at DC quant step 8). Shared VERBATIM by
    * mm_phash_jpeg_prog (same patterns, progressive encodings —
    * progressive ≡ baseline on decoded pixels). */
  private def mmPhashJpegSql: String = {
    val gExprs = for (r <- 0 to 5; c <- 0 to 8) yield {
      val p = 2 * c + 1
      val h = s"md5('j' || CAST(doc_id // 2 AS VARCHAR) || '-$r')"
      def nib(pos: Int) =
        s"(strpos('0123456789abcdef', substr($h, $pos, 1)) - 1)"
      s"((16 * ${nib(p)} + ${nib(p + 1)}) % 200 + (doc_id % 2))"
    }
    val bits = (47 to 0 by -1).map { kk =>
      val r = kk >> 3; val c = kk & 7
      val i1 = r * 9 + c + 1
      s"(CASE WHEN g[$i1] > g[${i1 + 1}] THEN ${1L << kk} ELSE 0 END)"
    }.mkString(" + ")
    s"""WITH mm AS (
       |  SELECT doc_id,
       |    [${gExprs.mkString(", ")}] AS g
       |  FROM documents),
       |sigs AS (
       |  SELECT doc_id AS id, CAST($bits AS BIGINT) AS phash FROM mm),
       |banded AS (
       |  SELECT id, phash,
       |    unnest([(phash >> 0) & 4095, (phash >> 12) & 4095,
       |            (phash >> 24) & 4095, (phash >> 36) & 4095]) AS bv,
       |    generate_subscripts([1, 2, 3, 4], 1) AS band
       |  FROM sigs),
       |cand AS (
       |  SELECT DISTINCT a.id AS id_a, b.id AS id_b,
       |    a.phash AS ph_a, b.phash AS ph_b
       |  FROM banded a JOIN banded b
       |    ON a.band = b.band AND a.bv = b.bv AND a.id < b.id)
       |SELECT id_a, id_b,
       |  CAST(bit_count(xor(ph_a, ph_b)) AS INT) AS hamming
       |FROM cand WHERE bit_count(xor(ph_a, ph_b)) <= 6
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** The langid_nb_apply oracle — shared verbatim by langid_nb_stored
    * (stored ≡ fresh is the determinism contract). */
  private def langidApplySql: String = {
    val costCols = langidLangs.map(l =>
      s"max(CASE WHEN label = '$l' THEN cost END) AS cost_$l")
      .mkString(",\n  ")
    s"""WITH $langidNbSql,
       |piv AS (
       |  SELECT doc_id, $costCols
       |  FROM lcost GROUP BY doc_id)
       |SELECT p.doc_id, r.lang, r.pred,
       |  ${langidLangs.map(l => s"CAST(p.cost_$l AS BIGINT) AS cost_$l")
           .mkString(", ")}
       |FROM piv p JOIN lpred r ON r.doc_id = p.doc_id
       |ORDER BY p.doc_id""".stripMargin
  }

  /** The label-aware IVF chain (ann_filtered_ivf family): the
    * ivfChainSql routing with the label carried through and PREPENDED
    * to the cell join key. */
  private val filteredIvfChainSql: String =
    """fanchors AS (SELECT vec_id AS anchor_id, embedding AS av
      |  FROM embeddings WHERE vec_id < 8),
      |fqs AS (SELECT vec_id, label, embedding FROM embeddings
      |  WHERE vec_id >= 8 AND vec_id < 16),
      |fcs AS (SELECT vec_id, label, embedding FROM embeddings
      |  WHERE vec_id >= 16),
      |fqcell AS (
      |  SELECT vec_id AS query_id, label, embedding AS qv,
      |    anchor_id AS cell FROM (
      |    SELECT q.vec_id, q.label, q.embedding, a.anchor_id,
      |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
      |        round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
      |          CAST(a.av AS DOUBLE[])), 6) DESC, a.anchor_id) AS rk
      |    FROM fqs q CROSS JOIN fanchors a)
      |  WHERE rk = 1),
      |fccell AS (
      |  SELECT vec_id, label, embedding AS cv, anchor_id AS cell FROM (
      |    SELECT c.vec_id, c.label, c.embedding, a.anchor_id,
      |      row_number() OVER (PARTITION BY c.vec_id ORDER BY
      |        round(list_cosine_similarity(CAST(c.embedding AS DOUBLE[]),
      |          CAST(a.av AS DOUBLE[])), 6) DESC, a.anchor_id) AS rk
      |    FROM fcs c CROSS JOIN fanchors a)
      |  WHERE rk = 1),
      |fscored AS (
      |  SELECT q.query_id, c.vec_id,
      |    round(list_cosine_similarity(CAST(q.qv AS DOUBLE[]),
      |      CAST(c.cv AS DOUBLE[])), 6) AS cosine
      |  FROM fqcell q JOIN fccell c
      |    ON q.label = c.label AND q.cell = c.cell
      |  WHERE c.vec_id <> q.query_id),
      |franked AS (
      |  SELECT query_id, vec_id, cosine,
      |    row_number() OVER (PARTITION BY query_id
      |      ORDER BY cosine DESC, vec_id) AS rk
      |  FROM fscored)""".stripMargin

  def oracle: Map[String, String] = Map(
    "dedup_exact" ->
      s"""WITH $plantedSql
         |SELECT md5(text) AS text_hash, count(*) AS n_copies,
         |  min(id) AS keep_id, max(id) AS drop_max_id
         |FROM corpus GROUP BY md5(text) HAVING count(*) > 1
         |ORDER BY text_hash""".stripMargin,

    "dedup_minhash_lsh" ->
      s"""WITH $minhashChain
         |SELECT id_a, id_b, round(j, 4) AS jaccard
         |FROM verif WHERE j >= 0.5 ORDER BY id_a, id_b""".stripMargin,

    "dedup_minhash_est" ->
      s"""WITH $minhashChain,
         |est AS (
         |  SELECT c.id_a, c.id_b,
         |    CAST((sa.s0 = sb.s0)::INT + (sa.s1 = sb.s1)::INT +
         |      (sa.s2 = sb.s2)::INT + (sa.s3 = sb.s3)::INT +
         |      (sa.s4 = sb.s4)::INT + (sa.s5 = sb.s5)::INT AS DOUBLE)
         |      / 6.0 AS est
         |  FROM cand c
         |  JOIN sigs sa ON sa.id = c.id_a
         |  JOIN sigs sb ON sb.id = c.id_b)
         |SELECT e.id_a, e.id_b, round(e.est, 4) AS est_jaccard,
         |  round(v.j, 4) AS jaccard, round(abs(e.est - v.j), 4) AS abs_err
         |FROM est e JOIN verif v ON v.id_a = e.id_a AND v.id_b = e.id_b
         |ORDER BY e.id_a, e.id_b""".stripMargin,

    "dedup_rate_curve" ->
      s"""WITH $minhashChain,
         |est AS (
         |  SELECT c.id_a, c.id_b,
         |    CAST((sa.s0 = sb.s0)::INT + (sa.s1 = sb.s1)::INT +
         |      (sa.s2 = sb.s2)::INT + (sa.s3 = sb.s3)::INT +
         |      (sa.s4 = sb.s4)::INT + (sa.s5 = sb.s5)::INT AS DOUBLE)
         |      / 6.0 AS est
         |  FROM cand c
         |  JOIN sigs sa ON sa.id = c.id_a
         |  JOIN sigs sb ON sb.id = c.id_b),
         |p AS (
         |  SELECT round(e.est, 4) AS est, round(v.j, 4) AS j
         |  FROM est e JOIN verif v ON v.id_a = e.id_a AND v.id_b = e.id_b),
         |th AS (SELECT unnest([0.5::DOUBLE, 0.6, 0.7, 0.8, 0.9]) AS t)
         |SELECT t,
         |  CAST(sum(CASE WHEN est >= t THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_est,
         |  CAST(sum(CASE WHEN j >= t THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_true,
         |  CAST(sum(CASE WHEN est >= t AND j >= t THEN 1 ELSE 0 END)
         |    AS BIGINT) AS tp,
         |  round(CASE WHEN sum(CASE WHEN est >= t THEN 1 ELSE 0 END) > 0
         |    THEN CAST(sum(CASE WHEN est >= t AND j >= t THEN 1 ELSE 0 END)
         |      AS DOUBLE) / sum(CASE WHEN est >= t THEN 1 ELSE 0 END)
         |    ELSE 0.0 END, 4) AS precision,
         |  round(CASE WHEN sum(CASE WHEN j >= t THEN 1 ELSE 0 END) > 0
         |    THEN CAST(sum(CASE WHEN est >= t AND j >= t THEN 1 ELSE 0 END)
         |      AS DOUBLE) / sum(CASE WHEN j >= t THEN 1 ELSE 0 END)
         |    ELSE 0.0 END, 4) AS recall
         |FROM p CROSS JOIN th GROUP BY t ORDER BY t""".stripMargin,

    "dedup_substring" ->
      s"""WITH $substringRunsSql
         |SELECT id_a, id_b, start_a, start_b, run_tokens FROM runs
         |WHERE run_tokens >= 12
         |ORDER BY id_a, id_b, start_a""".stripMargin,

    "dedup_substring_apply" ->
      s"""WITH $substringRunsSql,
         |tokp AS (
         |  SELECT id, CAST(i AS BIGINT) AS pos, toks[i] AS tok FROM (
         |    SELECT id, toks, unnest(generate_series(1, len(toks))) AS i
         |    FROM t WHERE len(toks) > 0)),
         |covered AS (
         |  SELECT DISTINCT id, pos FROM (
         |    SELECT id_b AS id,
         |      unnest(generate_series(CAST(start_b AS BIGINT),
         |        CAST(start_b AS BIGINT) + run_tokens - 1)) AS pos
         |    FROM runs WHERE run_tokens >= 12)),
         |keptTok AS (
         |  SELECT p.id, count(*) AS n_kept,
         |    md5(string_agg(p.tok, ' ' ORDER BY p.pos)) AS clean_hash
         |  FROM tokp p LEFT JOIN covered c ON c.id = p.id AND c.pos = p.pos
         |  WHERE c.id IS NULL GROUP BY p.id)
         |SELECT tt.id, tt.n_tok, COALESCE(k.n_kept, 0) AS n_kept, k.clean_hash
         |FROM (SELECT id, count(*) AS n_tok FROM tokp GROUP BY id) tt
         |LEFT JOIN keptTok k ON k.id = tt.id
         |ORDER BY tt.id""".stripMargin,

    "dedup_components" ->
      s"""WITH RECURSIVE $componentCtes
         |SELECT node AS id, component FROM comp ORDER BY id""".stripMargin,

    "dedup_cluster_stats" ->
      s"""WITH RECURSIVE $componentCtes,
         |sizes AS (
         |  SELECT component, count(*) AS cluster_size
         |  FROM comp GROUP BY component)
         |SELECT cluster_size, count(*) AS n_clusters
         |FROM sizes GROUP BY cluster_size ORDER BY cluster_size""".stripMargin,

    "dedup_apply" ->
      s"""WITH RECURSIVE $componentCtes,
         |drops AS (SELECT node FROM comp WHERE node <> component)
         |SELECT c.id, md5(c.text) AS text_hash FROM corpus c
         |WHERE c.id NOT IN (SELECT node FROM drops)
         |ORDER BY c.id""".stripMargin,

    "dedup_simhash" ->
      s"""WITH $simhashSigCtes
         |SELECT a.id AS id_a, b.id AS id_b, a.simhash
         |FROM sigs a JOIN sigs b ON a.simhash = b.simhash AND a.id < b.id
         |ORDER BY id_a, id_b""".stripMargin,

    "dedup_simhash_near" ->
      s"""WITH $simhashSigCtes,
         |banded AS (
         |  SELECT id, simhash,
         |    unnest([(simhash >> 0) & 4095, (simhash >> 12) & 4095,
         |            (simhash >> 24) & 4095, (simhash >> 36) & 4095]) AS bv,
         |    generate_subscripts([1, 2, 3, 4], 1) AS band
         |  FROM sigs),
         |cand AS (
         |  SELECT DISTINCT a.id AS id_a, b.id AS id_b,
         |    a.simhash AS sh_a, b.simhash AS sh_b
         |  FROM banded a JOIN banded b
         |    ON a.band = b.band AND a.bv = b.bv AND a.id < b.id)
         |SELECT id_a, id_b,
         |  CAST(bit_count(xor(sh_a, sh_b)) AS INT) AS hamming
         |FROM cand WHERE bit_count(xor(sh_a, sh_b)) <= 3
         |ORDER BY id_a, id_b""".stripMargin,

    "dedup_lines" ->
      s"""WITH $multilineSql,
         |lr AS (SELECT id, string_split(text, chr(10)) AS a FROM docs),
         |lines AS (
         |  SELECT id, pos, line FROM (
         |    SELECT id, generate_subscripts(a, 1) AS pos,
         |      lower(trim(regexp_replace(unnest(a), '\\s+', ' ', 'g'))) AS line
         |    FROM lr)
         |  WHERE length(line) > 0)
         |SELECT line, count(DISTINCT id) AS n_docs, count(*) AS n_occ
         |FROM lines GROUP BY line HAVING count(DISTINCT id) >= 5
         |ORDER BY line""".stripMargin,

    "dedup_lines_apply" ->
      s"""WITH $multilineSql,
         |lr AS (SELECT id, string_split(text, chr(10)) AS a FROM docs),
         |lines AS (
         |  SELECT id, pos, line FROM (
         |    SELECT id, generate_subscripts(a, 1) AS pos,
         |      lower(trim(regexp_replace(unnest(a), '\\s+', ' ', 'g'))) AS line
         |    FROM lr)
         |  WHERE length(line) > 0),
         |ranked AS (
         |  SELECT id, pos, line,
         |    row_number() OVER (PARTITION BY line ORDER BY id, pos) AS rk
         |  FROM lines),
         |kept AS (
         |  SELECT id, count(*) AS n_kept,
         |    md5(string_agg(line, chr(10) ORDER BY pos)) AS clean_hash
         |  FROM ranked WHERE rk = 1 GROUP BY id),
         |tot AS (SELECT id, count(*) AS n_lines FROM lines GROUP BY id)
         |SELECT t.id, t.n_lines,
         |  CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept, k.clean_hash
         |FROM tot t LEFT JOIN kept k ON k.id = t.id
         |ORDER BY t.id""".stripMargin,

    "dedup_ngram_jaccard" ->
      """WITH names AS (SELECT DISTINCT p_name AS name FROM part),
        |grams AS (
        |  SELECT name, list_distinct(
        |    [substr(name, i, 3) for i in range(1, len(name) - 1)]) AS g
        |  FROM names WHERE len(name) >= 3),
        |inv AS (
        |  SELECT name, len(g) AS n, unnest(g) AS gram FROM grams),
        |pairs AS (
        |  SELECT a.name AS name_a, b.name AS name_b, count(*) AS common,
        |    any_value(a.n) AS n_a, any_value(b.n) AS n_b
        |  FROM inv a JOIN inv b ON a.gram = b.gram AND a.name < b.name
        |  GROUP BY a.name, b.name)
        |SELECT name_a, name_b,
        |  round(common / (n_a + n_b - common), 4) AS jaccard
        |FROM pairs WHERE common / (n_a + n_b - common) >= 0.25
        |ORDER BY name_a, name_b""".stripMargin,

    // Full-index join on purpose — independently proves the prefix
    // filter lost nothing.
    "simjoin_prefix" ->
      s"""WITH $plantedSql,
         |heads AS (SELECT id, substr(text, 1, 60) AS h FROM corpus),
         |words AS (
         |  SELECT id, list_filter(string_split(
         |    trim(regexp_replace(h, '\\s+', ' ', 'g')), ' '),
         |    x -> len(x) > 0) AS w
         |  FROM heads),
         |toksets AS (
         |  SELECT id, list_distinct(
         |    [w[i] || '_' || w[i + 1] for i in range(1, len(w))]) AS toks
         |  FROM words WHERE len(w) >= 2),
         |sized AS (
         |  SELECT id, toks, len(toks) AS n FROM toksets WHERE len(toks) > 0),
         |inv AS (SELECT id, n, unnest(toks) AS tok FROM sized),
         |pairs AS (
         |  SELECT a.id AS id_a, b.id AS id_b, count(*) AS common,
         |    any_value(a.n) AS n_a, any_value(b.n) AS n_b
         |  FROM inv a JOIN inv b ON a.tok = b.tok AND a.id < b.id
         |  GROUP BY a.id, b.id)
         |SELECT id_a, id_b,
         |  round(common / (n_a + n_b - common), 4) AS jaccard
         |FROM pairs WHERE common / (n_a + n_b - common) >= 0.6
         |ORDER BY id_a, id_b""".stripMargin,

    // Full gram-index join on purpose — independently proves the
    // Ed-Join prefix filter lost nothing.
    "simjoin_edit" ->
      """WITH base AS (
        |  SELECT doc_id AS id, substr(text, 1, 40) AS s FROM documents),
        |named AS MATERIALIZED (
        |  SELECT id, s FROM base
        |  UNION ALL
        |  SELECT id + 1000000, substr(s, 1, 4) || substr(s, 6)
        |  FROM base WHERE id % 5 = 0),
        |typed AS (
        |  SELECT id, CASE WHEN length(s) >= 3 THEN
        |    list_distinct([substr(s, i, 3) for i in range(1, length(s) - 1)])
        |    ELSE [] END AS grams
        |  FROM named),
        |g AS (SELECT id, unnest(grams) AS gram FROM typed),
        |shorts AS (SELECT id FROM typed WHERE len(grams) <= 3),
        |cand AS (
        |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
        |  FROM g a JOIN g b ON a.gram = b.gram AND a.id < b.id
        |  UNION
        |  SELECT a.id, b.id FROM shorts a JOIN shorts b ON a.id < b.id)
        |SELECT id_a, id_b, CAST(levenshtein(x.s, y.s) AS BIGINT) AS dist
        |FROM cand JOIN named x ON x.id = id_a JOIN named y ON y.id = id_b
        |WHERE abs(length(x.s) - length(y.s)) <= 1
        |  AND levenshtein(x.s, y.s) <= 1
        |ORDER BY id_a, id_b""".stripMargin,

    "dedup_ngram_docs" ->
      s"""WITH $plantedSql,
         |heads AS (SELECT id, substr(text, 1, 60) AS h FROM corpus),
         |g AS (
         |  SELECT id, unnest(list_distinct(
         |    [substr(h, i, 3) for i in range(1, len(h) - 1)])) AS gram
         |  FROM heads WHERE len(h) >= 3),
         |freq AS (SELECT gram FROM g GROUP BY gram HAVING count(*) <= 50),
         |kept AS (SELECT g.id, g.gram FROM g JOIN freq USING (gram)),
         |n AS (SELECT id, count(*) AS n FROM kept GROUP BY id),
         |pairs AS (
         |  SELECT a.id AS id_a, b.id AS id_b, count(*) AS common,
         |    any_value(na.n) AS n_a, any_value(nb.n) AS n_b
         |  FROM kept a JOIN kept b ON a.gram = b.gram AND a.id < b.id
         |  JOIN n na ON na.id = a.id JOIN n nb ON nb.id = b.id
         |  GROUP BY a.id, b.id)
         |SELECT id_a, id_b,
         |  round(common / (n_a + n_b - common), 4) AS jaccard
         |FROM pairs WHERE common / (n_a + n_b - common) >= 0.4
         |ORDER BY id_a, id_b""".stripMargin,

    "ann_cell_balance" ->
      """WITH cs AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 16),
        |seeds AS (
        |  SELECT vec_id AS anchor_id, CAST(embedding AS DOUBLE[]) AS av
        |  FROM cs ORDER BY vec_id LIMIT 4),
        |it1 AS (
        |  SELECT vec_id, embedding, anchor_id AS cell FROM (
        |    SELECT c.vec_id, c.embedding, a.anchor_id,
        |      row_number() OVER (PARTITION BY c.vec_id ORDER BY
        |        round(list_cosine_similarity(CAST(c.embedding AS DOUBLE[]),
        |          a.av), 6) DESC, a.anchor_id) AS rk
        |    FROM cs c CROSS JOIN seeds a) WHERE rk = 1),
        |cent AS (
        |  SELECT cell AS anchor_id, list(m ORDER BY dim) AS av FROM (
        |    SELECT cell, dim, round(avg(x), 6) AS m FROM (
        |      SELECT cell, generate_subscripts(CAST(embedding AS DOUBLE[]), 1) AS dim,
        |             unnest(CAST(embedding AS DOUBLE[])) AS x
        |      FROM it1)
        |    GROUP BY cell, dim)
        |  GROUP BY cell),
        |asg AS (
        |  SELECT vec_id, anchor_id AS cell FROM (
        |    SELECT c.vec_id, a.anchor_id,
        |      row_number() OVER (PARTITION BY c.vec_id ORDER BY
        |        round(list_cosine_similarity(CAST(c.embedding AS DOUBLE[]),
        |          a.av), 6) DESC, a.anchor_id) AS rk
        |    FROM cs c CROSS JOIN cent a) WHERE rk = 1),
        |counts AS (SELECT cell, count(*) AS n_vecs FROM asg GROUP BY cell)
        |SELECT cell, n_vecs,
        |  round(CAST(n_vecs AS DOUBLE)
        |    / CAST(sum(n_vecs) OVER () AS DOUBLE), 4) AS share
        |FROM counts ORDER BY cell""".stripMargin,

    "emb_outliers" ->
      """WITH cs AS (
        |  SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 16),
        |cent AS (
        |  SELECT list_transform(list_sort(list(struct_pack(dim := dim,
        |      m := m))), p -> p.m) AS cv
        |  FROM (
        |    SELECT dim, round(avg(x), 6) AS m FROM (
        |      SELECT generate_subscripts(CAST(embedding AS DOUBLE[]), 1)
        |        AS dim,
        |        unnest(CAST(embedding AS DOUBLE[])) AS x
        |      FROM cs)
        |    GROUP BY dim)),
        |scored AS (
        |  SELECT vec_id,
        |    round(list_cosine_similarity(CAST(embedding AS DOUBLE[]), cv),
        |      6) AS cos_centroid
        |  FROM cs, cent),
        |thr AS (
        |  SELECT round(quantile_cont(cos_centroid, 0.01), 6) AS thr
        |  FROM scored)
        |SELECT vec_id, cos_centroid, cos_centroid < thr.thr AS is_outlier
        |FROM scored, thr ORDER BY vec_id""".stripMargin,

    "emb_norm_stats" ->
      """WITH v AS (
        |  SELECT label,
        |    round(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
        |      CAST(embedding AS DOUBLE[]))), 6) AS nrm
        |  FROM embeddings)
        |SELECT label, count(*) AS n_vecs,
        |  round(CAST(sum(CAST(nrm AS DECIMAL(18,6))) AS DOUBLE)
        |    / count(*), 6) AS mean_norm,
        |  min(nrm) AS min_norm, max(nrm) AS max_norm,
        |  CAST(sum(CASE WHEN nrm = 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero
        |FROM v GROUP BY label ORDER BY label""".stripMargin,

    "dedup_incremental" ->
      """WITH hist AS (
        |  SELECT DISTINCT md5(text) AS h FROM documents WHERE doc_id < 250),
        |batch AS (
        |  SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id >= 250
        |  UNION ALL
        |  SELECT doc_id + 1000000, md5(text) FROM documents
        |  WHERE doc_id < 250 AND doc_id % 13 = 0
        |  UNION ALL
        |  SELECT doc_id + 2000000, md5(text) FROM documents
        |  WHERE doc_id >= 250 AND doc_id % 41 = 0),
        |fresh AS (
        |  SELECT b.doc_id, b.h FROM batch b
        |  LEFT JOIN hist ON hist.h = b.h WHERE hist.h IS NULL)
        |SELECT min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM fresh GROUP BY h ORDER BY keep_id""".stripMargin,

    // Replays the band-store chain: history and batch banded with the
    // identical geometry (shared prefixed CTE generator), store = the
    // DISTINCT history (band, bh) rows, any-band collision drops the
    // batch doc, survivors run the standard verified minhash →
    // component closure, clusters keep min id.
    "dedup_incremental_near" ->
      s"""WITH RECURSIVE histsrc AS (
         |  SELECT doc_id AS id, text FROM documents WHERE doc_id < 250),
         |batchsrc AS (
         |  SELECT doc_id AS id, text FROM documents WHERE doc_id >= 250
         |  UNION ALL
         |  SELECT doc_id + 1000000, regexp_replace(text, '^\\S+\\s+', '')
         |  FROM documents WHERE doc_id < 250 AND doc_id % 13 = 0
         |  UNION ALL
         |  SELECT doc_id + 2000000, text FROM documents
         |  WHERE doc_id >= 250 AND doc_id % 41 = 0),
         |${minhashBandedCtes("histsrc", "h")},
         |store AS (SELECT DISTINCT band, bh FROM hbanded),
         |${minhashBandedCtes("batchsrc", "b")},
         |hits AS (
         |  SELECT DISTINCT b.id FROM bbanded b
         |  JOIN store s ON s.band = b.band AND s.bh = b.bh),
         |surv AS (
         |  SELECT id, text FROM batchsrc
         |  WHERE id NOT IN (SELECT id FROM hits)),
         |${minhashVerifCtes("surv")},
         |${componentClosureAt(0.5)},
         |kept AS (
         |  SELECT s.id, coalesce(c.component, s.id) AS comp
         |  FROM surv s LEFT JOIN comp c ON c.node = s.id)
         |SELECT min(id) AS keep_id, count(*) AS n_copies
         |FROM kept GROUP BY comp ORDER BY keep_id""".stripMargin,

    "corpus_dup_ngrams" ->
      """WITH tok AS (
        |  SELECT doc_id, [x for x in
        |    string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ')
        |    if x <> ''] AS t
        |  FROM documents),
        |g AS (
        |  SELECT unnest(list_distinct(
        |    [array_to_string(t[i:i+7], ' ') for i in range(1, len(t) - 6)])) AS g
        |  FROM tok WHERE len(t) >= 8),
        |cnts AS (SELECT g, count(*) AS cnt FROM g GROUP BY g),
        |agg AS (
        |  SELECT CAST(sum(cnt) AS BIGINT) AS n_occurrences,
        |    count(*) AS n_distinct,
        |    CAST(sum(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_repeated
        |  FROM cnts)
        |SELECT n_occurrences, n_distinct, n_repeated,
        |  round(1.0 - CAST(n_distinct AS DOUBLE)
        |    / CAST(n_occurrences AS DOUBLE), 6) AS dup_rate
        |FROM agg""".stripMargin,

    "decontaminate" -> decontaminateSql,

    // Bit-identical by construction: the Bloom probe admits every
    // true match (no false negatives) and the exact join removes the
    // false positives — so the oracle is decontaminate's own.
    "decontaminate_bloom" -> decontaminateSql,

    // Same SQL on purpose: the stored filter is bit-identical to the
    // fresh build (deterministic md5-slice positions + no false
    // negatives + the exact verify join), so serve ≡ build IS the
    // store's correctness proof.
    "decontaminate_bloom_stored" -> decontaminateSql,

    "dedup_containment" ->
      """WITH heads AS (
        |  SELECT doc_id AS id, substr(text, 1, 60) AS h FROM documents
        |  UNION ALL
        |  SELECT doc_id + 3000000, substr(text, 11, 40) FROM documents
        |  WHERE doc_id % 30 = 0),
        |g AS (
        |  SELECT id, unnest(list_distinct(
        |    [substr(h, i, 3) for i in range(1, len(h) - 1)])) AS gram
        |  FROM heads WHERE len(h) >= 3),
        |freq AS (SELECT gram FROM g GROUP BY gram HAVING count(*) <= 50),
        |kept AS (SELECT g.id, g.gram FROM g JOIN freq USING (gram)),
        |n AS (SELECT id, count(*) AS n FROM kept GROUP BY id),
        |pairs AS (
        |  SELECT a.id AS id_a, b.id AS id_b, count(*) AS common,
        |    any_value(na.n) AS n_a, any_value(nb.n) AS n_b
        |  FROM kept a JOIN kept b ON a.gram = b.gram AND a.id < b.id
        |  JOIN n na ON na.id = a.id JOIN n nb ON nb.id = b.id
        |  GROUP BY a.id, b.id)
        |SELECT id_a, id_b,
        |  round(common / least(n_a, n_b), 4) AS containment
        |FROM pairs WHERE common / least(n_a, n_b) >= 0.9
        |ORDER BY id_a, id_b""".stripMargin,
    "graph_link_predict" ->
      """WITH raw AS (
        |  SELECT o_custkey % 97 AS a,
        |    (o_custkey * 7 + o_orderkey) % 97 AS b
        |  FROM orders),
        |und AS (
        |  SELECT a AS u, b AS v FROM raw WHERE a <> b
        |  UNION
        |  SELECT b, a FROM raw WHERE a <> b),
        |deg AS (SELECT u AS n, count(*) AS d FROM und GROUP BY 1),
        |wedge AS (
        |  SELECT l.v AS x, r.v AS y, count(*) AS common
        |  FROM und l JOIN und r ON l.u = r.u AND l.v < r.v
        |  GROUP BY 1, 2),
        |cand AS (
        |  SELECT w.x, w.y, w.common
        |  FROM wedge w
        |  LEFT JOIN (SELECT u AS x, v AS y FROM und WHERE u < v) c
        |    ON w.x = c.x AND w.y = c.y
        |  WHERE c.x IS NULL)
        |SELECT cand.x, cand.y, common,
        |  round(common * 1.0 / (dx.d + dy.d - common), 6) AS jaccard
        |FROM cand
        |JOIN deg dx ON cand.x = dx.n
        |JOIN deg dy ON cand.y = dy.n
        |ORDER BY jaccard DESC, cand.x, cand.y
        |LIMIT 20""".stripMargin,

    "graph_kcore" -> {
      // MATERIALIZED: each round references the previous one three
      // times — inlined CTEs would expand the chain exponentially
      // (3^10 scans of the base table).
      val peels = (1 to 10).map { i =>
        val prev = if (i == 1) "e0" else s"e${i - 1}"
        s"""k$i AS MATERIALIZED (
           |  SELECT u FROM $prev GROUP BY u HAVING count(*) >= 2),
           |e$i AS MATERIALIZED (
           |  SELECT e.u, e.v FROM $prev e
           |  JOIN k$i a ON a.u = e.u JOIN k$i b ON b.u = e.v)""".stripMargin
      }.mkString(",\n")
      s"""WITH li AS (
         |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
         |pr AS (
         |  SELECT a.pk AS p1, b.pk AS p2 FROM li a JOIN li b
         |    ON a.ok = b.ok AND a.pk < b.pk),
         |sup AS (SELECT p1, p2 FROM pr GROUP BY p1, p2 HAVING count(*) >= 2),
         |e0 AS (SELECT p1 AS u, p2 AS v FROM sup
         |       UNION SELECT p2, p1 FROM sup),
         |$peels
         |SELECT u AS node, count(*) AS deg FROM e10
         |GROUP BY u ORDER BY node""".stripMargin
    },

    "graph_triangles" ->
      """WITH raw AS (
        |  SELECT o_custkey % 97 AS a,
        |    (o_custkey * 7 + o_orderkey) % 97 AS b
        |  FROM orders),
        |und AS (
        |  SELECT a AS u, b AS v FROM raw WHERE a <> b
        |  UNION
        |  SELECT b, a FROM raw WHERE a <> b),
        |canon AS (SELECT u, v FROM und WHERE u < v),
        |tri AS (
        |  SELECT count(*) AS n_triangles
        |  FROM canon e1 JOIN canon e2 ON e2.u = e1.v
        |  JOIN canon e3 ON e3.u = e1.u AND e3.v = e2.v),
        |nn AS (SELECT count(DISTINCT u) AS n_nodes FROM und),
        |ne AS (SELECT count(*) AS n_edges FROM canon)
        |SELECT n_nodes, n_edges, n_triangles FROM nn, ne, tri""".stripMargin,

    "dedup_embedding" ->
      """WITH vecs AS (
        |  SELECT vec_id, embedding FROM embeddings WHERE vec_id < 1000
        |  UNION ALL
        |  SELECT vec_id + 1000000, embedding FROM embeddings
        |  WHERE vec_id < 1000 AND vec_id % 20 = 0),
        |p1 AS (SELECT vec_id AS plane_id, embedding AS pv
        |       FROM embeddings WHERE vec_id < 8),
        |p2 AS (SELECT vec_id - 8 AS plane_id, embedding AS pv
        |       FROM embeddings WHERE vec_id >= 8 AND vec_id < 16),
        |b1 AS (
        |  SELECT v.vec_id, CAST(sum(CASE WHEN list_dot_product(
        |      CAST(v.embedding AS DOUBLE[]), CAST(p.pv AS DOUBLE[])) > 0
        |    THEN (1 << p.plane_id) ELSE 0 END) AS INT) AS bucket
        |  FROM vecs v CROSS JOIN p1 p GROUP BY v.vec_id),
        |b2 AS (
        |  SELECT v.vec_id, CAST(sum(CASE WHEN list_dot_product(
        |      CAST(v.embedding AS DOUBLE[]), CAST(p.pv AS DOUBLE[])) > 0
        |    THEN (1 << p.plane_id) ELSE 0 END) AS INT) AS bucket
        |  FROM vecs v CROSS JOIN p2 p GROUP BY v.vec_id),
        |cand AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |  FROM b1 a JOIN b1 b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
        |  UNION
        |  SELECT a.vec_id, b.vec_id
        |  FROM b2 a JOIN b2 b ON a.bucket = b.bucket AND a.vec_id < b.vec_id),
        |pairs AS (
        |  SELECT c.id_a, c.id_b,
        |    list_cosine_similarity(CAST(va.embedding AS DOUBLE[]),
        |                           CAST(vb.embedding AS DOUBLE[])) AS c
        |  FROM cand c
        |  JOIN vecs va ON va.vec_id = c.id_a
        |  JOIN vecs vb ON vb.vec_id = c.id_b)
        |SELECT id_a, id_b, round(c, 4) AS cosine
        |FROM pairs WHERE c >= 0.99 ORDER BY id_a, id_b""".stripMargin,

    // Replays the seeded 1-iteration Lloyd quantizer (the
    // ann_cell_balance chain) over the planted corpus, the identical
    // 2000-row cell cap, then exact intra-cell cosine pairs.
    "dedup_semantic" ->
      """WITH vecs AS (
        |  SELECT vec_id, embedding FROM embeddings WHERE vec_id < 1000
        |  UNION ALL
        |  SELECT vec_id + 1000000, embedding FROM embeddings
        |  WHERE vec_id < 1000 AND vec_id % 20 = 0),
        |seeds AS (
        |  SELECT vec_id AS anchor_id, CAST(embedding AS DOUBLE[]) AS av
        |  FROM vecs ORDER BY vec_id LIMIT 4),
        |it1 AS (
        |  SELECT vec_id, embedding, anchor_id AS cell FROM (
        |    SELECT c.vec_id, c.embedding, a.anchor_id,
        |      row_number() OVER (PARTITION BY c.vec_id ORDER BY
        |        round(list_cosine_similarity(CAST(c.embedding AS DOUBLE[]),
        |          a.av), 6) DESC, a.anchor_id) AS rk
        |    FROM vecs c CROSS JOIN seeds a) WHERE rk = 1),
        |cent AS (
        |  SELECT cell AS anchor_id, list(m ORDER BY dim) AS av FROM (
        |    SELECT cell, dim, round(avg(x), 6) AS m FROM (
        |      SELECT cell, generate_subscripts(CAST(embedding AS DOUBLE[]), 1) AS dim,
        |             unnest(CAST(embedding AS DOUBLE[])) AS x
        |      FROM it1)
        |    GROUP BY cell, dim)
        |  GROUP BY cell),
        |asg AS (
        |  SELECT vec_id, anchor_id AS cell FROM (
        |    SELECT c.vec_id, a.anchor_id,
        |      row_number() OVER (PARTITION BY c.vec_id ORDER BY
        |        round(list_cosine_similarity(CAST(c.embedding AS DOUBLE[]),
        |          a.av), 6) DESC, a.anchor_id) AS rk
        |    FROM vecs c CROSS JOIN cent a) WHERE rk = 1),
        |sized AS (
        |  SELECT vec_id, cell FROM (
        |    SELECT vec_id, cell, count(*) OVER (PARTITION BY cell) AS n
        |    FROM asg)
        |  WHERE n <= 2000),
        |pairs AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |    list_cosine_similarity(CAST(va.embedding AS DOUBLE[]),
        |                           CAST(vb.embedding AS DOUBLE[])) AS c
        |  FROM sized a JOIN sized b ON a.cell = b.cell AND a.vec_id < b.vec_id
        |  JOIN vecs va ON va.vec_id = a.vec_id
        |  JOIN vecs vb ON vb.vec_id = b.vec_id)
        |SELECT id_a, id_b, round(c, 4) AS cosine
        |FROM pairs WHERE c >= 0.95 ORDER BY id_a, id_b""".stripMargin,

    "ann_bruteforce" ->
      """WITH scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id,
        |    round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
        |      CAST(c.embedding AS DOUBLE[])), 6) AS cosine
        |  FROM (SELECT * FROM embeddings WHERE vec_id < 8) q
        |  JOIN (SELECT * FROM embeddings WHERE vec_id >= 8) c
        |    ON q.vec_id <> c.vec_id),
        |ranked AS (
        |  SELECT query_id, vec_id, cosine,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY cosine DESC, vec_id) AS rk
        |  FROM scored)
        |SELECT query_id, rk, vec_id, cosine
        |FROM ranked WHERE rk <= 5 ORDER BY query_id, rk""".stripMargin,

    "ann_filtered" ->
      """WITH scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id,
        |    round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
        |      CAST(c.embedding AS DOUBLE[])), 6) AS cosine
        |  FROM (SELECT * FROM embeddings WHERE vec_id < 8) q
        |  JOIN (SELECT * FROM embeddings WHERE vec_id >= 8) c
        |    ON q.vec_id <> c.vec_id AND q.label = c.label),
        |ranked AS (
        |  SELECT query_id, vec_id, cosine,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY cosine DESC, vec_id) AS rk
        |  FROM scored)
        |SELECT query_id, rk, vec_id, cosine
        |FROM ranked WHERE rk <= 5 ORDER BY query_id, rk""".stripMargin,

    "ann_ivf" ->
      s"""WITH $ivfChainSql
        |SELECT query_id, rk, vec_id, cosine
        |FROM ranked WHERE rk <= 5 ORDER BY query_id, rk""".stripMargin,

    "ann_filtered_ivf" ->
      s"""WITH $filteredIvfChainSql
        |SELECT query_id, rk, vec_id, cosine
        |FROM franked WHERE rk <= 5 ORDER BY query_id, rk""".stripMargin,

    // literal replay of the in-engine S-curve lattice: unrolled
    // multiplications, rounded sorted-fold mass sums, grid s50
    "dedup_band_plan" -> {
      val grid = 100; val t = "CAST(0.7 AS DOUBLE)"; val n = 12
      def unroll(expr: String, e: Int) = List.fill(e)(expr).mkString(" * ")
      val curves = (1 to n).filter(n % _ == 0).map { r =>
        val b = n / r
        s"""SELECT $b AS bands, $r AS rows_per_band, s,
           |  1 - (${unroll("q", b)}) AS p
           |FROM (SELECT s, 1 - (${unroll("s", r)}) AS q FROM grid)"""
          .stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH grid AS (
         |  SELECT (CAST(i AS DOUBLE) * 2 + 1) / ${2 * grid} AS s
         |  FROM generate_series(0, ${grid - 1}) t(i)),
         |curve AS ($curves),
         |per AS (
         |  SELECT bands, rows_per_band,
         |    coalesce(min(CASE WHEN p >= 0.5 THEN s END),
         |      CAST(${2 * grid - 1} AS DOUBLE) / ${2 * grid}) AS s50,
         |    round(list_aggregate(list_sort(list(
         |      round(CASE WHEN s < $t THEN p
         |        ELSE CAST(0 AS DOUBLE) END, 8))), 'sum') / $grid, 6)
         |      AS fp_mass,
         |    round(list_aggregate(list_sort(list(
         |      round(CASE WHEN s >= $t THEN 1 - p
         |        ELSE CAST(0 AS DOUBLE) END, 8))), 'sum') / $grid, 6)
         |      AS fn_mass
         |  FROM curve GROUP BY 1, 2),
         |nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents)
         |SELECT CAST(bands AS INT) AS bands,
         |  CAST(rows_per_band AS INT) AS rows_per_band, s50, fp_mass,
         |  fn_mass,
         |  round(fp_mass * (CAST(n_docs AS DOUBLE) * (n_docs - 1) / 2), 2)
         |    AS exp_fp_pairs,
         |  CAST(row_number() OVER (ORDER BY fp_mass + fn_mass, bands)
         |    AS INT) AS rank
         |FROM per, nd ORDER BY rank""".stripMargin
    },

    "ann_filtered_ivf_recall" ->
      s"""WITH $filteredIvfChainSql,
        |approx AS (SELECT query_id, vec_id FROM franked WHERE rk <= 5),
        |escored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id,
        |    round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
        |      CAST(c.embedding AS DOUBLE[])), 6) AS cosine
        |  FROM fqs q JOIN fcs c
        |    ON c.vec_id <> q.vec_id AND c.label = q.label),
        |eranked AS (
        |  SELECT query_id, vec_id,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY cosine DESC, vec_id) AS rk
        |  FROM escored),
        |exact AS (SELECT query_id, vec_id FROM eranked WHERE rk <= 5)
        |SELECT e.query_id, count(a.vec_id) AS n_hits,
        |  round(count(a.vec_id) / 5.0, 4) AS recall_at_5
        |FROM exact e LEFT JOIN approx a
        |  ON a.query_id = e.query_id AND a.vec_id = e.vec_id
        |GROUP BY e.query_id ORDER BY e.query_id""".stripMargin,

    // Same SQL as ann_ivf on purpose: the oracle routes the whole
    // corpus in one pass; the Spark side routes historical and delta
    // stripes separately and unions — bit-equality IS the incremental
    // ≡ rebuild proof.
    "ann_incremental" ->
      s"""WITH $ivfChainSql
        |SELECT query_id, rk, vec_id, cosine
        |FROM ranked WHERE rk <= 5 ORDER BY query_id, rk""".stripMargin,

    // Recall@5 of the IVF candidate list against the exact top-5 on
    // the SAME splits — the quality metric a vector-search rollout
    // watches. Both sides replayed independently here.
    "ann_recall" ->
      s"""WITH $ivfChainSql,
        |approx AS (SELECT query_id, vec_id FROM ranked WHERE rk <= 5),
        |escored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id,
        |    round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
        |      CAST(c.embedding AS DOUBLE[])), 6) AS cosine
        |  FROM qs q JOIN cs c ON c.vec_id <> q.vec_id),
        |eranked AS (
        |  SELECT query_id, vec_id,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY cosine DESC, vec_id) AS rk
        |  FROM escored),
        |exact AS (SELECT query_id, vec_id FROM eranked WHERE rk <= 5)
        |SELECT e.query_id, count(a.vec_id) AS n_hits,
        |  round(count(a.vec_id) / 5.0, 4) AS recall_at_5
        |FROM exact e LEFT JOIN approx a
        |  ON a.query_id = e.query_id AND a.vec_id = e.vec_id
        |GROUP BY e.query_id ORDER BY e.query_id""".stripMargin,

    "ann_mrr" ->
      s"""WITH $ivfChainSql,
        |approx AS (SELECT query_id, vec_id, rk FROM ranked WHERE rk <= 5),
        |escored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id,
        |    round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
        |      CAST(c.embedding AS DOUBLE[])), 6) AS cosine
        |  FROM qs q JOIN cs c ON c.vec_id <> q.vec_id),
        |eranked AS (
        |  SELECT query_id, vec_id,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY cosine DESC, vec_id) AS rk
        |  FROM escored),
        |exact1 AS (SELECT query_id, vec_id FROM eranked WHERE rk = 1)
        |SELECT e.query_id,
        |  CAST(coalesce(a.rk, 0) AS BIGINT) AS rank_of_nn,
        |  round(coalesce(1.0 / CAST(a.rk AS DOUBLE), 0.0), 4) AS rr_at_5
        |FROM exact1 e LEFT JOIN approx a
        |  ON a.query_id = e.query_id AND a.vec_id = e.vec_id
        |ORDER BY e.query_id""".stripMargin,

    "ann_ndcg" ->
      s"""WITH $ivfChainSql,
        |approx AS (SELECT query_id, vec_id, rk FROM ranked WHERE rk <= 5),
        |escored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id,
        |    round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
        |      CAST(c.embedding AS DOUBLE[])), 6) AS cosine
        |  FROM qs q JOIN cs c ON c.vec_id <> q.vec_id),
        |eranked AS (
        |  SELECT query_id, vec_id,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY cosine DESC, vec_id) AS rk
        |  FROM escored),
        |exact AS (SELECT query_id, vec_id, rk AS erk FROM eranked
        |  WHERE rk <= 5),
        |rel AS (
        |  SELECT a.query_id, a.rk,
        |    CAST(coalesce(6 - e.erk, 0) AS DOUBLE) AS rel
        |  FROM approx a LEFT JOIN exact e
        |    ON e.query_id = a.query_id AND e.vec_id = a.vec_id),
        |perq AS (
        |  SELECT query_id,
        |    sum(CAST(round(rel / (ln(CAST(rk AS DOUBLE) + 1.0) / ln(2.0)),
        |      6) AS DECIMAL(28,6))) AS dcg
        |  FROM rel GROUP BY query_id),
        |ideal AS (
        |  SELECT sum(CAST(round(CAST(6 - i AS DOUBLE) /
        |      (ln(CAST(i AS DOUBLE) + 1.0) / ln(2.0)), 6)
        |    AS DECIMAL(28,6))) AS idcg
        |  FROM (SELECT unnest(generate_series(1, 5)) AS i)),
        |base AS (SELECT DISTINCT query_id FROM exact)
        |SELECT b.query_id,
        |  coalesce(CAST(p.dcg AS DOUBLE), 0.0) AS dcg,
        |  round(coalesce(CAST(p.dcg AS DOUBLE), 0.0)
        |    / CAST(ideal.idcg AS DOUBLE), 4) AS ndcg_at_5
        |FROM base b LEFT JOIN perq p ON p.query_id = b.query_id, ideal
        |ORDER BY b.query_id""".stripMargin,

    // Replays the two seeded Lloyd iterations: assign to the 8 lowest-
    // id corpus seeds, recompute 6-dp-rounded element-wise means,
    // repeat, then run the standard IVF probe against the final
    // centroids.
    "ann_ivf_kmeans" ->
      """WITH cs AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 16),
        |qs AS (SELECT vec_id, embedding FROM embeddings
        |       WHERE vec_id >= 8 AND vec_id < 16),
        |seeds AS (
        |  SELECT vec_id AS anchor_id, CAST(embedding AS DOUBLE[]) AS av
        |  FROM embeddings WHERE vec_id >= 16 ORDER BY vec_id LIMIT 8),
        |it1 AS (
        |  SELECT vec_id, embedding, anchor_id AS cell FROM (
        |    SELECT c.vec_id, c.embedding, a.anchor_id,
        |      row_number() OVER (PARTITION BY c.vec_id ORDER BY
        |        round(list_cosine_similarity(CAST(c.embedding AS DOUBLE[]),
        |          a.av), 6) DESC, a.anchor_id) AS rk
        |    FROM cs c CROSS JOIN seeds a)
        |  WHERE rk = 1),
        |cent1 AS (
        |  SELECT cell AS anchor_id, list(m ORDER BY dim) AS av FROM (
        |    SELECT cell, dim, round(avg(x), 6) AS m FROM (
        |      SELECT cell, generate_subscripts(embedding, 1) AS dim,
        |             unnest(CAST(embedding AS DOUBLE[])) AS x
        |      FROM it1)
        |    GROUP BY cell, dim)
        |  GROUP BY cell),
        |it2 AS (
        |  SELECT vec_id, embedding, anchor_id AS cell FROM (
        |    SELECT c.vec_id, c.embedding, a.anchor_id,
        |      row_number() OVER (PARTITION BY c.vec_id ORDER BY
        |        round(list_cosine_similarity(CAST(c.embedding AS DOUBLE[]),
        |          a.av), 6) DESC, a.anchor_id) AS rk
        |    FROM cs c CROSS JOIN cent1 a)
        |  WHERE rk = 1),
        |cent2 AS (
        |  SELECT cell AS anchor_id, list(m ORDER BY dim) AS av FROM (
        |    SELECT cell, dim, round(avg(x), 6) AS m FROM (
        |      SELECT cell, generate_subscripts(embedding, 1) AS dim,
        |             unnest(CAST(embedding AS DOUBLE[])) AS x
        |      FROM it2)
        |    GROUP BY cell, dim)
        |  GROUP BY cell),
        |ccell AS (
        |  SELECT vec_id, embedding AS cv, anchor_id AS cell FROM (
        |    SELECT c.vec_id, c.embedding, a.anchor_id,
        |      row_number() OVER (PARTITION BY c.vec_id ORDER BY
        |        round(list_cosine_similarity(CAST(c.embedding AS DOUBLE[]),
        |          a.av), 6) DESC, a.anchor_id) AS rk
        |    FROM cs c CROSS JOIN cent2 a)
        |  WHERE rk = 1),
        |qcell AS (
        |  SELECT vec_id AS query_id, embedding AS qv, anchor_id AS cell FROM (
        |    SELECT q.vec_id, q.embedding, a.anchor_id,
        |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
        |        round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
        |          a.av), 6) DESC, a.anchor_id) AS rk
        |    FROM qs q CROSS JOIN cent2 a)
        |  WHERE rk = 1),
        |scored AS (
        |  SELECT q.query_id, c.vec_id,
        |    round(list_cosine_similarity(CAST(q.qv AS DOUBLE[]),
        |      CAST(c.cv AS DOUBLE[])), 6) AS cosine
        |  FROM qcell q JOIN ccell c ON q.cell = c.cell
        |  WHERE c.vec_id <> q.query_id),
        |ranked AS (
        |  SELECT query_id, vec_id, cosine,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY cosine DESC, vec_id) AS rk
        |  FROM scored)
        |SELECT query_id, rk, vec_id, cosine
        |FROM ranked WHERE rk <= 5 ORDER BY query_id, rk""".stripMargin,

    "ann_ivf_nprobe2" ->
      """WITH anchors AS (SELECT vec_id AS anchor_id, embedding AS av
        |  FROM embeddings WHERE vec_id < 8),
        |qs AS (SELECT vec_id, embedding FROM embeddings
        |  WHERE vec_id >= 8 AND vec_id < 16),
        |cs AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 16),
        |qcell AS (
        |  SELECT vec_id AS query_id, embedding AS qv, anchor_id AS cell FROM (
        |    SELECT q.vec_id, q.embedding, a.anchor_id,
        |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
        |        round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
        |          CAST(a.av AS DOUBLE[])), 6) DESC, a.anchor_id) AS rk
        |    FROM qs q CROSS JOIN anchors a)
        |  WHERE rk <= 2),
        |ccell AS (
        |  SELECT vec_id, embedding AS cv, anchor_id AS cell FROM (
        |    SELECT c.vec_id, c.embedding, a.anchor_id,
        |      row_number() OVER (PARTITION BY c.vec_id ORDER BY
        |        round(list_cosine_similarity(CAST(c.embedding AS DOUBLE[]),
        |          CAST(a.av AS DOUBLE[])), 6) DESC, a.anchor_id) AS rk
        |    FROM cs c CROSS JOIN anchors a)
        |  WHERE rk = 1),
        |scored AS (
        |  SELECT q.query_id, c.vec_id,
        |    round(list_cosine_similarity(CAST(q.qv AS DOUBLE[]),
        |      CAST(c.cv AS DOUBLE[])), 6) AS cosine
        |  FROM qcell q JOIN ccell c ON q.cell = c.cell
        |  WHERE c.vec_id <> q.query_id),
        |ranked AS (
        |  SELECT query_id, vec_id, cosine,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY cosine DESC, vec_id) AS rk
        |  FROM scored)
        |SELECT query_id, rk, vec_id, cosine
        |FROM ranked WHERE rk <= 5 ORDER BY query_id, rk""".stripMargin,

    "ann_range_search" ->
      """WITH anchors AS (SELECT vec_id AS anchor_id, embedding AS av
        |  FROM embeddings WHERE vec_id < 8),
        |qs AS (SELECT vec_id, embedding FROM embeddings
        |  WHERE vec_id >= 8 AND vec_id < 16),
        |cs AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 16),
        |qcell AS (
        |  SELECT vec_id AS query_id, embedding AS qv, anchor_id AS cell FROM (
        |    SELECT q.vec_id, q.embedding, a.anchor_id,
        |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
        |        round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
        |          CAST(a.av AS DOUBLE[])), 6) DESC, a.anchor_id) AS rk
        |    FROM qs q CROSS JOIN anchors a)
        |  WHERE rk <= 2),
        |ccell AS (
        |  SELECT vec_id, embedding AS cv, anchor_id AS cell FROM (
        |    SELECT c.vec_id, c.embedding, a.anchor_id,
        |      row_number() OVER (PARTITION BY c.vec_id ORDER BY
        |        round(list_cosine_similarity(CAST(c.embedding AS DOUBLE[]),
        |          CAST(a.av AS DOUBLE[])), 6) DESC, a.anchor_id) AS rk
        |    FROM cs c CROSS JOIN anchors a)
        |  WHERE rk = 1)
        |SELECT q.query_id, c.vec_id,
        |  round(list_cosine_similarity(CAST(q.qv AS DOUBLE[]),
        |    CAST(c.cv AS DOUBLE[])), 6) AS cosine
        |FROM qcell q JOIN ccell c ON q.cell = c.cell
        |WHERE c.vec_id <> q.query_id
        |  AND round(list_cosine_similarity(CAST(q.qv AS DOUBLE[]),
        |    CAST(c.cv AS DOUBLE[])), 6) >= 0.2
        |ORDER BY query_id, vec_id""".stripMargin,

    "ann_range_recall" ->
      """WITH anchors AS (SELECT vec_id AS anchor_id, embedding AS av
        |  FROM embeddings WHERE vec_id < 8),
        |qs AS (SELECT vec_id, embedding FROM embeddings
        |  WHERE vec_id >= 8 AND vec_id < 16),
        |cs AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 16),
        |qcell AS (
        |  SELECT vec_id AS query_id, embedding AS qv, anchor_id AS cell FROM (
        |    SELECT q.vec_id, q.embedding, a.anchor_id,
        |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
        |        round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
        |          CAST(a.av AS DOUBLE[])), 6) DESC, a.anchor_id) AS rk
        |    FROM qs q CROSS JOIN anchors a)
        |  WHERE rk <= 2),
        |ccell AS (
        |  SELECT vec_id, embedding AS cv, anchor_id AS cell FROM (
        |    SELECT c.vec_id, c.embedding, a.anchor_id,
        |      row_number() OVER (PARTITION BY c.vec_id ORDER BY
        |        round(list_cosine_similarity(CAST(c.embedding AS DOUBLE[]),
        |          CAST(a.av AS DOUBLE[])), 6) DESC, a.anchor_id) AS rk
        |    FROM cs c CROSS JOIN anchors a)
        |  WHERE rk = 1),
        |approx AS (
        |  SELECT q.query_id, c.vec_id
        |  FROM qcell q JOIN ccell c ON q.cell = c.cell
        |  WHERE c.vec_id <> q.query_id
        |    AND round(list_cosine_similarity(CAST(q.qv AS DOUBLE[]),
        |      CAST(c.cv AS DOUBLE[])), 6) >= 0.2),
        |truth AS (
        |  SELECT q.vec_id AS tq, c.vec_id AS tv
        |  FROM qs q CROSS JOIN cs c
        |  WHERE c.vec_id <> q.vec_id
        |    AND round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
        |      CAST(c.embedding AS DOUBLE[])), 6) >= 0.2)
        |SELECT t.tq AS query_id, count(*) AS n_true,
        |  count(a.query_id) AS n_hit,
        |  round(count(a.query_id) * 1.0 / count(*), 4) AS recall
        |FROM truth t LEFT JOIN approx a
        |  ON t.tq = a.query_id AND t.tv = a.vec_id
        |GROUP BY t.tq ORDER BY query_id""".stripMargin,

    "ann_lsh" ->
      s"""WITH $lshChainSql
        |SELECT query_id, rk, vec_id, cosine
        |FROM ranked WHERE rk <= 5 ORDER BY query_id, rk""".stripMargin,

    "emb_matryoshka" -> {
      val dims = Seq(8, 16, 32, 64)
      val perD = dims.map { d =>
        s"""sc$d AS (
           |  SELECT q.vec_id AS query_id, c.vec_id,
           |    round(list_cosine_similarity(
           |      CAST(q.embedding[1:$d] AS DOUBLE[]),
           |      CAST(c.embedding[1:$d] AS DOUBLE[])), 6) AS cosine
           |  FROM qs q JOIN cs c ON q.vec_id <> c.vec_id),
           |rk$d AS (
           |  SELECT $d AS d, query_id, vec_id FROM (
           |    SELECT query_id, vec_id,
           |      row_number() OVER (PARTITION BY query_id
           |        ORDER BY cosine DESC, vec_id) AS rk
           |    FROM sc$d) WHERE rk <= 5)""".stripMargin
      }.mkString(",\n")
      val unioned = dims.map(d => s"SELECT * FROM rk$d").mkString("\n  UNION ALL ")
      s"""WITH cs AS MATERIALIZED (
         |  SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 16),
         |qs AS (SELECT vec_id, embedding FROM embeddings
         |       WHERE vec_id >= 8 AND vec_id < 16),
         |$perD,
         |escored AS (
         |  SELECT q.vec_id AS query_id, c.vec_id,
         |    round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
         |      CAST(c.embedding AS DOUBLE[])), 6) AS cosine
         |  FROM qs q JOIN cs c ON c.vec_id <> q.vec_id),
         |exact AS (
         |  SELECT query_id, vec_id FROM (
         |    SELECT query_id, vec_id,
         |      row_number() OVER (PARTITION BY query_id
         |        ORDER BY cosine DESC, vec_id) AS rk
         |    FROM escored) WHERE rk <= 5),
         |tr AS ($unioned),
         |nq AS (SELECT count(DISTINCT query_id) AS nq FROM exact)
         |SELECT t.d, count(e.vec_id) AS n_hits,
         |  round(CAST(count(e.vec_id) AS DOUBLE) / (nq.nq * 5), 4)
         |    AS recall_at_5
         |FROM tr t LEFT JOIN exact e
         |  ON e.query_id = t.query_id AND e.vec_id = t.vec_id
         |CROSS JOIN nq
         |GROUP BY t.d, nq.nq ORDER BY t.d""".stripMargin
    },

    "ann_sq8" -> sq8OracleSql,
    "ann_sq8_recall" -> annRecallSql(sq8ChainSql),
    // store-served bounds are bit-identical to the fresh build
    "ann_sq8_stored" -> sq8OracleSql,

    "ann_pq" -> pqOracleSql,
    "ann_opq" -> opqOracleSql,
    "ann_opq_recall" -> annRecallSql(opqChainSql),

    "ann_ivfpq" -> ivfPqOracleSql,
    // the stored-quantizer serve path must equal the in-session chain
    // (6-dp training doubles round-trip parquet bit-exactly), so the
    // oracle is the same full replay — the round-trip proof
    "ann_ivfpq_stored" -> ivfPqOracleSql,
    "ann_ivfpq_rerank" -> ivfPqRerankOracleSql,
    "ann_ivfpq_rerank_recall" -> annRecallSql(ivfPqRerankChainSql, "reranked"),
    "ann_ivfpq_sampled" -> ivfPqSampledOracleSql,
    "ann_ivfpq_sampled_recall" -> annRecallSql(ivfPqSampledChainSql),

    // Replays bucket assignment (1 << plane_id sign bits) + the
    // md5-ranked per-bucket quota.
    "sample_diverse" ->
      """WITH planes AS (
        |  SELECT vec_id AS plane_id, embedding AS pv
        |  FROM embeddings WHERE vec_id < 4),
        |cb AS (
        |  SELECT e.vec_id,
        |    CAST(sum(CASE WHEN list_dot_product(CAST(e.embedding AS DOUBLE[]),
        |        CAST(p.pv AS DOUBLE[])) > 0
        |      THEN (1 << p.plane_id) ELSE 0 END) AS INT) AS bucket
        |  FROM (SELECT * FROM embeddings WHERE vec_id >= 8) e
        |  CROSS JOIN planes p GROUP BY e.vec_id),
        |ranked AS (
        |  SELECT bucket, vec_id,
        |    row_number() OVER (PARTITION BY bucket
        |      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rk
        |  FROM cb)
        |SELECT bucket, vec_id FROM ranked WHERE rk <= 4
        |ORDER BY bucket, vec_id""".stripMargin,

    "ann_recall_curve" ->
      s"""WITH $ivfChainSql,
         |approx AS (SELECT query_id, vec_id, rk AS rka FROM ranked
         |           WHERE rk <= 5),
         |escored AS (
         |  SELECT q.vec_id AS query_id, c.vec_id,
         |    round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
         |      CAST(c.embedding AS DOUBLE[])), 6) AS cosine
         |  FROM qs q JOIN cs c ON c.vec_id <> q.vec_id),
         |eranked AS (
         |  SELECT query_id, vec_id,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY cosine DESC, vec_id) AS rk
         |  FROM escored),
         |exact AS (SELECT query_id, vec_id, rk AS rke FROM eranked
         |          WHERE rk <= 5),
         |pairs AS (
         |  SELECT e.query_id, e.rke, a.rka
         |  FROM exact e JOIN approx a
         |    ON a.query_id = e.query_id AND a.vec_id = e.vec_id),
         |nq AS (SELECT count(DISTINCT query_id) AS nq FROM exact),
         |ks AS (SELECT unnest([1, 2, 3, 4, 5]) AS k),
         |hits AS (
         |  SELECT k.k, count(*) AS h FROM pairs p
         |  JOIN ks k ON p.rka <= k.k AND p.rke <= k.k
         |  GROUP BY k.k)
         |SELECT k.k,
         |  round(CAST(COALESCE(h.h, 0) AS DOUBLE) / (k.k * nq.nq), 4)
         |    AS recall
         |FROM ks k LEFT JOIN hits h ON h.k = k.k, nq
         |ORDER BY k.k""".stripMargin,

    // Recall gates for the compressed paths — both sides replayed
    // independently, like ann_recall.
    "ann_pq_recall" -> annRecallSql(pqChainSql),

    "ann_ivfpq_recall" -> annRecallSql(ivfPqChainSql),

    "ann_lsh_recall" -> annRecallSql(lshChainSql),

    "ann_hard_negatives" ->
      s"""WITH $hardNegChainSql
        |SELECT query_id, rk, vec_id, cosine
        |FROM ranked WHERE rk <= 5 ORDER BY query_id, rk""".stripMargin,

    // annRecallSql's shape, but the exact sweep carries the SAME
    // different-label predicate as the miner — the gate must measure
    // bucketing loss only.
    "ann_hard_negatives_recall" ->
      s"""WITH $hardNegChainSql,
        |approx AS (SELECT query_id, vec_id FROM ranked WHERE rk <= 5),
        |escored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id,
        |    round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
        |      CAST(c.embedding AS DOUBLE[])), 6) AS cosine
        |  FROM qs q JOIN cs c
        |    ON c.vec_id <> q.vec_id AND c.label <> q.label),
        |eranked AS (
        |  SELECT query_id, vec_id,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY cosine DESC, vec_id) AS rk
        |  FROM escored),
        |exact AS (SELECT query_id, vec_id FROM eranked WHERE rk <= 5)
        |SELECT e.query_id, count(a.vec_id) AS n_hits,
        |  round(count(a.vec_id) / 5.0, 4) AS recall_at_5
        |FROM exact e LEFT JOIN approx a
        |  ON a.query_id = e.query_id AND a.vec_id = e.vec_id
        |GROUP BY e.query_id ORDER BY e.query_id""".stripMargin,

    "graph_pagerank" ->
      s"""WITH $minhashChain,
         |edges0 AS (SELECT id_a AS u, id_b AS v FROM verif WHERE j >= 0.5),
         |und AS (SELECT u, v FROM edges0 UNION SELECT v AS u, u AS v FROM edges0),
         |deg AS (SELECT u, count(*) AS deg FROM und GROUP BY u),
         |pr0 AS (SELECT u AS node, CAST(1000000 AS BIGINT) AS pr FROM deg),
         |c1 AS (
         |  SELECT e.v AS node, sum(p.pr // d.deg) AS s
         |  FROM und e JOIN pr0 p ON p.node = e.u JOIN deg d ON d.u = e.u
         |  GROUP BY e.v),
         |pr1 AS (
         |  SELECT d.u AS node,
         |    CAST(150000 + (850000 * coalesce(c1.s, 0)) // 1000000 AS BIGINT) AS pr
         |  FROM deg d LEFT JOIN c1 ON c1.node = d.u),
         |c2 AS (
         |  SELECT e.v AS node, sum(p.pr // d.deg) AS s
         |  FROM und e JOIN pr1 p ON p.node = e.u JOIN deg d ON d.u = e.u
         |  GROUP BY e.v),
         |pr2 AS (
         |  SELECT d.u AS node,
         |    CAST(150000 + (850000 * coalesce(c2.s, 0)) // 1000000 AS BIGINT) AS pr
         |  FROM deg d LEFT JOIN c2 ON c2.node = d.u)
         |SELECT node AS id, pr FROM pr2 ORDER BY id""".stripMargin,

    "graph_lpa" -> {
      // MATERIALIZED per round: round i+1 references round i's labels
      // (and und twice inside the join+census) — the kcore inlining
      // guard.
      val rounds = (1 to 3).map { i =>
        val prev = s"l${i - 1}"
        s"""c$i AS MATERIALIZED (
           |  SELECT e.u AS node, l.label, count(*) AS c
           |  FROM und e JOIN $prev l ON l.node = e.v
           |  GROUP BY e.u, l.label),
           |l$i AS MATERIALIZED (
           |  SELECT node, label FROM (
           |    SELECT node, label, row_number() OVER (
           |      PARTITION BY node ORDER BY c DESC, label) AS rk
           |    FROM c$i) WHERE rk = 1)""".stripMargin
      }.mkString(",\n")
      s"""WITH $minhashChain,
         |edges0 AS (SELECT id_a AS u, id_b AS v FROM verif
         |           WHERE j >= 0.5 AND id_a <> id_b),
         |und AS MATERIALIZED (
         |  SELECT u, v FROM edges0 UNION SELECT v AS u, u AS v FROM edges0),
         |l0 AS MATERIALIZED (SELECT DISTINCT u AS node, u AS label FROM und),
         |$rounds
         |SELECT node AS id, label AS community FROM l3 ORDER BY id""".stripMargin
    },

    "graph_modularity" -> {
      val rounds = (1 to 3).map { i =>
        val prev = s"l${i - 1}"
        s"""c$i AS MATERIALIZED (
           |  SELECT e.u AS node, l.label, count(*) AS c
           |  FROM und e JOIN $prev l ON l.node = e.v
           |  GROUP BY e.u, l.label),
           |l$i AS MATERIALIZED (
           |  SELECT node, label FROM (
           |    SELECT node, label, row_number() OVER (
           |      PARTITION BY node ORDER BY c DESC, label) AS rk
           |    FROM c$i) WHERE rk = 1)""".stripMargin
      }.mkString(",\n")
      s"""WITH $minhashChain,
         |edges0 AS (SELECT id_a AS u, id_b AS v FROM verif
         |           WHERE j >= 0.5 AND id_a <> id_b),
         |und AS MATERIALIZED (
         |  SELECT u, v FROM edges0 UNION SELECT v AS u, u AS v FROM edges0),
         |l0 AS MATERIALIZED (SELECT DISTINCT u AS node, u AS label FROM und),
         |$rounds,
         |canon AS MATERIALIZED (
         |  SELECT DISTINCT least(u, v) AS u, greatest(u, v) AS v
         |  FROM edges0 WHERE u <> v),
         |mm AS (SELECT CAST(count(*) AS DOUBLE) AS m FROM canon),
         |deg AS (
         |  SELECT node, count(*) AS deg FROM (
         |    SELECT u AS node FROM canon
         |    UNION ALL SELECT v AS node FROM canon)
         |  GROUP BY node),
         |intra AS (
         |  SELECT lu.label AS community, count(*) AS e_c
         |  FROM canon e
         |  JOIN l3 lu ON lu.node = e.u JOIN l3 lv ON lv.node = e.v
         |  WHERE lu.label = lv.label GROUP BY lu.label),
         |degc AS (
         |  SELECT l.label AS community, sum(d.deg) AS a_c
         |  FROM deg d JOIN l3 l ON l.node = d.node GROUP BY l.label),
         |terms AS (
         |  SELECT dc.community, mm.m,
         |    round(CAST(coalesce(i.e_c, 0) AS DOUBLE) / mm.m -
         |      (CAST(dc.a_c AS DOUBLE) / (2.0 * mm.m)) *
         |      (CAST(dc.a_c AS DOUBLE) / (2.0 * mm.m)), 6) AS t
         |  FROM degc dc LEFT JOIN intra i ON i.community = dc.community, mm)
         |SELECT CAST(count(*) AS BIGINT) AS n_communities,
         |  CAST(max(m) AS BIGINT) AS m_edges,
         |  CAST(sum(CAST(t AS DECIMAL(28,6))) AS DOUBLE) AS q
         |FROM terms""".stripMargin
    },

    "text_feature_hash" -> {
      def nib(i: Int) =
        s"(strpos('0123456789abcdef', substr(md5(w), $i, 1)) - 1)"
      s"""WITH canon AS (
         |  SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text),
         |    '[^a-z0-9 ]', ' ', 'g'), '\\s+', ' ', 'g')) AS c
         |  FROM documents WHERE doc_id % 25 = 0),
         |toks AS (
         |  SELECT doc_id,
         |    unnest([x for x in string_split(c, ' ') if x <> '']) AS w
         |  FROM canon),
         |f AS (
         |  SELECT doc_id,
         |    (${nib(31)} * 16 + ${nib(32)}) % 64 AS bucket,
         |    CASE WHEN ${nib(30)} % 2 = 0 THEN 1 ELSE -1 END AS sgn
         |  FROM toks)
         |SELECT doc_id, CAST(bucket AS BIGINT) AS bucket,
         |  CAST(sum(sgn) AS BIGINT) AS feat,
         |  CAST(count(*) AS BIGINT) AS n_tokens
         |FROM f GROUP BY doc_id, bucket
         |ORDER BY doc_id, bucket""".stripMargin
    },

    "text_lm_score" ->
      """WITH canon AS (
        |  SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z0-9 ]', ' ', 'g'), '\s+', ' ', 'g')) AS c
        |  FROM documents),
        |toks AS (
        |  SELECT doc_id,
        |    [x for x in string_split(c, ' ') if x <> ''] AS t
        |  FROM canon WHERE c <> ''),
        |bg AS (
        |  SELECT doc_id, unnest(t[1:len(t)-1]) AS w1, unnest(t[2:len(t)]) AS w2
        |  FROM toks WHERE len(t) >= 2),
        |uni AS (
        |  SELECT w1, count(*) AS c1
        |  FROM (SELECT unnest(t) AS w1 FROM toks) GROUP BY 1),
        |bi AS (SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY 1, 2),
        |lp AS (
        |  SELECT bg.doc_id,
        |    round(ln(CAST(bi.c2 AS DOUBLE) / uni.c1), 6) AS lp
        |  FROM bg JOIN bi USING (w1, w2) JOIN uni USING (w1)),
        |arr AS (
        |  SELECT doc_id, list_sort(list(lp)) AS l FROM lp GROUP BY doc_id)
        |SELECT doc_id,
        |  round(list_aggregate(l, 'sum') / len(l), 4) AS lm_score
        |FROM arr ORDER BY doc_id""".stripMargin,

    "lm_mink_score" ->
      """WITH canon AS (
        |  SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z0-9 ]', ' ', 'g'), '\s+', ' ', 'g')) AS c
        |  FROM documents),
        |occ AS (
        |  SELECT doc_id,
        |    unnest([x for x in string_split(c, ' ') if x <> '']) AS w
        |  FROM canon),
        |census AS (SELECT w, count(*) AS cnt FROM occ GROUP BY w),
        |tots AS (
        |  SELECT CAST(sum(cnt) AS BIGINT) AS tot, count(*) AS v FROM census),
        |cost AS (
        |  SELECT w, CAST(round(-ln((cnt + 1.0) / (tot + v)) * 1e6) AS BIGINT)
        |    AS c
        |  FROM census CROSS JOIN tots),
        |ranked AS (
        |  SELECT o.doc_id, k.c,
        |    row_number() OVER (PARTITION BY o.doc_id ORDER BY k.c DESC) AS rk,
        |    count(*) OVER (PARTITION BY o.doc_id) AS n
        |  FROM occ o JOIN cost k ON k.w = o.w)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS k,
        |  CAST(sum(c) AS BIGINT) AS mink_cost,
        |  round(CAST(sum(c) AS DOUBLE) / count(*) / 1e6, 6) AS mink_nats
        |FROM ranked WHERE rk <= ceil(n * 0.2)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "text_tfidf" ->
      """WITH canon AS (
        |  SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z0-9 ]', ' ', 'g'), '\s+', ' ', 'g')) AS c
        |  FROM documents),
        |tok AS (
        |  SELECT doc_id, unnest(
        |    [x for x in string_split(c, ' ') if x <> '']) AS term
        |  FROM canon WHERE c <> ''),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
        |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |total AS (SELECT count(*) AS n_docs FROM documents),
        |scored AS (
        |  SELECT doc_id, term,
        |    round(tf * ln(CAST(n_docs AS DOUBLE) / df), 6) AS score
        |  FROM tf JOIN dfreq USING (term) CROSS JOIN total),
        |ranked AS (
        |  SELECT doc_id, term, score,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY score DESC, term) AS rk
        |  FROM scored)
        |SELECT doc_id, term, score FROM ranked WHERE rk <= 3
        |ORDER BY doc_id, score DESC, term""".stripMargin,

    "emb_quantize" ->
      """WITH base AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
        |    list_max(list_transform(CAST(embedding AS DOUBLE[]),
        |      x -> abs(x))) / 127.0 AS scale
        |  FROM embeddings),
        |quant AS (
        |  SELECT vec_id, v, scale,
        |    list_transform(v, x -> CAST(floor(x / scale + 0.5) AS INT)) AS q
        |  FROM base)
        |SELECT vec_id, round(scale, 6) AS scale,
        |  CAST(list_sum(q) AS BIGINT) AS q_sum,
        |  round(list_max([abs(v[i] - q[i] * scale)
        |                  for i in range(1, len(v) + 1)]), 6) AS max_err
        |FROM quant ORDER BY vec_id""".stripMargin,

    "corpus_curate" -> {
      val scores = TextAnalysis.langMarkers.map { case (lang, m) =>
        s"len(regexp_extract_all(lower(text), '\\b(${m.mkString("|")})\\b')) AS s_$lang"
      }.mkString(",\n    ")
      val langs = TextAnalysis.langMarkers.map(_._1)
      val g = s"greatest(${langs.map("s_" + _).mkString(", ")})"
      val pred = langs.map(l => s"WHEN s_$l = $g THEN '$l'").mkString(" ")
      s"""WITH $plantedSql,
         |keep AS (SELECT min(id) AS id FROM corpus GROUP BY md5(text)),
         |kept AS (SELECT c.id, c.text FROM corpus c JOIN keep USING (id)),
         |stats AS (
         |  SELECT id,
         |    $scores,
         |    CAST(len([x for x in string_split(trim(regexp_replace(text,
         |      '\\s+', ' ', 'g')), ' ') if x <> '']) AS DOUBLE) AS n_words,
         |    CAST(length(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE) AS n_chars,
         |    CAST(len(regexp_extract_all(lower(text),
         |      '\\b(the|a|of|and|to|in)\\b')) AS DOUBLE) AS stop
         |  FROM kept),
         |scored AS (
         |  SELECT id, CASE $pred END AS lang,
         |    round(least(CASE WHEN n_words > 0 THEN stop / n_words ELSE 0 END * 2, 1.0) * 0.4
         |        + least((CASE WHEN n_words > 0 THEN n_chars / n_words ELSE 0 END) / 8.0, 1.0) * 0.3
         |        + least(n_words / 100.0, 1.0) * 0.3, 4) AS quality
         |  FROM stats)
         |SELECT id, lang, quality FROM scored
         |WHERE quality >= 0.5 AND lang = 'en'
         |ORDER BY id""".stripMargin
    },

    "text_langid" -> {
      val scores = TextAnalysis.langMarkers.map { case (lang, m) =>
        s"len(regexp_extract_all(lower(text), '\\b(${m.mkString("|")})\\b')) AS s_$lang"
      }.mkString(",\n    ")
      val langs = TextAnalysis.langMarkers.map(_._1)
      val g = s"greatest(${langs.map("s_" + _).mkString(", ")})"
      val pred = langs.map(l => s"WHEN s_$l = $g THEN '$l'").mkString(" ")
      s"""WITH scored AS (
         |  SELECT doc_id, lang,
         |    $scores
         |  FROM documents)
         |SELECT doc_id, lang, CASE $pred END AS pred,
         |  CAST(lang = (CASE $pred END) AS INT) AS correct
         |FROM scored ORDER BY doc_id""".stripMargin
    },

    "langid_eval" -> {
      val scores = TextAnalysis.langMarkers.map { case (lang, m) =>
        s"len(regexp_extract_all(lower(text), '\\b(${m.mkString("|")})\\b')) AS s_$lang"
      }.mkString(",\n    ")
      val langs = TextAnalysis.langMarkers.map(_._1)
      val g = s"greatest(${langs.map("s_" + _).mkString(", ")})"
      val pred = langs.map(l => s"WHEN s_$l = $g THEN '$l'").mkString(" ")
      s"""WITH scored AS (
         |  SELECT lang, $scores
         |  FROM documents),
         |cells AS (
         |  SELECT lang, CASE $pred END AS pred, count(*) AS n
         |  FROM scored GROUP BY 1, 2),
         |per AS (
         |  SELECT c.cls,
         |    CAST(coalesce(sum(CASE WHEN e.lang = c.cls AND e.pred = c.cls
         |      THEN e.n END), 0) AS BIGINT) AS tp,
         |    CAST(coalesce(sum(CASE WHEN e.lang <> c.cls AND e.pred = c.cls
         |      THEN e.n END), 0) AS BIGINT) AS fp,
         |    CAST(coalesce(sum(CASE WHEN e.lang = c.cls AND e.pred <> c.cls
         |      THEN e.n END), 0) AS BIGINT) AS fn
         |  FROM (VALUES ${langs.map(l => s"('$l')").mkString(", ")}) c(cls)
         |  CROSS JOIN cells e
         |  GROUP BY c.cls)
         |SELECT cls, tp, fp, fn,
         |  round(CASE WHEN tp + fp > 0
         |    THEN CAST(tp AS DOUBLE) / (tp + fp) ELSE 0.0 END, 6) AS prec,
         |  round(CASE WHEN tp + fn > 0
         |    THEN CAST(tp AS DOUBLE) / (tp + fn) ELSE 0.0 END, 6) AS rec,
         |  round(CASE WHEN 2 * tp + fp + fn > 0
         |    THEN 2.0 * tp / (2 * tp + fp + fn) ELSE 0.0 END, 6) AS f1
         |FROM per ORDER BY cls""".stripMargin
    },

    "langid_nb_train" ->
      s"""WITH $langidNbSql
         |SELECT label, token, cnt, cost FROM lmodel
         |ORDER BY label, token""".stripMargin,

    "langid_nb_apply" -> langidApplySql,

    // stored ≡ fresh is the determinism contract — the serve leg
    // replays the SAME apply oracle
    "langid_nb_stored" -> langidApplySql,

    "langid_eval_nb" ->
      s"""WITH $langidNbSql,
         |cells AS (
         |  SELECT lang, pred, pred_marker, count(*) AS n
         |  FROM lpred WHERE ${Curation.slotSql("doc_id")} < 2000
         |  GROUP BY 1, 2, 3),
         |per AS (
         |  SELECT c.cls,
         |    CAST(coalesce(sum(CASE WHEN e.lang = c.cls AND e.pred = c.cls
         |      THEN e.n END), 0) AS BIGINT) AS tp,
         |    CAST(coalesce(sum(CASE WHEN e.lang <> c.cls AND e.pred = c.cls
         |      THEN e.n END), 0) AS BIGINT) AS fp,
         |    CAST(coalesce(sum(CASE WHEN e.lang = c.cls AND e.pred <> c.cls
         |      THEN e.n END), 0) AS BIGINT) AS fn,
         |    CAST(coalesce(sum(CASE WHEN e.lang = c.cls
         |      AND e.pred_marker = c.cls THEN e.n END), 0) AS BIGINT) AS tp_m,
         |    CAST(coalesce(sum(CASE WHEN e.lang <> c.cls
         |      AND e.pred_marker = c.cls THEN e.n END), 0) AS BIGINT) AS fp_m,
         |    CAST(coalesce(sum(CASE WHEN e.lang = c.cls
         |      AND e.pred_marker <> c.cls THEN e.n END), 0) AS BIGINT) AS fn_m
         |  FROM (VALUES ${langidLangs.map(l => s"('$l')").mkString(", ")})
         |    c(cls)
         |  CROSS JOIN cells e
         |  GROUP BY c.cls)
         |SELECT cls, tp, fp, fn,
         |  round(CASE WHEN tp + fp > 0
         |    THEN CAST(tp AS DOUBLE) / (tp + fp) ELSE 0.0 END, 6) AS prec,
         |  round(CASE WHEN tp + fn > 0
         |    THEN CAST(tp AS DOUBLE) / (tp + fn) ELSE 0.0 END, 6) AS rec,
         |  round(CASE WHEN 2 * tp + fp + fn > 0
         |    THEN 2.0 * tp / (2 * tp + fp + fn) ELSE 0.0 END, 6) AS f1,
         |  round(CASE WHEN 2 * tp_m + fp_m + fn_m > 0
         |    THEN 2.0 * tp_m / (2 * tp_m + fp_m + fn_m) ELSE 0.0 END, 6)
         |    AS f1_marker
         |FROM per ORDER BY cls""".stripMargin,

    "text_char_entropy" ->
      """WITH ch AS (
        |  SELECT doc_id, len(text) AS n_chars,
        |    [substr(text, i, 1) for i in range(1, len(text) + 1)] AS cs
        |  FROM documents WHERE len(text) > 0),
        |ct AS (
        |  SELECT doc_id, n_chars,
        |    [round((len(list_filter(cs, x -> x = c)) * 1.0 / len(cs))
        |       * -log2(len(list_filter(cs, x -> x = c)) * 1.0 / len(cs)), 6)
        |     for c in list_distinct(cs)] AS contribs
        |  FROM ch)
        |SELECT doc_id, n_chars,
        |  round(list_aggregate(list_sort(contribs), 'sum'), 4)
        |    AS char_entropy
        |FROM ct ORDER BY doc_id""".stripMargin,

    "text_quality" ->
      """WITH stats AS (
        |  SELECT doc_id,
        |    CAST(len([x for x in string_split(trim(regexp_replace(text,
        |      '\s+', ' ', 'g')), ' ') if x <> '']) AS DOUBLE) AS n_words,
        |    CAST(length(regexp_replace(text, '\s', '', 'g')) AS DOUBLE) AS n_chars,
        |    CAST(len(regexp_extract_all(lower(text),
        |      '\b(the|a|of|and|to|in)\b')) AS DOUBLE) AS stop
        |  FROM documents)
        |SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
        |  round(n_chars / n_words, 4) AS avg_word_len,
        |  round(least(CASE WHEN n_words > 0 THEN stop / n_words ELSE 0 END * 2, 1.0) * 0.4
        |      + least((CASE WHEN n_words > 0 THEN n_chars / n_words ELSE 0 END) / 8.0, 1.0) * 0.3
        |      + least(n_words / 100.0, 1.0) * 0.3, 4) AS quality
        |FROM stats ORDER BY doc_id""".stripMargin,

    "text_tokens" ->
      """SELECT doc_id,
        |  CAST(len([x for x in string_split(trim(regexp_replace(text,
        |    '\s+', ' ', 'g')), ' ') if x <> '']) AS BIGINT) AS ws_tokens,
        |  CAST(len(regexp_extract_all(text,
        |    '[A-Za-z0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS subword_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,

    "sql_functions" ->
      s"""WITH docs AS (SELECT doc_id AS id, text FROM documents),
         |${simhashSigChain("docs")},
         |feats AS (
         |  SELECT doc_id AS id,
         |    list_reduce(list_prepend(0::BIGINT,
         |      [unicode(c) for c in string_split_regex(text, '')]),
         |      (acc, c) -> (acc * 31 + c) % 2147483647) AS rhash,
         |    len(list_distinct([array_to_string(t2[i:i+2], ' ')
         |      for i in range(1, len(t2) - 1)])) AS n_shingles
         |  FROM (SELECT doc_id, text,
         |          [x for x in string_split(trim(regexp_replace(text,
         |            '\\s+', ' ', 'g')), ' ') if x <> ''] AS t2
         |        FROM documents))
         |SELECT f.id AS doc_id, f.rhash,
         |  CAST(f.n_shingles AS INT) AS n_shingles, s.simhash
         |FROM feats f JOIN sigs s ON s.id = f.id
         |ORDER BY doc_id""".stripMargin,

    "text_rolling_hash" ->
      """SELECT doc_id,
        |  list_reduce(list_prepend(0::BIGINT,
        |    [unicode(c) for c in string_split_regex(text, '')]),
        |    (acc, c) -> (acc * 31 + c) % 2147483647) AS rhash
        |FROM documents ORDER BY doc_id""".stripMargin,

    "text_pii_redact" ->
      """WITH dirty AS (
        |  SELECT doc_id,
        |    text || ' contact user' || doc_id
        |      || '@example.com or +1-555-0' || doc_id AS d
        |  FROM documents)
        |SELECT doc_id,
        |  regexp_replace(
        |    regexp_replace(d, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
        |                   '[EMAIL]', 'g'),
        |    '\+?\d[\d-]{7,}\d', '[PHONE]', 'g') AS clean,
        |  CAST(len(regexp_extract_all(
        |    regexp_replace(
        |      regexp_replace(d, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
        |                     '[EMAIL]', 'g'),
        |      '\+?\d[\d-]{7,}\d', '[PHONE]', 'g'), '@')) AS BIGINT) AS n_emails_left
        |FROM dirty ORDER BY doc_id""".stripMargin,

    "mm_meta" ->
      """SELECT doc_id,
        |  CASE CAST(substr(source, 4) AS INT) % 3
        |    WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'text' END AS modality,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        |  md5(text) AS content_hash
        |FROM documents ORDER BY doc_id""".stripMargin,

    "url_canon_dedup" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    (CASE WHEN doc_id % 2 = 0 THEN 'http' ELSE 'HTTPS' END) || '://' ||
        |    (CASE WHEN doc_id % 4 < 2 THEN source || '.Example.COM'
        |          ELSE source || '.example.com' END) ||
        |    (CASE WHEN doc_id % 3 = 0 THEN
        |       (CASE WHEN doc_id % 2 = 0 THEN ':80' ELSE ':443' END)
        |     ELSE '' END) ||
        |    '/docs/' || CAST(doc_id % 7 AS VARCHAR) ||
        |    (CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END) ||
        |    (CASE WHEN doc_id % 2 = 0
        |       THEN '?utm_source=feed&id=' || CAST(doc_id % 5 AS VARCHAR)
        |       ELSE '?id=' || CAST(doc_id % 5 AS VARCHAR) || '&utm_campaign=x'
        |     END) AS url
        |  FROM documents),
        |parts AS (
        |  SELECT doc_id, url,
        |    lower(regexp_extract(url,
        |      '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
        |    lower(regexp_extract(url,
        |      '^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)', 1)) AS host,
        |    regexp_extract(url,
        |      '^[A-Za-z][A-Za-z0-9+.-]*://[^/:?#]+:([0-9]+)', 1) AS port,
        |    regexp_replace(regexp_extract(url,
        |      '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+(/[^?#]*)', 1),
        |      '/+$', '') AS path,
        |    regexp_extract(url, '\?([^#]*)', 1) AS query
        |  FROM u),
        |kept AS (
        |  SELECT *, list_sort([p for p in string_split(query, '&')
        |    if p <> '' and not starts_with(p, 'utm_')]) AS ps
        |  FROM parts),
        |canon AS (
        |  SELECT doc_id, url,
        |    scheme || '://' || host ||
        |    (CASE WHEN port = '' OR (scheme = 'http' AND port = '80')
        |       OR (scheme = 'https' AND port = '443')
        |     THEN '' ELSE ':' || port END) ||
        |    path ||
        |    (CASE WHEN len(ps) = 0 THEN ''
        |     ELSE '?' || array_to_string(ps, '&') END) AS canon
        |  FROM kept)
        |SELECT canon, count(*) AS n_urls, count(DISTINCT url) AS n_variants,
        |  min(doc_id) AS first_doc
        |FROM canon GROUP BY canon ORDER BY canon""".stripMargin,

    "crawl_robots_filter" ->
      """WITH hosts AS (SELECT DISTINCT source FROM documents),
        |rules AS (
        |  SELECT source, 'disallow' AS verdict, '/docs/3' AS rp FROM hosts
        |  UNION ALL
        |  SELECT source, 'allow', '/docs/3/x.html' FROM hosts
        |  UNION ALL
        |  SELECT source, 'disallow', '/docs/5/priv' FROM hosts
        |  UNION ALL
        |  SELECT source, 'disallow', '/'
        |  FROM hosts
        |  WHERE (strpos('0123456789abcdef', substr(md5(source), 32, 1)) - 1)
        |    % 4 = 0),
        |frontier AS (
        |  SELECT doc_id, source,
        |    '/docs/' || CAST(doc_id % 7 AS VARCHAR)
        |      || (CASE WHEN doc_id % 5 = 0 THEN '/priv' ELSE '' END)
        |      || (CASE WHEN doc_id % 3 = 0 THEN '/x.html' ELSE '' END) AS path
        |  FROM documents),
        |winner AS (
        |  SELECT f.doc_id, f.source,
        |    max(CASE WHEN r.rp IS NOT NULL THEN struct_pack(
        |      l := length(r.rp),
        |      a := CASE WHEN r.verdict = 'allow' THEN 1 ELSE 0 END) END)
        |      AS best
        |  FROM frontier f LEFT JOIN rules r
        |    ON r.source = f.source AND starts_with(f.path, r.rp)
        |  GROUP BY f.doc_id, f.source)
        |SELECT source, count(*) AS n_urls,
        |  CAST(sum(CASE WHEN best IS NOT NULL
        |    AND struct_extract(best, 'a') = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_blocked,
        |  CAST(sum(CASE WHEN best IS NULL
        |    OR struct_extract(best, 'a') = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_allowed
        |FROM winner GROUP BY source ORDER BY source""".stripMargin,

    "crawl_schedule" ->
      """WITH d AS (
        |  SELECT doc_id, source,
        |    ((strpos('0123456789abcdef', substr(md5(source), 32, 1)) - 1)
        |      % 4 + 1) * 250 AS delay_ms,
        |    row_number() OVER (PARTITION BY source ORDER BY doc_id) - 1
        |      AS slot
        |  FROM documents)
        |SELECT doc_id, source, CAST(delay_ms AS BIGINT) AS delay_ms,
        |  CAST(slot AS BIGINT) AS slot,
        |  CAST(slot * delay_ms AS BIGINT) AS fetch_at_ms
        |FROM d ORDER BY doc_id""".stripMargin,

    "pii_kanon" ->
      """SELECT c_nationkey, c_mktsegment,
        |  CAST(floor(c_acctbal / 2000) AS BIGINT) AS bal_band,
        |  count(*) AS class_size,
        |  CAST(count(*) >= 4 AS BIGINT) AS k_anon
        |FROM customer GROUP BY 1, 2, 3
        |ORDER BY c_nationkey, c_mktsegment, bal_band""".stripMargin,

    "text_mojibake" ->
      """WITH pat AS (
        |  SELECT chr(226) || chr(8364) || chr(8482) AS mj,
        |    chr(65533) AS rp),
        |x AS (
        |  SELECT lang,
        |    repeat(mj, CAST(doc_id % 4 AS INT))
        |      || repeat(rp, CAST(doc_id % 3 AS INT)) || text AS t,
        |    mj, rp
        |  FROM documents CROSS JOIN pat),
        |cnt AS (
        |  SELECT lang,
        |    CAST((length(t) - length(replace(t, mj, ''))) / 3 AS BIGINT)
        |      AS n_moji,
        |    CAST(length(t) - length(replace(t, rp, '')) AS BIGINT) AS n_repl,
        |    CAST(length(t) AS BIGINT) AS n_chars
        |  FROM x)
        |SELECT lang, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN n_moji > 0 OR n_repl > 0 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_flagged,
        |  CAST(sum(n_moji) AS BIGINT) AS tot_moji,
        |  CAST(sum(n_repl) AS BIGINT) AS tot_repl,
        |  round(CAST(3 * sum(n_moji) + sum(n_repl) AS DOUBLE)
        |    / sum(n_chars), 6) AS bad_ratio
        |FROM cnt GROUP BY lang ORDER BY lang""".stripMargin,

    "mm_phash_pairs" ->
      s"""WITH $plantedSql,
         |$mmPhashSql,
         |banded AS (
         |  SELECT id, phash,
         |    unnest([(phash >> 0) & 4095, (phash >> 12) & 4095,
         |            (phash >> 24) & 4095, (phash >> 36) & 4095]) AS bv,
         |    generate_subscripts([1, 2, 3, 4], 1) AS band
         |  FROM sigs),
         |cand AS (
         |  SELECT DISTINCT a.id AS id_a, b.id AS id_b,
         |    a.phash AS ph_a, b.phash AS ph_b
         |  FROM banded a JOIN banded b
         |    ON a.band = b.band AND a.bv = b.bv AND a.id < b.id)
         |SELECT id_a, id_b,
         |  CAST(bit_count(xor(ph_a, ph_b)) AS INT) AS hamming
         |FROM cand WHERE bit_count(xor(ph_a, ph_b)) <= 6
         |ORDER BY id_a, id_b""".stripMargin,

    // the analytic pixel contract of PngCodec.synthPngs: grid value at
    // dHash cell (r,c) is pixel(2c, 2r); the 48-bit pack and the
    // banding replay the Spark conventions bit-for-bit
    "mm_phash_real" -> {
      // hex pair (2p+1, 2p+2) of md5("gid-y") == byte p of the digest
      val gExprs = for (r <- 0 to 5; c <- 0 to 8) yield {
        val x = 2 * c; val y = 2 * r
        val p = 2 * (x % 16) + 1
        val h = s"md5(CAST(doc_id // 2 AS VARCHAR) || '-$y')"
        def nib(pos: Int) =
          s"(strpos('0123456789abcdef', substr($h, $pos, 1)) - 1)"
        s"((16 * ${nib(p)} + ${nib(p + 1)}) % 200 + (doc_id % 2))"
      }
      val bits = (47 to 0 by -1).map { kk =>
        val r = kk >> 3; val c = kk & 7
        val i1 = r * 9 + c + 1
        s"(CASE WHEN g[$i1] > g[${i1 + 1}] THEN ${1L << kk} ELSE 0 END)"
      }.mkString(" + ")
      s"""WITH mm AS (
         |  SELECT doc_id,
         |    [${gExprs.mkString(", ")}] AS g
         |  FROM documents),
         |sigs AS (
         |  SELECT doc_id AS id, CAST($bits AS BIGINT) AS phash FROM mm),
         |banded AS (
         |  SELECT id, phash,
         |    unnest([(phash >> 0) & 4095, (phash >> 12) & 4095,
         |            (phash >> 24) & 4095, (phash >> 36) & 4095]) AS bv,
         |    generate_subscripts([1, 2, 3, 4], 1) AS band
         |  FROM sigs),
         |cand AS (
         |  SELECT DISTINCT a.id AS id_a, b.id AS id_b,
         |    a.phash AS ph_a, b.phash AS ph_b
         |  FROM banded a JOIN banded b
         |    ON a.band = b.band AND a.bv = b.bv AND a.id < b.id)
         |SELECT id_a, id_b,
         |  CAST(bit_count(xor(ph_a, ph_b)) AS INT) AS hamming
         |FROM cand WHERE bit_count(xor(ph_a, ph_b)) <= 6
         |ORDER BY id_a, id_b""".stripMargin
    },

    // the serve-verdict contract of mm_phash_stored: the same
    // analytic phash + the IDENTICAL band split; near_known = any
    // band collision with the history half's distinct store
    "mm_phash_stored" -> {
      val gExprs = for (r <- 0 to 5; c <- 0 to 8) yield {
        val x = 2 * c; val y = 2 * r
        val p = 2 * (x % 16) + 1
        val h = s"md5(CAST(doc_id // 2 AS VARCHAR) || '-$y')"
        def nib(pos: Int) =
          s"(strpos('0123456789abcdef', substr($h, $pos, 1)) - 1)"
        s"((16 * ${nib(p)} + ${nib(p + 1)}) % 200 + (doc_id % 2))"
      }
      val bits = (47 to 0 by -1).map { kk =>
        val r = kk >> 3; val c = kk & 7
        val i1 = r * 9 + c + 1
        s"(CASE WHEN g[$i1] > g[${i1 + 1}] THEN ${1L << kk} ELSE 0 END)"
      }.mkString(" + ")
      s"""WITH mm AS (
         |  SELECT doc_id,
         |    [${gExprs.mkString(", ")}] AS g
         |  FROM documents),
         |sigs AS (
         |  SELECT doc_id AS id, CAST($bits AS BIGINT) AS phash FROM mm),
         |store AS (
         |  SELECT DISTINCT band, bv FROM (
         |    SELECT
         |      unnest([(phash >> 0) & 4095, (phash >> 12) & 4095,
         |              (phash >> 24) & 4095, (phash >> 36) & 4095]) AS bv,
         |      generate_subscripts([1, 2, 3, 4], 1) AS band
         |    FROM sigs WHERE id < 250)),
         |batch AS (
         |  SELECT id, phash FROM sigs WHERE id >= 250
         |  UNION ALL
         |  SELECT id + 1000000 AS id, phash FROM sigs
         |  WHERE id < 250 AND id % 13 = 0),
         |bb AS (
         |  SELECT id,
         |    unnest([(phash >> 0) & 4095, (phash >> 12) & 4095,
         |            (phash >> 24) & 4095, (phash >> 36) & 4095]) AS bv,
         |    generate_subscripts([1, 2, 3, 4], 1) AS band
         |  FROM batch),
         |hits AS (
         |  SELECT DISTINCT bb.id FROM bb
         |  JOIN store s ON bb.band = s.band AND bb.bv = s.bv)
         |SELECT b.id, (h.id IS NOT NULL) AS near_known
         |FROM batch b LEFT JOIN hits h ON b.id = h.id
         |ORDER BY b.id""".stripMargin
    },

    // the analytic luma contract of PngCodec.synthPalettePngs: index
    // at (x, y) = md5-byte mod 2^d (d from the group id), palette
    // luma = (idx·37 + 11) mod 200 + id mod 2 — the PLTE/bit-depth/
    // Adam7 plumbing in between is what the Spark side proves
    "mm_phash_palette" -> {
      val psz = "(CASE CAST((doc_id // 2) % 4 AS INT) " +
        "WHEN 0 THEN 2 WHEN 1 THEN 4 WHEN 2 THEN 16 ELSE 256 END)"
      val gExprs = for (r <- 0 to 5; c <- 0 to 8) yield {
        val x = 2 * c; val y = 2 * r
        val p = 2 * (x % 16) + 1
        val h = s"md5('p' || CAST(doc_id // 2 AS VARCHAR) || '-$y')"
        def nib(pos: Int) =
          s"(strpos('0123456789abcdef', substr($h, $pos, 1)) - 1)"
        s"((((16 * ${nib(p)} + ${nib(p + 1)}) % $psz) * 37 + 11) % 200" +
          s" + (doc_id % 2))"
      }
      val bits = (47 to 0 by -1).map { kk =>
        val r = kk >> 3; val c = kk & 7
        val i1 = r * 9 + c + 1
        s"(CASE WHEN g[$i1] > g[${i1 + 1}] THEN ${1L << kk} ELSE 0 END)"
      }.mkString(" + ")
      s"""WITH mm AS (
         |  SELECT doc_id,
         |    [${gExprs.mkString(", ")}] AS g
         |  FROM documents),
         |sigs AS (
         |  SELECT doc_id AS id, CAST($bits AS BIGINT) AS phash FROM mm),
         |banded AS (
         |  SELECT id, phash,
         |    unnest([(phash >> 0) & 4095, (phash >> 12) & 4095,
         |            (phash >> 24) & 4095, (phash >> 36) & 4095]) AS bv,
         |    generate_subscripts([1, 2, 3, 4], 1) AS band
         |  FROM sigs),
         |cand AS (
         |  SELECT DISTINCT a.id AS id_a, b.id AS id_b,
         |    a.phash AS ph_a, b.phash AS ph_b
         |  FROM banded a JOIN banded b
         |    ON a.band = b.band AND a.bv = b.bv AND a.id < b.id)
         |SELECT id_a, id_b,
         |  CAST(bit_count(xor(ph_a, ph_b)) AS INT) AS hamming
         |FROM cand WHERE bit_count(xor(ph_a, ph_b)) <= 6
         |ORDER BY id_a, id_b""".stripMargin
    },

    // analytic luma of PngCodec.synthAlphaPngs: BT.601 of the three
    // md5-byte channels for RGBA groups, the gray byte for GA groups;
    // the alpha plane is ABSENT from this formula by design
    "mm_phash_rgba" -> {
      val gExprs = for (r <- 0 to 5; c <- 0 to 8) yield {
        val x = 2 * c; val y = 2 * r
        val h = s"md5('a' || CAST(doc_id // 2 AS VARCHAR) || '-$y')"
        def ch(off: Int) = {
          val p = 2 * ((x + off) % 16) + 1
          s"((16 * (strpos('0123456789abcdef', substr($h, $p, 1)) - 1) + " +
            s"(strpos('0123456789abcdef', substr($h, ${p + 1}, 1)) - 1))" +
            s" % 200 + (doc_id % 2))"
        }
        s"(CASE WHEN (doc_id // 2) % 2 = 0 THEN " +
          s"(299 * ${ch(0)} + 587 * ${ch(5)} + 114 * ${ch(11)}) // 1000 " +
          s"ELSE ${ch(0)} END)"
      }
      val bits = (47 to 0 by -1).map { kk =>
        val r = kk >> 3; val c = kk & 7
        val i1 = r * 9 + c + 1
        s"(CASE WHEN g[$i1] > g[${i1 + 1}] THEN ${1L << kk} ELSE 0 END)"
      }.mkString(" + ")
      s"""WITH mm AS (
         |  SELECT doc_id,
         |    [${gExprs.mkString(", ")}] AS g
         |  FROM documents),
         |sigs AS (
         |  SELECT doc_id AS id, CAST($bits AS BIGINT) AS phash FROM mm),
         |banded AS (
         |  SELECT id, phash,
         |    unnest([(phash >> 0) & 4095, (phash >> 12) & 4095,
         |            (phash >> 24) & 4095, (phash >> 36) & 4095]) AS bv,
         |    generate_subscripts([1, 2, 3, 4], 1) AS band
         |  FROM sigs),
         |cand AS (
         |  SELECT DISTINCT a.id AS id_a, b.id AS id_b,
         |    a.phash AS ph_a, b.phash AS ph_b
         |  FROM banded a JOIN banded b
         |    ON a.band = b.band AND a.bv = b.bv AND a.id < b.id)
         |SELECT id_a, id_b,
         |  CAST(bit_count(xor(ph_a, ph_b)) AS INT) AS hamming
         |FROM cand WHERE bit_count(xor(ph_a, ph_b)) <= 6
         |ORDER BY id_a, id_b""".stripMargin
    },

    "mm_resize_real" -> {
      // analytic pixel replay at the 6×4 resize grid's source
      // indices: target (r, c) samples source (y, x) = (3r, 3c)
      val gExprs = for (r <- 0 to 3; c <- 0 to 5) yield {
        val x = 3 * c; val y = 3 * r
        val p = 2 * (x % 16) + 1
        val h = s"md5(CAST(doc_id // 2 AS VARCHAR) || '-$y')"
        def nib(pos: Int) =
          s"(strpos('0123456789abcdef', substr($h, $pos, 1)) - 1)"
        s"((16 * ${nib(p)} + ${nib(p + 1)}) % 200 + (doc_id % 2))"
      }
      val rsum = (1 to 24).map(i => s"g[$i] * $i").mkString(" + ")
      s"""WITH mm AS (
         |  SELECT doc_id, [${gExprs.mkString(", ")}] AS g
         |  FROM documents)
         |SELECT doc_id AS id, CAST(18 AS INT) AS width,
         |  CAST(12 AS INT) AS height, CAST($rsum AS BIGINT) AS rsum,
         |  CAST(list_min(g) AS INT) AS rmin, CAST(list_max(g) AS INT) AS rmax
         |FROM mm ORDER BY id""".stripMargin
    },

    "mm_gif_phash" -> {
      // the mm_phash_real analytic pixel replay with the "g" seed
      val gExprs = for (r <- 0 to 5; c <- 0 to 8) yield {
        val x = 2 * c; val y = 2 * r
        val p = 2 * (x % 16) + 1
        val h = s"md5('g' || CAST(doc_id // 2 AS VARCHAR) || '-$y')"
        def nib(pos: Int) =
          s"(strpos('0123456789abcdef', substr($h, $pos, 1)) - 1)"
        s"((16 * ${nib(p)} + ${nib(p + 1)}) % 200 + (doc_id % 2))"
      }
      val bits = (47 to 0 by -1).map { kk =>
        val r = kk >> 3; val c = kk & 7
        val i1 = r * 9 + c + 1
        s"(CASE WHEN g[$i1] > g[${i1 + 1}] THEN ${1L << kk} ELSE 0 END)"
      }.mkString(" + ")
      s"""WITH mm AS (
         |  SELECT doc_id,
         |    [${gExprs.mkString(", ")}] AS g
         |  FROM documents),
         |sigs AS (
         |  SELECT doc_id AS id, CAST($bits AS BIGINT) AS phash FROM mm),
         |banded AS (
         |  SELECT id, phash,
         |    unnest([(phash >> 0) & 4095, (phash >> 12) & 4095,
         |            (phash >> 24) & 4095, (phash >> 36) & 4095]) AS bv,
         |    generate_subscripts([1, 2, 3, 4], 1) AS band
         |  FROM sigs),
         |cand AS (
         |  SELECT DISTINCT a.id AS id_a, b.id AS id_b,
         |    a.phash AS ph_a, b.phash AS ph_b
         |  FROM banded a JOIN banded b
         |    ON a.band = b.band AND a.bv = b.bv AND a.id < b.id)
         |SELECT id_a, id_b,
         |  CAST(bit_count(xor(ph_a, ph_b)) AS INT) AS hamming
         |FROM cand WHERE bit_count(xor(ph_a, ph_b)) <= 6
         |ORDER BY id_a, id_b""".stripMargin
    },

    "mm_phash_jpeg" -> mmPhashJpegSql,

    // SHARED oracle on purpose: the progressive fixture plants the
    // SAME block patterns, so identical output here proves the
    // multi-scan decode reproduced the baseline pixels exactly
    "mm_phash_jpeg_prog" -> mmPhashJpegSql,

    "mm_video_phash" -> {
      // the analytic FRAME-1 block contract of AviCodec.synthAvis:
      // v = byte bx of md5("v(id÷2)-1-by") mod 200 + id mod 2 — the
      // RIFF walk + JPEG decode in between is what Spark proves
      val gExprs = for (r <- 0 to 5; c <- 0 to 8) yield {
        val p = 2 * c + 1
        val h = s"md5('v' || CAST(doc_id // 2 AS VARCHAR) || '-1-$r')"
        def nib(pos: Int) =
          s"(strpos('0123456789abcdef', substr($h, $pos, 1)) - 1)"
        s"((16 * ${nib(p)} + ${nib(p + 1)}) % 200 + (doc_id % 2))"
      }
      val bits = (47 to 0 by -1).map { kk =>
        val r = kk >> 3; val c = kk & 7
        val i1 = r * 9 + c + 1
        s"(CASE WHEN g[$i1] > g[${i1 + 1}] THEN ${1L << kk} ELSE 0 END)"
      }.mkString(" + ")
      s"""WITH mm AS (
         |  SELECT doc_id,
         |    [${gExprs.mkString(", ")}] AS g
         |  FROM documents),
         |sigs AS (
         |  SELECT doc_id AS id, CAST($bits AS BIGINT) AS phash FROM mm),
         |banded AS (
         |  SELECT id, phash,
         |    unnest([(phash >> 0) & 4095, (phash >> 12) & 4095,
         |            (phash >> 24) & 4095, (phash >> 36) & 4095]) AS bv,
         |    generate_subscripts([1, 2, 3, 4], 1) AS band
         |  FROM sigs),
         |cand AS (
         |  SELECT DISTINCT a.id AS id_a, b.id AS id_b,
         |    a.phash AS ph_a, b.phash AS ph_b
         |  FROM banded a JOIN banded b
         |    ON a.band = b.band AND a.bv = b.bv AND a.id < b.id)
         |SELECT id_a, id_b,
         |  CAST(bit_count(xor(ph_a, ph_b)) AS INT) AS hamming
         |FROM cand WHERE bit_count(xor(ph_a, ph_b)) <= 6
         |ORDER BY id_a, id_b""".stripMargin
    },

    "text_readability" ->
      """WITH c AS (
        |  SELECT doc_id, text,
        |    trim(regexp_replace(regexp_replace(lower(text),
        |      '[^a-z0-9 ]', ' ', 'g'), '\s+', ' ', 'g')) AS t
        |  FROM documents),
        |m AS (
        |  SELECT doc_id,
        |    CAST(len([x for x in string_split(t, ' ') if x <> ''])
        |      AS BIGINT) AS n_words,
        |    CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
        |      AS BIGINT) AS n_sentences,
        |    CAST(len(regexp_extract_all(t, '[aeiouy]+')) AS BIGINT)
        |      AS n_syllables
        |  FROM c)
        |SELECT doc_id, n_words, n_sentences, n_syllables,
        |  CASE WHEN n_words > 0 THEN
        |    round(206.835
        |      - 1.015 * (CAST(n_words AS DOUBLE)
        |        / CAST(n_sentences AS DOUBLE))
        |      - 84.6 * (CAST(n_syllables AS DOUBLE)
        |        / CAST(n_words AS DOUBLE)), 4)
        |  ELSE NULL END AS flesch
        |FROM m ORDER BY doc_id""".stripMargin,

    "text_zipf" ->
      """WITH canon AS (
        |  SELECT trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z0-9 ]', ' ', 'g'), '\s+', ' ', 'g')) AS t
        |  FROM documents),
        |tok AS (
        |  SELECT unnest([x for x in string_split(t, ' ') if x <> ''])
        |    AS tok
        |  FROM canon),
        |census AS (SELECT tok, count(*) AS c FROM tok GROUP BY tok),
        |top AS (SELECT tok, c FROM census ORDER BY c DESC, tok LIMIT 1000),
        |ranked AS (
        |  SELECT c, row_number() OVER (ORDER BY c DESC, tok) AS rk
        |  FROM top),
        |a AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST(round(ln(CAST(rk AS DOUBLE)), 6)
        |      AS DECIMAL(28,6))) AS DOUBLE) AS sx,
        |    CAST(sum(CAST(round(ln(CAST(c AS DOUBLE)), 6)
        |      AS DECIMAL(28,6))) AS DOUBLE) AS sy,
        |    CAST(sum(CAST(round(ln(CAST(rk AS DOUBLE)) *
        |      ln(CAST(rk AS DOUBLE)), 6) AS DECIMAL(28,6))) AS DOUBLE)
        |      AS sxx,
        |    CAST(sum(CAST(round(ln(CAST(rk AS DOUBLE)) *
        |      ln(CAST(c AS DOUBLE)), 6) AS DECIMAL(28,6))) AS DOUBLE)
        |      AS sxy
        |  FROM ranked),
        |b AS (
        |  SELECT n, sx, sy,
        |    (CAST(n AS DOUBLE) * sxy - sx * sy) /
        |      (CAST(n AS DOUBLE) * sxx - sx * sx) AS slope
        |  FROM a)
        |SELECT n AS n_terms, round(slope, 4) AS zipf_slope,
        |  round((sy - slope * sx) / CAST(n AS DOUBLE), 4) AS intercept
        |FROM b""".stripMargin,

    "text_fingerprint" ->
      """WITH canon AS (
        |  SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z0-9 ]', ' ', 'g'), '\s+', ' ', 'g')) AS c
        |  FROM documents)
        |SELECT doc_id,
        |  md5(array_to_string(list_sort(list_distinct(
        |    [x for x in string_split(c, ' ') if x <> ''])), ' ')) AS fingerprint
        |FROM canon ORDER BY doc_id""".stripMargin,

    "text_bm25" ->
      s"""WITH $bm25ChainSql
        |SELECT doc_id, bm25
        |FROM bm25sc ORDER BY bm25 DESC, doc_id LIMIT 10""".stripMargin,

    "search_hybrid" ->
      s"""WITH $bm25ChainSql,
        |lex AS (
        |  SELECT doc_id AS id,
        |    row_number() OVER (ORDER BY bm25 DESC, doc_id) AS lex_rk
        |  FROM bm25sc QUALIFY lex_rk <= 20),
        |qv AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 8),
        |vecsc AS (
        |  SELECT vec_id AS id, round(list_cosine_similarity(
        |    CAST(embedding AS DOUBLE[]), CAST(qv AS DOUBLE[])), 6) AS cos
        |  FROM embeddings, qv WHERE vec_id >= 16),
        |vec AS (
        |  SELECT id, row_number() OVER (ORDER BY cos DESC, id) AS vec_rk
        |  FROM vecsc QUALIFY vec_rk <= 20),
        |fused AS (
        |  SELECT coalesce(l.id, v.id) AS id,
        |    round(coalesce(1.0::DOUBLE / (60 + l.lex_rk), 0)
        |      + coalesce(1.0::DOUBLE / (60 + v.vec_rk), 0), 6) AS rrf,
        |    l.lex_rk, v.vec_rk
        |  FROM lex l FULL OUTER JOIN vec v ON l.id = v.id)
        |SELECT id, rrf, lex_rk, vec_rk
        |FROM fused ORDER BY rrf DESC, id LIMIT 10""".stripMargin,

    "index_postings" ->
      """WITH canon AS (
        |  SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z0-9 ]', ' ', 'g'), '\s+', ' ', 'g')) AS c
        |  FROM documents),
        |tok AS (
        |  SELECT doc_id, unnest(
        |    [x for x in string_split(c, ' ') if x <> '']) AS term
        |  FROM canon),
        |tf AS (
        |  SELECT term, doc_id, count(*) AS tf FROM tok GROUP BY 1, 2),
        |stats AS (
        |  SELECT term, count(*) AS df, CAST(sum(tf) AS BIGINT) AS cf
        |  FROM tf GROUP BY term),
        |ranked AS (
        |  SELECT term, doc_id,
        |    row_number() OVER (PARTITION BY term ORDER BY doc_id) AS rk
        |  FROM tf),
        |heads AS (
        |  SELECT term, string_agg(CAST(doc_id AS VARCHAR), ','
        |    ORDER BY doc_id) AS postings_head
        |  FROM ranked WHERE rk <= 8 GROUP BY term)
        |SELECT term, df, cf, postings_head
        |FROM stats JOIN heads USING (term)
        |WHERE df >= 5 ORDER BY term""".stripMargin,

    "dedup_apply_best" ->
      s"""WITH RECURSIVE $componentCtes,
         |qstats AS (
         |  SELECT id,
         |    CAST(len([x for x in string_split(trim(regexp_replace(text,
         |      '\\s+', ' ', 'g')), ' ') if x <> '']) AS DOUBLE) AS n_words,
         |    CAST(length(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE) AS n_chars,
         |    CAST(len(regexp_extract_all(lower(text),
         |      '\\b(the|a|of|and|to|in)\\b')) AS DOUBLE) AS stop
         |  FROM corpus),
         |quality AS (
         |  SELECT id,
         |    round(least(CASE WHEN n_words > 0 THEN stop / n_words ELSE 0 END * 2, 1.0) * 0.4
         |        + least((CASE WHEN n_words > 0 THEN n_chars / n_words ELSE 0 END) / 8.0, 1.0) * 0.3
         |        + least(n_words / 100.0, 1.0) * 0.3, 4) AS q
         |  FROM qstats),
         |ranked AS (
         |  SELECT comp.node AS id,
         |    row_number() OVER (PARTITION BY comp.component
         |      ORDER BY quality.q DESC, comp.node) AS rk
         |  FROM comp JOIN quality ON quality.id = comp.node),
         |drops AS (SELECT id FROM ranked WHERE rk > 1)
         |SELECT c.id, md5(c.text) AS text_hash FROM corpus c
         |WHERE c.id NOT IN (SELECT id FROM drops)
         |ORDER BY c.id""".stripMargin,

    "decontaminate_semantic" ->
      """WITH corpus AS (
        |  SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 16),
        |bench AS (
        |  SELECT vec_id AS bench_id, embedding AS bv
        |  FROM embeddings WHERE vec_id < 8),
        |scored AS (
        |  SELECT c.vec_id,
        |    round(list_cosine_similarity(CAST(c.embedding AS DOUBLE[]),
        |      CAST(b.bv AS DOUBLE[])), 6) AS cos
        |  FROM corpus c CROSS JOIN bench b)
        |SELECT vec_id, count(*) AS n_bench_hits, round(max(cos), 4) AS max_cos
        |FROM scored WHERE cos >= 0.35
        |GROUP BY vec_id ORDER BY vec_id""".stripMargin,

    "text_winnow" -> {
      // value of the first 8 hex digits of an md5 hex string (lambda
      // var h) as a BIGINT — the Sampling.slot digit-sum replay
      // without the modulus
      val hexVal = (0 until 8).map { i =>
        val mult = 1L << (4 * (7 - i))
        s"(strpos('0123456789abcdef', substr(h, ${i + 1}, 1)) - 1) * $mult"
      }.mkString("(", " + ", ")")
      s"""WITH canon AS (
         |  SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text),
         |    '[^a-z0-9 ]', ' ', 'g'), '\\s+', ' ', 'g')) AS c
         |  FROM documents),
         |gs AS (
         |  SELECT doc_id,
         |    [md5(substr(c, i, 5))
         |     for i in range(1, greatest(length(c) - 4, 0) + 1)] AS gs
         |  FROM canon),
         |hs AS (
         |  SELECT doc_id, list_transform(gs, h -> $hexVal) AS hs
         |  FROM gs),
         |wins AS (
         |  SELECT doc_id, hs,
         |    [list_min(hs[i:i+3])
         |     for i in range(1, greatest(len(hs) - 3, 0) + 1)] AS wins
         |  FROM hs),
         |fps AS (
         |  SELECT doc_id, CAST(len(wins) AS BIGINT) AS n_windows,
         |    list_sort(list_distinct(wins)) AS fps
         |  FROM wins)
         |SELECT doc_id, n_windows, CAST(len(fps) AS BIGINT) AS n_fp,
         |  md5(array_to_string(fps, ',')) AS fp_hash
         |FROM fps ORDER BY doc_id""".stripMargin
    },

    "phrase_hits" ->
      """WITH canon AS (
        |  SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z0-9 ]', ' ', 'g'), '\s+', ' ', 'g')) AS c
        |  FROM documents),
        |tok AS (
        |  SELECT doc_id, [x for x in string_split(c, ' ') if x <> ''] AS toks
        |  FROM canon WHERE c <> ''),
        |pos AS (
        |  SELECT doc_id,
        |    [i for i in range(1, len(toks) + 1) if toks[i] = 'spark'] AS pa,
        |    [i for i in range(1, len(toks) + 1) if toks[i] = 'filter'] AS pb
        |  FROM tok)
        |SELECT doc_id,
        |  CAST(len(list_intersect(list_transform(pa, x -> x + 1), pb))
        |    AS BIGINT) AS n_hits
        |FROM pos
        |WHERE len(list_intersect(list_transform(pa, x -> x + 1), pb)) > 0
        |ORDER BY doc_id""".stripMargin,

    "bigram_pmi" ->
      """WITH canon AS (
        |  SELECT trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z0-9 ]', ' ', 'g'), '\s+', ' ', 'g')) AS c
        |  FROM documents),
        |tok AS (
        |  SELECT [x for x in string_split(c, ' ') if x <> ''] AS toks
        |  FROM canon WHERE c <> ''),
        |bi AS (
        |  SELECT b.w1 AS w1, b.w2 AS w2 FROM (
        |    SELECT unnest(list_transform(range(1, len(toks)),
        |      i -> {'w1': toks[i], 'w2': toks[i+1]})) AS b
        |    FROM tok WHERE len(toks) >= 2)),
        |tot AS (SELECT CAST(count(*) AS DOUBLE) AS n_total FROM bi),
        |cnt AS (
        |  SELECT w1, w2, CAST(count(*) AS BIGINT) AS n_xy
        |  FROM bi GROUP BY 1, 2 HAVING count(*) >= 5),
        |lx AS (SELECT w1, count(*) AS n_x FROM bi GROUP BY 1),
        |ry AS (SELECT w2, count(*) AS n_y FROM bi GROUP BY 1)
        |SELECT c.w1, c.w2, c.n_xy,
        |  round(ln(c.n_xy * t.n_total / (l.n_x * r.n_y)), 6) AS pmi
        |FROM cnt c JOIN lx l USING (w1) JOIN ry r USING (w2)
        |CROSS JOIN tot t
        |ORDER BY pmi DESC, w1, w2 LIMIT 20""".stripMargin,

    "emb_pca_power" ->
      s"""WITH $pcaChainSql
         |SELECT CAST(t.dim AS INT) AS dim, round(v[t.dim], 6) AS loading,
         |  round((SELECT nrm FROM n2), 4) AS ev
         |FROM v2, generate_series(1, 64) AS t(dim)
         |ORDER BY dim""".stripMargin,

    "emb_pca_project" ->
      s"""WITH $pcaChainSql
         |SELECT e.vec_id, round(list_dot_product(
         |  CAST(e.embedding AS DOUBLE[]), (SELECT v FROM v2)), 6) AS score
         |FROM embeddings e WHERE e.vec_id >= 16
         |ORDER BY e.vec_id""".stripMargin,

    "ann_knn_graph" ->
      s"""WITH $knnGraphChainSql
         |SELECT vec_id, rk, nbr_id, cosine FROM granked WHERE rk <= 3
         |ORDER BY vec_id, rk""".stripMargin,

    "bitext_mine" ->
      """WITH planes AS (
        |  SELECT vec_id AS plane_id, embedding AS pv
        |  FROM embeddings WHERE vec_id < 6),
        |side AS (
        |  SELECT e.vec_id, e.embedding, e.vec_id % 2 AS sd,
        |    CAST(sum(CASE WHEN list_dot_product(CAST(e.embedding AS DOUBLE[]),
        |        CAST(p.pv AS DOUBLE[])) > 0
        |      THEN (1 << p.plane_id) ELSE 0 END) AS INT) AS bucket
        |  FROM embeddings e CROSS JOIN planes p
        |  WHERE e.vec_id >= 16 GROUP BY e.vec_id, e.embedding),
        |bp AS MATERIALIZED (
        |  SELECT x.vec_id AS x_id, y.vec_id AS y_id,
        |    round(list_cosine_similarity(CAST(x.embedding AS DOUBLE[]),
        |      CAST(y.embedding AS DOUBLE[])), 6) AS cosine
        |  FROM side x JOIN side y ON x.bucket = y.bucket
        |  WHERE x.sd = 0 AND y.sd = 1),
        |ax AS (
        |  SELECT x_id, round(list_aggregate(list_sort(list(cosine)), 'sum')
        |      / count(*), 6) AS ax
        |  FROM (SELECT x_id, cosine, row_number() OVER (PARTITION BY x_id
        |          ORDER BY cosine DESC, y_id) AS rk FROM bp) t
        |  WHERE rk <= 4 GROUP BY x_id),
        |ay AS (
        |  SELECT y_id, round(list_aggregate(list_sort(list(cosine)), 'sum')
        |      / count(*), 6) AS ay
        |  FROM (SELECT y_id, cosine, row_number() OVER (PARTITION BY y_id
        |          ORDER BY cosine DESC, x_id) AS rk FROM bp) t
        |  WHERE rk <= 4 GROUP BY y_id),
        |fwd AS (
        |  SELECT x_id, y_id, cosine FROM (
        |    SELECT bp.*, row_number() OVER (PARTITION BY x_id
        |      ORDER BY cosine DESC, y_id) AS rk FROM bp) t WHERE rk = 1),
        |bwd AS (
        |  SELECT x_id, y_id FROM (
        |    SELECT bp.*, row_number() OVER (PARTITION BY y_id
        |      ORDER BY cosine DESC, x_id) AS rk FROM bp) t WHERE rk = 1),
        |mined AS (
        |  SELECT f.x_id, f.y_id, f.cosine,
        |    round(f.cosine / ((ax.ax + ay.ay) / 2), 4) AS margin
        |  FROM fwd f JOIN bwd b ON b.x_id = f.x_id AND b.y_id = f.y_id
        |  JOIN ax ON ax.x_id = f.x_id JOIN ay ON ay.y_id = f.y_id)
        |SELECT x_id, y_id, cosine, margin FROM mined
        |WHERE margin >= 1.05 ORDER BY x_id""".stripMargin,

    "ann_graph_search" ->
      s"""WITH $graphBeamChainSql,
         |final AS (
         |  SELECT query_id, node, s,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY s DESC, node) AS rk
         |  FROM beam3)
         |SELECT query_id, rk, node AS vec_id, s / 1e6 AS cosine
         |FROM final WHERE rk <= 5 ORDER BY query_id, rk""".stripMargin,

    "ann_graph_recall" ->
      s"""WITH $graphBeamChainSql,
         |approx AS (
         |  SELECT query_id, node AS vec_id FROM (
         |    SELECT query_id, node,
         |      row_number() OVER (PARTITION BY query_id
         |        ORDER BY s DESC, node) AS rk
         |    FROM beam3) WHERE rk <= 5),
         |escored AS (
         |  SELECT q.query_id, c.vec_id,
         |    round(list_cosine_similarity(CAST(q.qv AS DOUBLE[]),
         |      CAST(c.embedding AS DOUBLE[])), 6) AS cosine
         |  FROM q JOIN cs c ON c.vec_id <> q.query_id),
         |eranked AS (
         |  SELECT query_id, vec_id,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY cosine DESC, vec_id) AS rk
         |  FROM escored),
         |exact AS (SELECT query_id, vec_id FROM eranked WHERE rk <= 5)
         |SELECT e.query_id, count(a.vec_id) AS n_hits,
         |  round(count(a.vec_id) / 5.0, 4) AS recall_at_5
         |FROM exact e LEFT JOIN approx a
         |  ON a.query_id = e.query_id AND a.vec_id = e.vec_id
         |GROUP BY e.query_id ORDER BY e.query_id""".stripMargin,

    "ann_hnsw" -> annHnswSql,

    // serve ≡ build: stored adjacency is bit-identical to the fresh
    // graph (the winsorize_stored / quality_nb_stored discipline)
    "ann_hnsw_stored" -> annHnswSql,

    "ann_hnsw_recall" ->
      s"""WITH $hnswBeamChainSql,
         |approx AS (
         |  SELECT query_id, node AS vec_id FROM (
         |    SELECT query_id, node,
         |      row_number() OVER (PARTITION BY query_id
         |        ORDER BY s DESC, node) AS rk
         |    FROM bbeam2) WHERE rk <= 5),
         |escored AS (
         |  SELECT q.query_id, c.vec_id,
         |    round(list_cosine_similarity(CAST(q.qv AS DOUBLE[]),
         |      CAST(c.embedding AS DOUBLE[])), 6) AS cosine
         |  FROM q JOIN cs c ON c.vec_id <> q.query_id),
         |eranked AS (
         |  SELECT query_id, vec_id,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY cosine DESC, vec_id) AS rk
         |  FROM escored),
         |exact AS (SELECT query_id, vec_id FROM eranked WHERE rk <= 5)
         |SELECT e.query_id, count(a.vec_id) AS n_hits,
         |  round(count(a.vec_id) / 5.0, 4) AS recall_at_5
         |FROM exact e LEFT JOIN approx a
         |  ON a.query_id = e.query_id AND a.vec_id = e.vec_id
         |GROUP BY e.query_id ORDER BY e.query_id""".stripMargin,

    "filter_domains" -> filterDomainsSql,

    "filter_domains_scaled" -> filterDomainsSql,

    "stats_drift" ->
      """WITH canon AS (
        |  SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z0-9 ]', ' ', 'g'), '\s+', ' ', 'g')) AS c
        |  FROM documents),
        |tok AS (
        |  SELECT doc_id % 2 AS b, unnest(
        |    [x for x in string_split(c, ' ') if x <> '']) AS term
        |  FROM canon),
        |counts AS (
        |  SELECT term,
        |    CAST(sum(CASE WHEN b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        |    CAST(sum(CASE WHEN b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cb
        |  FROM tok GROUP BY term),
        |totals AS (
        |  SELECT CAST(sum(ca) AS DOUBLE) AS ta, CAST(sum(cb) AS DOUBLE) AS tb
        |  FROM counts)
        |SELECT term, round(ca / ta, 6) AS p_a, round(cb / tb, 6) AS p_b,
        |  round((ca / ta) * ln((ca / ta) / (cb / tb)), 6) AS kl_term
        |FROM counts, totals WHERE ca > 0 AND cb > 0
        |ORDER BY kl_term DESC, term LIMIT 10""".stripMargin)
}
