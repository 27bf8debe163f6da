package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{TextAnalysis, VectorFns}

/** Deduplication family for a training-data pipeline: exact,
  * MinHash+LSH, SimHash, n-gram Jaccard, and embedding-cosine
  * near-dup. Every variant follows the same scale discipline:
  * candidate generation via a bounded index key (hash, band, gram,
  * bucket), then verification only on candidates — never an O(n²)
  * cross join over the corpus.
  *
  * Hashing is md5-based so signatures are engine-portable (the DuckDB
  * oracle reproduces them bit-for-bit); a production deployment would
  * swap in xxhash64 for speed without changing the plan shape.
  */
object Dedup {

  /** Exact dedup on the md5 of the raw text: one shuffle keyed on a
    * fixed-width hash (never the full document). Returns only
    * duplicate groups: (text_hash, n_copies, keep_id, drop_max_id). */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(md5(col(textCol)).as("text_hash"), col(idCol).as("id"))
      .groupBy(col("text_hash"))
      .agg(count(lit(1)).as("n_copies"), min(col("id")).as("keep_id"),
        max(col("id")).as("drop_max_id"))
      .filter(col("n_copies") > 1)

  /** (id, shingles) helper view. */
  private def shingled(df: DataFrame, idCol: String, textCol: String, k: Int) =
    df.select(col(idCol).as("id"),
      TextAnalysis.wordShingles(col(textCol), k).as("sh"))

  /** MinHash + LSH near-dup pairs.
    *
    * Each shingle is md5-hashed ONCE; the k signature components are
    * minima over disjoint 5-hex-char (20-bit) slices of that digest —
    * the standard one-hash trick, cutting hashing cost k-fold while
    * keeping slices independent across components. Components are
    * grouped into bands of `rowsPerBand`; documents colliding on any
    * band hash become candidates; candidates are verified with true
    * shingle-set Jaccard >= threshold.
    *
    * Scale shape: the band shuffle carries ONLY (band, hash, id) — the
    * shingle arrays rejoin after candidate pairs are deduped, so the
    * wide shuffle never moves document content. Candidate pairs come
    * from GROUPING on the band key rather than a band self-join, and
    * verification melts each pair to (pair, role, id) and joins the
    * shingle view ONCE — so the shingle/signature subtree is evaluated
    * once for candidate generation and once for verification (the
    * self-join + two-join formulation re-derived it up to 4×; Spark
    * recomputes unshared subtrees per consumer).
    *
    * Memory note (cf. [[simhashPairs]]): `collect_list` per (band,
    * hash) group is bounded by the band-collision group size —
    * duplicate-cluster-sized for real corpora. `maxBandGroup` is the
    * hostile-flood guard: band groups larger than the cap are DROPPED
    * before pair expansion (the [[ngramJaccard]] df-cap pattern — a
    * windowed count, which sorts and spills instead of materializing
    * the group). Recall consequence: members of a dropped band group
    * can still pair through their other bands; a pair colliding ONLY
    * in flooded bands is lost — the deliberate trade for bounded
    * memory under a poisoned corpus (one viral boilerplate string).
    */
  /** (id, band, bh) MinHash band hashes — the LSH fingerprint rows of
    * a document. Shared by [[minhashLsh]] (pair finding within one
    * corpus) and the incremental store path ([[bandStore]] /
    * [[incrementalNear]]): a persisted DISTINCT (band, bh) table over
    * the historical corpus is the whole near-dup memory a daily batch
    * needs — fixed-width keys, no text, no signatures. */
  def minhashBanded(df: DataFrame, idCol: String, textCol: String,
                    shingleK: Int = 3, numHashes: Int = 6,
                    rowsPerBand: Int = 3): DataFrame = {
    require(numHashes * 5 <= 32, "md5 has 32 hex chars; numHashes*5 must fit")
    require(rowsPerBand >= 1, s"rowsPerBand must be positive, got $rowsPerBand")
    require(numHashes % rowsPerBand == 0,
      s"numHashes ($numHashes) must divide evenly into bands of $rowsPerBand — " +
        "a remainder would silently drop signature components")
    val sh = shingled(df, idCol, textCol, shingleK).filter(size(col("sh")) > 0)
    val sig = {
      import org.apache.spark.sql.GraftBridge.{column, expression}
      sh.select(col("id"), column(graft.functions.expr.MinHashSignature(
        expression(col("sh")), numHashes, 5)).as("sig"))
    }
    val numBands = numHashes / rowsPerBand
    sig.select(col("id"),
      posexplode(array((0 until numBands).map(b =>
        md5(concat_ws("|", (0 until rowsPerBand).map(r =>
          col("sig").getItem(b * rowsPerBand + r)): _*))): _*)).as(Seq("band", "bh")))
  }

  /** The persisted fingerprint STORE of incremental near-dedup: the
    * DISTINCT (band, bh) rows of a corpus. At 100 TB this table is
    * what survives between daily runs — never the text. */
  def bandStore(df: DataFrame, idCol: String, textCol: String,
                shingleK: Int = 3, numHashes: Int = 6,
                rowsPerBand: Int = 3): DataFrame =
    minhashBanded(df, idCol, textCol, shingleK, numHashes, rowsPerBand)
      .select(col("band"), col("bh")).distinct()

  /** Incremental NEAR-dedup of a daily batch against a persisted
    * [[bandStore]] — the shape a 100 TB crawl actually ships, because
    * re-deduping the full corpus daily is exactly what you can't
    * afford:
    *
    *  1. the batch is shingled and banded ([[minhashBanded]]);
    *  2. any batch doc colliding with the store on ANY (band, bh) is
    *     dropped as near-known (a semi join on fixed-width keys; band
    *     collision ≈ the LSH candidate test — the deliberate
    *     precision trade of a store that keeps no shingles to verify
    *     against, tuned by the band/row geometry);
    *  3. within-batch survivors near-dedup among THEMSELVES with the
    *     fully verified [[minhashLsh]] + connected components; each
    *     cluster keeps its min id.
    *
    * Returns (keep_id, n_copies): one row per kept document,
    * n_copies = its within-batch cluster size (1 for singletons).
    * The caller then appends the kept docs' band rows to the store —
    * the store update is a union + distinct, incremental by
    * construction.
    */
  def incrementalNear(batch: DataFrame, store: DataFrame,
                      idCol: String, textCol: String,
                      shingleK: Int = 3, numHashes: Int = 6,
                      rowsPerBand: Int = 3,
                      threshold: Double = 0.5): DataFrame = {
    val banded = minhashBanded(batch, idCol, textCol, shingleK, numHashes, rowsPerBand)
    val hitIds = banded.join(store, Seq("band", "bh"), "left_semi")
      .select(col("id")).distinct()
    // Eagerly cut the survivor frame's lineage: its plan (batch anti
    // store-semi-join, store build included) is re-derived once per
    // consumer inside the verified LSH below (shingles, banding, and
    // both sides of the verify join) — measured SUPERLINEAR on the
    // 10×→30× smoke (49.6 s → 315.4 s) until materialized here, linear
    // after. A day's kept batch is exactly what a production run
    // materializes anyway; at bench scale the write is rows-sized
    // (id, text), not corpus-sized. The cut's durability (executor
    // blocks vs reliable checkpoint vs parquet-and-rescan) is the
    // session's spark.graft.materialize strategy — see [[Materialize]].
    val survivors = Materialize.cut(
      batch.select(col(idCol).as("id"), col(textCol).as("text"))
        .join(hitIds, Seq("id"), "left_anti"))
    val pairs = minhashLsh(survivors, "id", "text", shingleK, numHashes,
      rowsPerBand, threshold)
    val comp = Components.connected(pairs, "id_a", "id_b")
      .select(col("node").as("id"), col("component"))
    survivors.select(col("id"))
      .join(comp, Seq("id"), "left")
      .withColumn("comp", coalesce(col("component"), col("id")))
      .groupBy(col("comp"))
      .agg(min(col("id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .select(col("keep_id"), col("n_copies"))
  }

  def minhashLsh(df: DataFrame, idCol: String, textCol: String,
                 shingleK: Int = 3, numHashes: Int = 6, rowsPerBand: Int = 3,
                 threshold: Double = 0.5,
                 maxBandGroup: Option[Int] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sh = shingled(df, idCol, textCol, shingleK).filter(size(col("sh")) > 0)
    val banded = minhashBanded(df, idCol, textCol, shingleK, numHashes, rowsPerBand)
    val capped = maxBandGroup match {
      case Some(cap) =>
        banded.withColumn("__n",
            count(lit(1)).over(Window.partitionBy(col("band"), col("bh"))))
          .filter(col("__n") <= cap)
          .drop("__n")
      case None => banded
    }
    val cand = capped
      .groupBy(col("band"), col("bh"))
      .agg(sort_array(collect_list(col("id"))).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(col("ids"), posexplode(col("ids")).as(Seq("i", "id_a")))
      .select(col("id_a"),
        explode(slice(col("ids"), col("i") + 2, size(col("ids")))).as("id_b"))
      .distinct()
    // Verify: melt the pair to two (role, id) rows, join shingles once,
    // regroup — exactly one non-null per role per group, so max() is a
    // deterministic "the one value" pick over the array type.
    cand
      .select(col("id_a"), col("id_b"),
        explode(array(
          struct(lit("a").as("role"), col("id_a").as("id")),
          struct(lit("b").as("role"), col("id_b").as("id")))).as("m"))
      .select(col("id_a"), col("id_b"), col("m.role").as("role"), col("m.id").as("id"))
      .join(sh, Seq("id"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(
        max(when(col("role") === "a", col("sh"))).as("sh_a"),
        max(when(col("role") === "b", col("sh"))).as("sh_b"))
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** MinHash ACCURACY gate — the estimator-quality contract for the
    * near-dup family, as [[graft.operators.Ann]]'s recall gates are
    * for ANN: for every LSH candidate pair, the signature-agreement
    * Jaccard ESTIMATE (matching components / numHashes — the quantity
    * banding actually thresholds on, E[est] = J by the MinHash
    * theorem) side by side with the exact shingle-set Jaccard and the
    * absolute error. Pairs where the estimator misleads (high est,
    * low exact) are precisely the verification stage's workload — so
    * this frame is also the tuning input for numHashes/rowsPerBand.
    *
    * Scale shape: identical to [[minhashLsh]] (band-key grouping for
    * candidates — never a self-join; signatures/shingles rejoin once
    * via the melt). Estimate and exact are both derived from the
    * same per-pair arrays; no extra shuffle beyond the LSH chain. */
  def minhashEstimate(df: DataFrame, idCol: String, textCol: String,
                      shingleK: Int = 3, numHashes: Int = 6,
                      rowsPerBand: Int = 3): DataFrame = {
    val sh = shingled(df, idCol, textCol, shingleK).filter(size(col("sh")) > 0)
    val sig = {
      import org.apache.spark.sql.GraftBridge.{column, expression}
      sh.select(col("id"), col("sh"),
        column(graft.functions.expr.MinHashSignature(
          expression(col("sh")), numHashes, 5)).as("sig"))
    }
    val banded = minhashBanded(df, idCol, textCol, shingleK, numHashes,
      rowsPerBand)
    val cand = banded
      .groupBy(col("band"), col("bh"))
      .agg(sort_array(collect_list(col("id"))).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(col("ids"), posexplode(col("ids")).as(Seq("i", "id_a")))
      .select(col("id_a"),
        explode(slice(col("ids"), col("i") + 2, size(col("ids")))).as("id_b"))
      .distinct()
    val both = cand
      .select(col("id_a"), col("id_b"),
        explode(array(
          struct(lit("a").as("role"), col("id_a").as("id")),
          struct(lit("b").as("role"), col("id_b").as("id")))).as("m"))
      .select(col("id_a"), col("id_b"), col("m.role").as("role"),
        col("m.id").as("id"))
      .join(sig, Seq("id"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(
        max(when(col("role") === "a", col("sig"))).as("sig_a"),
        max(when(col("role") === "b", col("sig"))).as("sig_b"),
        max(when(col("role") === "a", col("sh"))).as("sh_a"),
        max(when(col("role") === "b", col("sh"))).as("sh_b"))
    both
      .withColumn("est",
        size(filter(zip_with(col("sig_a"), col("sig_b"),
          (x, y) => x === y), b => b)).cast("double") / numHashes.toDouble)
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .select(col("id_a"), col("id_b"), col("est"), col("jaccard"),
        abs(col("est") - col("jaccard")).as("abs_err"))
  }

  /** 48-bit SimHash signature: per-token md5 bits vote on each bit —
    * one pass per document via [[graft.functions.expr.SimHash48]]
    * (no explode, no vote shuffle). Output: (id, simhash).
    * Pair-finding joins on the signature (or on rotated bands for
    * hamming > 0). */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.GraftBridge.{column, expression}
    // No distinct: votes are term-frequency weighted (textbook SimHash).
    // On a small shared vocabulary, distinct-token signatures are
    // degenerate — most docs carry the same token SET.
    val toks = df.select(col(idCol).as("id"),
      TextAnalysis.wsTokens(TextAnalysis.canonicalize(col(textCol))).as("toks"))
      .filter(size(col("toks")) > 0)
    toks.select(col("id"),
      column(graft.functions.expr.SimHash48(expression(col("toks")))).as("simhash"))
  }

  /** SimHash duplicate pairs at hamming distance 0 (signature
    * equality — the degenerate band). Pairs come from grouping on the
    * signature rather than a self-join, so the signature expression is
    * evaluated once per document and the only shuffle is the groupBy.
    *
    * Memory note: `collect_list` per signature group is bounded by the
    * duplicate-group size, and in-group pair expansion is O(group²) —
    * fine for real dup groups (small). `maxGroup` is the hostile-flood
    * guard: signature groups larger than the cap are DROPPED before
    * pair expansion (windowed count — sorts and spills instead of
    * materializing). Recall consequence: a signature shared by more
    * than `maxGroup` documents produces NO pairs — at that
    * multiplicity the right tool is [[exact]]-style group dedup (keep
    * one representative), not a quadratic pair list. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxGroup: Option[Int] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val s0 = simhash(df, idCol, textCol)
    val s = maxGroup match {
      case Some(cap) =>
        s0.withColumn("__n",
            count(lit(1)).over(Window.partitionBy(col("simhash"))))
          .filter(col("__n") <= cap)
          .drop("__n")
      case None => s0
    }
    s.groupBy(col("simhash"))
      .agg(sort_array(collect_list(col("id"))).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(col("simhash"), col("ids"), posexplode(col("ids")).as(Seq("i", "id_a")))
      .select(col("simhash"), col("id_a"),
        explode(slice(col("ids"), col("i") + 2, size(col("ids")))).as("id_b"))
      .select(col("id_a"), col("id_b"), col("simhash"))
  }

  /** SimHash near-dup pairs at hamming distance <= maxHamming via
    * band LSH: the 48-bit signature splits into `bands` slices; pairs
    * sharing any slice value are candidates (guaranteed complete for
    * hamming < bands by pigeonhole); candidates are verified with
    * bit_count(xor) <= maxHamming. Shuffle key is (band, sliceValue) —
    * fixed-width, never the document.
    *
    * `maxBandGroup` caps band-slice groups with a windowed count
    * before the self-join (one flooded slice value would otherwise
    * expand O(group²) join output). Recall consequence: pairs
    * colliding ONLY in dropped bands are lost; the pigeonhole
    * completeness guarantee then holds only among non-flooded bands. */
  def simhashNear(df: DataFrame, idCol: String, textCol: String,
                  maxHamming: Int = 3, bands: Int = 4,
                  maxBandGroup: Option[Int] = None): DataFrame =
    bandedHammingPairs(simhash(df, idCol, textCol), "id", "simhash",
      maxHamming, bands, bits = 48, maxBandGroup)

  /** Banded hamming-neighbor pairs over ANY integer signature column —
    * the LSH skeleton [[simhashNear]] runs on simhash signatures,
    * factored out so other fingerprint families (e.g. the multimodal
    * dHash in [[Multimodal.dHash48]]) reuse the identical
    * band-bucket-join shape: signatures split into `bands` bit-slices,
    * candidates share at least one slice (never all-pairs), exact
    * hamming on the candidate set only. `maxBandGroup` caps a band
    * bucket's population — the hostile-skew guard (a constant-payload
    * flood lands in one bucket). Output: (id_a, id_b, hamming). */
  def bandedHammingPairs(sigs: DataFrame, idCol: String, sigCol: String,
                         maxHamming: Int, bands: Int = 4, bits: Int = 48,
                         maxBandGroup: Option[Int] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val width = bits / bands
    val mask = (1L << width) - 1
    // Lineage cut on the signature frame: BOTH sides of the band
    // self-join (and the distinct behind them) would otherwise
    // re-derive the whole fingerprint chain — measured ~10× on the
    // dHash path (4.6 s → 0.5 s at sf0.1). Two narrow columns per id,
    // so the cut is small under any strategy.
    val base = Materialize.cut(
      sigs.select(col(idCol).as("id"), col(sigCol).as("sig")))
    val banded0 = base.select(col("id"), col("sig"),
      posexplode(array((0 until bands).map(b =>
        shiftright(col("sig"), b * width).bitwiseAND(lit(mask))): _*))
        .as(Seq("band", "bv")))
    val banded = maxBandGroup match {
      case Some(cap) =>
        banded0.withColumn("__n",
            count(lit(1)).over(Window.partitionBy(col("band"), col("bv"))))
          .filter(col("__n") <= cap)
          .drop("__n")
      case None => banded0
    }
    val a = banded.select(col("band"), col("bv"), col("id").as("id_a"), col("sig").as("sh_a"))
    val b = banded.select(col("band"), col("bv"), col("id").as("id_b"), col("sig").as("sh_b"))
    a.join(b, Seq("band", "bv"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sh_a"), col("sh_b"))
      .distinct()
      .withColumn("hamming", expr("bit_count(sh_a ^ sh_b)"))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming").cast("int").as("hamming"))
  }

  /** Persisted HAMMING band store — the perceptual-hash twin of
    * [[bandStore]]: the DISTINCT (band, bv) bit-slices of a corpus'
    * 48-bit image/audio hashes. At 100 TB this fixed-width table is
    * what survives between daily crawl runs — never pixels, never
    * even the full hashes. */
  def hammingBandStore(sigs: DataFrame, idCol: String, sigCol: String,
                       bands: Int = 4, bits: Int = 48): DataFrame = {
    val width = bits / bands
    val mask = (1L << width) - 1
    sigs.select(posexplode(array((0 until bands).map(b =>
        shiftright(col(sigCol), b * width).bitwiseAND(lit(mask))): _*))
        .as(Seq("band", "bv")))
      .distinct()
  }

  /** Serve a daily batch of perceptual hashes against a persisted
    * [[hammingBandStore]]: each batch signature band-slices and
    * semi-joins the store — ANY collision marks the doc near-known
    * (the banded-hamming candidate test; the store keeps no hashes
    * to verify against, precision tuned by the band geometry — the
    * [[incrementalNear]] trade, stated for images). Returns one
    * (id, near_known) verdict per batch row; fixed-width join keys
    * only, no decode of history. */
  def hammingServeVerdicts(batchSigs: DataFrame, store: DataFrame,
                           idCol: String, sigCol: String,
                           bands: Int = 4, bits: Int = 48): DataFrame = {
    val width = bits / bands
    val mask = (1L << width) - 1
    val base = Materialize.cut(
      batchSigs.select(col(idCol).as("id"), col(sigCol).as("sig")))
    val banded = base.select(col("id"),
      posexplode(array((0 until bands).map(b =>
        shiftright(col("sig"), b * width).bitwiseAND(lit(mask))): _*))
        .as(Seq("band", "bv")))
    val hits = banded.join(store, Seq("band", "bv"), "left_semi")
      .select(col("id")).distinct()
      .withColumn("near_known", lit(true))
    base.select(col("id"))
      .join(hits, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("near_known"), lit(false)).as("near_known"))
  }

  /** Pack a [[hammingBandStore]] into a Bloom filter keyed on
    * md5(band|bv) — the broadcastable serve artifact the STREAMING
    * twin rides ([[graft.streaming.StreamOps.phashServeStream]]):
    * no false negatives by construction, maybe-hits at the filter's
    * FP rate route to the exact batch serve downstream (the
    * decontaminate_bloom prune contract, stated for images). */
  def hammingStoreBloom(store: DataFrame): Bloom.Filter =
    Bloom.build(store.select(
      md5(concat_ws("|", col("band"), col("bv"))).as("gh")), "gh")

  /** Character n-gram Jaccard near-dup pairs via gram inverted index.
    *
    * `maxGramFreq`: grams appearing in more than this many rows are
    * dropped from BOTH the index and the gram sets (the Jaccard is
    * computed over the capped sets) — stopword-grade trigrams
    * otherwise create quadratic candidate buckets. Deterministic, so
    * the oracle replicates it.
    */
  def ngramJaccard(df: DataFrame, idCol: String, textCol: String,
                   k: Int = 3, threshold: Double = 0.25,
                   maxGramFreq: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val exploded = df.select(col(idCol).as("id"),
      TextAnalysis.charGrams(col(textCol), k).as("g"))
      .filter(size(col("g")) > 0)
      .select(col("id"), explode(col("g")).as("gram"))
    // df cap and per-id recount as WINDOWS (not groupBy+join-back,
    // which re-derives the exploded subtree once per use — the a/b
    // candidate sides then multiply the scans; cf. SimilarityJoin).
    val kept = maxGramFreq match {
      case Some(cap) =>
        exploded
          .withColumn("__df", count(lit(1)).over(Window.partitionBy(col("gram"))))
          .filter(col("__df") <= cap)
          .drop("__df")
      case None => exploded
    }
    val withN = kept.withColumn("n",
      count(lit(1)).over(Window.partitionBy(col("id"))))
    val a = withN.select(col("id").as("id_a"), col("n").as("n_a"), col("gram"))
    val b = withN.select(col("id").as("id_b"), col("n").as("n_b"), col("gram"))
    a.join(b, Seq("gram"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("n_a"), col("id_b"), col("n_b"))
      .agg(count(lit(1)).as("common"))
      .withColumn("jaccard",
        col("common").cast("double") / (col("n_a") + col("n_b") - col("common")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Character n-gram CONTAINMENT pairs — the asymmetric near-dup
    * relation Jaccard misses: a short doc quoted wholesale inside a
    * long one has tiny Jaccard (the union is dominated by the long
    * doc) but containment |A∩B| / min(|A|,|B|) ≈ 1. The
    * quote/boilerplate-absorption detector of a curation run. Same
    * inverted-index plan as [[ngramJaccard]] — only the denominator
    * changes, so cost and skew behavior are identical. */
  def ngramContainment(df: DataFrame, idCol: String, textCol: String,
                       k: Int = 3, threshold: Double = 0.8,
                       maxGramFreq: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val exploded = df.select(col(idCol).as("id"),
      TextAnalysis.charGrams(col(textCol), k).as("g"))
      .filter(size(col("g")) > 0)
      .select(col("id"), explode(col("g")).as("gram"))
    val kept = maxGramFreq match {
      case Some(cap) =>
        exploded
          .withColumn("__df", count(lit(1)).over(Window.partitionBy(col("gram"))))
          .filter(col("__df") <= cap)
          .drop("__df")
      case None => exploded
    }
    val withN = kept.withColumn("n",
      count(lit(1)).over(Window.partitionBy(col("id"))))
    val a = withN.select(col("id").as("id_a"), col("n").as("n_a"), col("gram"))
    val b = withN.select(col("id").as("id_b"), col("n").as("n_b"), col("gram"))
    a.join(b, Seq("gram"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("n_a"), col("id_b"), col("n_b"))
      .agg(count(lit(1)).as("common"))
      .withColumn("containment",
        col("common").cast("double") / least(col("n_a"), col("n_b")))
      .filter(col("containment") >= threshold)
      .select(col("id_a"), col("id_b"), col("containment"))
  }

  /** Embedding-cosine near-dup pairs within equal-valued blocks: the
    * join key is `blockCol` (an LSH bucket, IVF cell, or cluster
    * label), so pair expansion is bounded by the largest block, never
    * the corpus.
    *
    * Norms are computed once per vector, not once per pair — the pair
    * stage does a single dot product. cosine = dot/(norm_a*norm_b) is
    * the identical float expression the per-pair form would produce.
    *
    * `maxBlock` is the skew guard of the other dedup families: blocks
    * larger than the cap are DROPPED before the O(block²) self-join
    * (windowed count — sorts and spills instead of materializing).
    * Recall consequence: pairs inside a flooded block are lost — the
    * deliberate trade for bounded pair expansion when one cluster
    * degenerates (a hub centroid absorbing a constant-vector flood).
    */
  def embeddingPairsBlocked(df: DataFrame, idCol: String, vecCol: String,
                            threshold: Double, blockCol: String,
                            maxBlock: Option[Int] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base0 = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      col(blockCol).as("blk"))
    val capped = maxBlock match {
      case Some(cap) =>
        base0.withColumn("__n",
            count(lit(1)).over(Window.partitionBy(col("blk"))))
          .filter(col("__n") <= cap)
          .drop("__n")
      case None => base0
    }
    val base = capped.withColumn("nrm", VectorFns.norm(col("v")))
    val a = base.select(col("blk"), col("id").as("id_a"), col("v").as("v_a"), col("nrm").as("n_a"))
    val b = base.select(col("blk"), col("id").as("id_b"), col("v").as("v_b"), col("nrm").as("n_b"))
    a.join(b, Seq("blk"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", VectorFns.dot(col("v_a"), col("v_b")) / (col("n_a") * col("n_b")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }

  /** All-pairs embedding dedup — O(n²), every row shuffles to one
    * reducer. TEST BASELINE ONLY: use [[embeddingPairsLsh]] (or
    * [[embeddingPairsBlocked]] with a real block key) on anything
    * bigger than a spec fixture. */
  def embeddingPairsBruteForce(df: DataFrame, idCol: String, vecCol: String,
                               threshold: Double): DataFrame =
    embeddingPairsBlocked(df.withColumn("__all", lit(0)), idCol, vecCol, threshold, "__all")

  /** Embedding near-dup pairs with LSH-bucketed candidate generation —
    * the 100 TB path. Each plane set yields one sign-bucketing
    * ([[Ann.lshBucket]]); a pair is a candidate when it shares a bucket
    * in ANY bucketing (the union of rotated bucketings keeps recall for
    * near pairs that straddle a single hyperplane — exact duplicates
    * collide in every bucketing). The bucket join carries only
    * (bucket, id); vectors rejoin after candidate pairs are deduped, so
    * the wide shuffle never moves embeddings. Exact cosine verification
    * runs only on candidates. Deterministic given the plane sets, so an
    * external oracle can replicate the candidate set bit-for-bit.
    */
  def embeddingPairsLsh(df: DataFrame, idCol: String, vecCol: String,
                        threshold: Double, planeSets: Seq[DataFrame]): DataFrame = {
    require(planeSets.nonEmpty, "embeddingPairsLsh needs at least one plane set")
    val base = df.select(col(idCol).as("id"), col(vecCol).as("embedding"))
    val withNorm = base.withColumn("nrm", VectorFns.norm(col("embedding")))
    val cand = planeSets.map { planes =>
      val bk = Ann.lshBucket(base, planes).select(col("bucket"), col("id"))
      bk.select(col("bucket"), col("id").as("id_a"))
        .join(bk.select(col("bucket"), col("id").as("id_b")), Seq("bucket"))
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"))
    }.reduce(_.unionByName(_)).distinct()
    cand
      .join(withNorm.select(col("id").as("id_a"), col("embedding").as("v_a"),
        col("nrm").as("n_a")), Seq("id_a"))
      .join(withNorm.select(col("id").as("id_b"), col("embedding").as("v_b"),
        col("nrm").as("n_b")), Seq("id_b"))
      .withColumn("cosine", VectorFns.dot(col("v_a"), col("v_b")) / (col("n_a") * col("n_b")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }

  /** Maximal exact shared-substring runs between documents — the
    * fingerprint-diagonal re-expression of suffix-array substring
    * dedup (the ExactSubstr shape of "Deduplicating Training Data
    * Makes Language Models Better"): every w-token sliding window is
    * hashed; two documents sharing windows at a constant position
    * difference (a DIAGONAL) share one contiguous substring, and
    * consecutive window positions on a diagonal merge into maximal
    * runs with one gaps-and-islands window — no suffix array, and
    * the shuffle carries (hash, id, pos) only, never text.
    *
    * Plan shape: explode linear in tokens → df-capped inverted index
    * (`maxWindowFreq`, the same boilerplate/skew guard as the gram
    * operators: a window in more than cap docs is boilerplate, and
    * cap bounds the pair join at cap² per hash) → hash-keyed pair
    * join → islands window keyed on (pair, diagonal).
    *
    * Returns (id_a, id_b, start_a, start_b, run_tokens) per maximal
    * run of at least `minRun` tokens; starts are 1-based token
    * positions. Chunk-dedup ([[graft.queries]] `dedup_chunks`)
    * catches aligned 10-token boilerplate; this operator catches
    * shared substrings at ANY offset and reports their exact spans —
    * the input the cut-out-the-duplicate-bytes policy needs.
    */
  def substringRuns(df: DataFrame, idCol: String, textCol: String,
                    w: Int = 8, minRun: Int = 16,
                    maxWindowFreq: Option[Long] = Some(50L)): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(w >= 2, s"window must be at least 2 tokens, got $w")
    require(minRun >= w, s"minRun ($minRun) below the window width ($w) is " +
      "unobservable — the shortest detectable run is one window")
    val wins = df.select(col(idCol).as("id"),
        TextAnalysis.wsTokens(col(textCol)).as("t"))
      .filter(size(col("t")) >= w)
      .select(col("id"), posexplode(transform(
        sequence(lit(1), size(col("t")) - (w - 1)),
        i => md5(array_join(slice(col("t"), i, lit(w)), " ")))).as(Seq("p0", "h")))
      .select(col("id"), (col("p0") + 1).as("pos"), col("h"))
    val kept = maxWindowFreq match {
      case Some(cap) =>
        wins.withColumn("__df", count(lit(1)).over(Window.partitionBy(col("h"))))
          .filter(col("__df") <= cap)
          .drop("__df")
      case None => wins
    }
    val a = kept.select(col("h"), col("id").as("id_a"), col("pos").as("pa"))
    val b = kept.select(col("h"), col("id").as("id_b"), col("pos").as("pb"))
    val islW = Window.partitionBy(col("id_a"), col("id_b"), col("diag"))
      .orderBy(col("pa"))
    a.join(b, Seq("h"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("pa"), col("pb"),
        (col("pa") - col("pb")).as("diag"))
      .withColumn("isl", col("pa") - row_number().over(islW))
      .groupBy(col("id_a"), col("id_b"), col("diag"), col("isl"))
      .agg(min(col("pa")).as("start_a"), min(col("pb")).as("start_b"),
        (count(lit(1)) + (w - 1)).as("run_tokens"))
      .filter(col("run_tokens") >= minRun)
      .select(col("id_a"), col("id_b"), col("start_a"), col("start_b"),
        col("run_tokens"))
  }

  /** Per-document (id, pos, line) view: newline-split, whitespace-
    * normalized, lowercased, empties dropped. Shared by the line-dedup
    * pair. */
  private def normalizedLines(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"),
        posexplode(split(col(textCol), "\n")).as(Seq("p0", "raw")))
      .select(col("id"), (col("p0") + 1).cast("long").as("pos"),
        lower(trim(regexp_replace(col("raw"), "\\s+", " "))).as("line"))
      .filter(length(col("line")) > 0)

  /** Cross-document duplicated-line census — the CCNet/RefinedWeb
    * paragraph-dedup primitive the chunk/substring operators don't
    * cover: boilerplate ("subscribe", nav bars, license footers)
    * repeats VERBATIM as whole lines across unrelated documents, and
    * its document frequency is the removal signal.
    *
    * Lines are normalized (lowercase, whitespace-collapsed) and
    * censused in ONE map-side-combinable aggregation keyed on the
    * line's md5 — a count_distinct(id) + count per hash, no joins, no
    * windows. At 100 TB the shuffle carries (hash, id-partials) only;
    * the line text rides in the min() agg buffer solely because the
    * report needs it — a census-only caller can drop that column and
    * shuffle pure fixed-width hashes.
    *
    * Returns lines appearing in >= minDocs distinct documents:
    * (line, n_docs, n_occ). */
  def commonLines(df: DataFrame, idCol: String, textCol: String,
                  minDocs: Long = 2L): DataFrame =
    normalizedLines(df, idCol, textCol)
      .groupBy(md5(col("line")).as("lh"))
      .agg(min(col("line")).as("line"),
        countDistinct(col("id")).as("n_docs"), count(lit(1)).as("n_occ"))
      .filter(col("n_docs") >= minDocs)
      .select(col("line"), col("n_docs"), col("n_occ"))

  /** The APPLY step of line dedup — CCNet's keep-first policy at line
    * granularity: the globally FIRST occurrence (minimal (id, pos)) of
    * every normalized line survives; every later occurrence is cut,
    * and each doc is rebuilt from its surviving lines in original
    * order.
    *
    * The first-occurrence choice is a groupBy min(struct(id, pos)) —
    * map-side combinable and skew-proof (a line duplicated across a
    * million docs folds to one row per partition), deliberately NOT a
    * row_number window, which would sort the full posting list of the
    * hottest boilerplate line in one task. The join back to mark
    * survivors is keyed on the same line hash, so AQE's skew split
    * covers the hot keys.
    *
    * Returns every doc with lines: (id, n_lines, n_kept, clean_hash);
    * clean_hash is null when nothing survives (the doc was pure
    * repeated boilerplate — same convention as [[substringApply]]). */
  def lineDedupApply(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val lines = normalizedLines(df, idCol, textCol)
      .select(col("id"), col("pos"), col("line"), md5(col("line")).as("lh"))
    val firsts = lines.groupBy(col("lh"))
      .agg(min(struct(col("id"), col("pos"))).as("f"))
      .select(col("lh"), col("f.id").as("fid"), col("f.pos").as("fpos"))
    val kept = lines.join(firsts, Seq("lh"))
      .filter(col("id") === col("fid") && col("pos") === col("fpos"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_kept"),
        md5(array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("line")))),
          t => t.getField("line")), "\n")).as("clean_hash"))
    lines.groupBy(col("id")).agg(count(lit(1)).as("n_lines"))
      .join(kept, Seq("id"), "left")
      .select(col("id"), col("n_lines"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"), col("clean_hash"))
  }

  /** The APPLY step of [[substringRuns]] — cut the duplicated bytes
    * out, lower id keeps (the ExactSubstr removal policy at document
    * granularity): every b-side span of every reported run marks its
    * token positions covered; a doc's cleaned form is its uncovered
    * tokens in original order. Exact copies lose everything
    * (clean_hash null, n_kept 0 — subsuming pairwise dedup_apply);
    * partially-overlapping docs keep exactly their novel tokens.
    *
    * Position coverage is one explode of the run spans (linear in
    * covered tokens) + a distinct + an anti join on (id, pos) — no
    * per-doc loops, and the rebuild is one collect_list per affected
    * doc. Returns every doc with tokens: (id, n_tok, n_kept,
    * clean_hash). */
  def substringApply(df: DataFrame, idCol: String, textCol: String,
                     w: Int = 8, minRun: Int = 16,
                     maxWindowFreq: Option[Long] = Some(50L)): DataFrame = {
    val runs = substringRuns(df, idCol, textCol, w, minRun, maxWindowFreq)
    val toks = df.select(col(idCol).as("id"),
        posexplode(TextAnalysis.wsTokens(col(textCol))).as(Seq("p0", "tok")))
      .select(col("id"), (col("p0") + 1).cast("long").as("pos"), col("tok"))
    val covered = runs.select(col("id_b").as("id"),
        explode(sequence(col("start_b").cast("long"),
          col("start_b") + col("run_tokens") - 1)).as("pos"))
      .distinct()
    val kept = toks.join(covered, Seq("id", "pos"), "left_anti")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_kept"),
        md5(array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          t => t.getField("tok")), " ")).as("clean_hash"))
    toks.groupBy(col("id")).agg(count(lit(1)).as("n_tok"))
      .join(kept, Seq("id"), "left")
      .select(col("id"), col("n_tok"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"), col("clean_hash"))
  }

  /** MinHash BANDING AUTO-TUNER (round 14, VERDICT r13 #9 stretch) —
    * the closed-form (b, r) ↔ threshold algebra that makes the dedup
    * family self-configuring: for every divisor pair b·r = numHashes,
    * the LSH S-curve P(candidate | jaccard s) = 1 − (1 − s^r)^b is
    * evaluated on a fixed `grid`-point midpoint lattice, and the plan
    * reports
    *   s50          — the curve's 0.5-crossing at grid resolution
    *                  (exactly (1 − 2^(−1/b))^(1/r); the textbook
    *                  "threshold" (1/b)^(1/r) is the ~0.632-crossing),
    *   fp_mass      — ∫₀ᵗ P(s) ds, the uniform-prior false-positive
    *                  mass below the target threshold t,
    *   fn_mass      — ∫ₜ¹ (1 − P(s)) ds, the missed-pair mass above,
    *   exp_fp_pairs — fp_mass × n(n−1)/2 for the given corpus size,
    *   rank         — 1 = the (b, r) minimizing fp_mass + fn_mass
    *                  (bands ascending on ties).
    * dedup_rate_curve measures this dial empirically; this emits it
    * analytically. Engine-exactness discipline: powers are UNROLLED
    * repeated multiplication (never libm pow — integer-exponent
    * correct-rounding is not portable), grid points are exact IEEE
    * divisions, and the mass sums fold 8-dp-rounded contributions in
    * sorted order (the bm25 convention). Everything runs on a
    * |divisors|×grid frame — driver-trivial, but computed IN-ENGINE
    * so the DuckDB oracle replays it as real arithmetic. */
  def bandPlan(spark: org.apache.spark.sql.SparkSession, numHashes: Int,
               targetT: Double, nDocs: DataFrame,
               grid: Int = 100): DataFrame = {
    import org.apache.spark.sql.Column
    import org.apache.spark.sql.expressions.Window
    require(numHashes >= 1, s"numHashes must be positive, got $numHashes")
    require(targetT > 0 && targetT < 1, s"target in (0,1), got $targetT")
    val pairs = (1 to numHashes)
      .filter(numHashes % _ == 0).map(r => (numHashes / r, r))
    val g = spark.range(grid).select(
      ((col("id") * 2 + 1).cast("double") / lit(2.0 * grid)).as("s"))
    def unrollPow(base: Column, e: Int): Column =
      (1 until e).foldLeft(base)((acc, _) => acc * base)
    val curve = pairs.map { case (b, r) =>
      val q = lit(1.0) - unrollPow(col("s"), r)
      val p = lit(1.0) - unrollPow(q, b)
      g.select(lit(b).as("bands"), lit(r).as("rows_per_band"),
        col("s"), p.as("p"))
    }.reduce(_ unionByName _)
    def sortedSum(c: Column): Column =
      aggregate(sort_array(collect_list(c)), lit(0.0), _ + _)
    val perPlan = curve.groupBy(col("bands"), col("rows_per_band"))
      .agg(
        // 0.5-crossing at grid resolution; a plan whose crossing sits
        // past the top midpoint (e.g. b=1 at large numHashes) clamps
        // to that midpoint instead of emitting a silent NULL
        coalesce(min(when(col("p") >= 0.5, col("s"))),
          lit(2.0 * grid - 1) / lit(2.0 * grid)).as("s50"),
        graft.functions.PRound.pround(sortedSum(
          graft.functions.PRound.pround(
            when(col("s") < targetT, col("p")).otherwise(lit(0.0)), 8))
          / grid, 6).as("fp_mass"),
        graft.functions.PRound.pround(sortedSum(
          graft.functions.PRound.pround(
            when(col("s") >= targetT, lit(1.0) - col("p"))
              .otherwise(lit(0.0)), 8)) / grid, 6).as("fn_mass"))
    val w = Window.orderBy(
      (col("fp_mass") + col("fn_mass")).asc, col("bands").asc)
    perPlan.crossJoin(broadcast(nDocs))
      .select(col("bands"), col("rows_per_band"), col("s50"),
        col("fp_mass"), col("fn_mass"),
        graft.functions.PRound.pround(col("fp_mass") *
          (col("n_docs").cast("double") * (col("n_docs") - 1) / 2.0), 2)
          .as("exp_fp_pairs"),
        row_number().over(w).cast("int").as("rank"))
  }
}
