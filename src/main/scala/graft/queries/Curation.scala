package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{Bpe, PRound, TextAnalysis}
import graft.operators.{BradleyTerry, Chunker, FlacCodec, KneserNey, Materialize, Multimodal, NaiveBayes, Packing, Sampling, UnigramLm, WavCodec}

/** Block L — corpus curation at training time: sequence packing,
  * mixture resampling, Gopher-style quality gates, chunk-level
  * boilerplate dedup, and real image-header decoding. These are the
  * steps between "a deduplicated corpus" (block H) and "tensors in a
  * data loader".
  */
object Curation {

  private val weights = Map(
    "en" -> 3000, "de" -> 10000, "zh" -> 8000, "fr" -> 5000, "es" -> 2000)

  /** (doc_id, w) word occurrences — the corpus side of the BPE pair. */
  private def bpeWords(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(col("doc_id"),
      explode(TextAnalysis.wsTokens(TextAnalysis.canonicalize(col("text"))))
        .as("w"))

  /** The shared BPE learn chain of `bpe_apply`/`bpe_merges` (and,
    * with byte tokens, `bpe_bytes_train`/`_apply`): 3 iterations of
    * census → top merge → fold over the CHECKPOINTED word-frequency
    * vocabulary (see the bpe_apply query doc). Returns (final vocab
    * (w, freq, t), per-iteration 1-row merge frames (x, y, cnt)). */
  private def bpeLearnChain(words: DataFrame, tok: Column => Column)
      : (DataFrame, Seq[DataFrame]) = {
    def topMerge(vocab: DataFrame): DataFrame =
      vocab.filter(size(col("t")) >= 2)
        .select(col("freq"),
          explode(transform(sequence(lit(1), size(col("t")) - 1),
            i => struct(element_at(col("t"), i).as("x"),
              element_at(col("t"), i + lit(1)).as("y")))).as("p"))
        .groupBy(col("p.x").as("x"), col("p.y").as("y"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("x"), col("y"))
        .limit(1)
    val vocab0 = Materialize.cut(words.groupBy(col("w"))
      .agg(count(lit(1)).as("freq"))
      .select(col("w"), col("freq"), tok(col("w")).as("t")))
    val merges = Seq.newBuilder[DataFrame]
    val merged = (1 to 3).foldLeft(vocab0) { (cur, _) =>
      val m = Materialize.cut(topMerge(cur))
      merges += m
      Materialize.cut(cur.crossJoin(broadcast(m))
        .select(col("w"), col("freq"),
          Bpe.applyMergeTokens(col("t"), col("x"), col("y")).as("t")))
    }
    (merged, merges.result())
  }

  private def bpeLearned(s: SparkSession, dir: String)
      : (DataFrame, Seq[DataFrame]) =
    bpeLearnChain(bpeWords(s, dir).select(col("w")), Bpe.charTokens)

  /** The byte-level word stream (VERDICT r14 #6): RAW whitespace
    * tokens — no canonicalization, byte BPE owns every byte — plus a
    * planted multi-byte word per doc (" naïve中文tör" + doc_id%3:
    * 2- and 3-byte UTF-8 sequences flow through the census in-engine,
    * not just in the spec; the mojibake-fixture discipline). */
  private def byteBpeWords(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(col("doc_id"),
      explode(TextAnalysis.wsTokens(concat(col("text"),
        lit(" naïve中文tör"), (col("doc_id") % 3).cast("string")))).as("w"))

  private def bpeBytesLearned(s: SparkSession, dir: String)
      : (DataFrame, Seq[DataFrame]) =
    bpeLearnChain(byteBpeWords(s, dir).select(col("w")), Bpe.byteTokens)

  /** Shared unigram-LM census: the canonicalized word-frequency table
    * both unigram queries train over (same canon as the BPE family). */
  private def unigramCensus(s: SparkSession, dir: String): DataFrame =
    Materialize.cut(bpeWords(s, dir)
      .groupBy(col("w")).agg(count(lit(1)).as("freq")))

  /** Planted boilerplate suffix for the CDC-dedup pair: every
    * doc_id%5 doc carries the SAME ~200-char footer, so the
    * content-defined chunks inside it align across docs while each
    * doc's unique prefix keeps fixed-width grids misaligned — the
    * exact failure mode CDC exists to beat. ASCII, quote-free (it is
    * embedded verbatim in the DuckDB oracle SQL). */
  private[queries] val cdcBoiler: String =
    " Subscribe to our newsletter for weekly updates. All rights " +
      "reserved worldwide. Terms of service and privacy policy apply " +
      "to all visitors. Contact the support desk for assistance with " +
      "your account today."

  private def cdcDocs(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(col("doc_id"),
      when(col("doc_id") % 5 === 0, concat(col("text"), lit(cdcBoiler)))
        .otherwise(col("text")).as("text"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Unigram-LM (SentencePiece-style) TRAINER — the other tokenizer
    // next to the BPE family (VERDICT r11 #4): substring-seeded vocab
    // (all chars + top-24 multi-char pieces), two hard-EM rounds
    // (Viterbi E-step over the census, count M-step with char
    // add-one floor). Costs are integer micro-nats, so the EM
    // trajectory is engine-exact and the unrolled MATERIALIZED-CTE
    // oracle replays it bit-for-bit (operators.UnigramLm).
    "unigram_train" -> { (s, dir) =>
      UnigramLm.train(unigramCensus(s, dir), topMulti = 24, rounds = 2)
        .orderBy(col("cnt").desc, col("piece"))
    },

    // The trained model APPLIED: Viterbi segmentation of every census
    // word under the final piece costs — (segmentation, piece count,
    // integer path score). Corpus-scale tokenization is this table
    // broadcast-joined to the word stream (the bpe_apply topology);
    // the per-word DP is two codegen'd folds, no UDF.
    "unigram_apply" -> { (s, dir) =>
      val census = unigramCensus(s, dir)
      val trained = UnigramLm.train(census, topMulti = 24, rounds = 2)
      UnigramLm.segment(census, trained)
        .select(col("w"), col("freq"), array_join(col("seg"), " ").as("seg"),
          col("n_pieces"), col("score"))
        .orderBy(col("w"))
    },

    // unigram_apply's SERVE topology (the quality_nb_stored /
    // lm_kn_stored story on the tokenizer): the trained (piece, cost)
    // table is a store artifact — run the two-round hard-EM AT MOST
    // ONCE per dataset generation into the content-keyed DatasetCache
    // (geometry — top-24 multi pieces, 2 rounds — in the artifact
    // name) and serve every tokenization run from the stored parquet.
    // The serve plan carries ZERO EM rounds (two parquet scans: the
    // census side and the vocabulary-sized cost table, broadcast);
    // stored costs are bit-identical to the fresh build, so the
    // shared unigram_apply oracle proves serve ≡ build. At 100 TB
    // this is the only sane topology: tokenizer training is a nightly
    // census-bounded job, tokenization a map-side broadcast everywhere.
    "unigram_stored" -> { (s, dir) =>
      val store = graft.sources.DatasetCache.getOrBuild(
          dir, Seq("documents.parquet"), "unigram_top24_r2") { path =>
        UnigramLm.train(unigramCensus(s, dir), topMulti = 24, rounds = 2)
          .write.mode("overwrite").parquet(s"$path/pieces")
      }
      val costs = s.read.parquet(s"$store/pieces")
      UnigramLm.segment(unigramCensus(s, dir), costs)
        .select(col("w"), col("freq"), array_join(col("seg"), " ").as("seg"),
          col("n_pieces"), col("score"))
        .orderBy(col("w"))
    },

    // Context-window packing: docs are packed per language in doc_id
    // order into 256-token bins (bin = start offset div budget — a
    // window cumsum, one shuffle on the stratum key, no global sort).
    "pack_sequences" -> { (s, dir) =>
      val d = Tables.documents(s, dir).select(col("doc_id"), col("lang"),
        TextAnalysis.tokenCount(col("text")).as("n_tok"))
      Packing.binStats(d, Seq("lang"), "doc_id", "n_tok", budget = 256)
        .select(col("lang"), col("bin"), col("n_docs"), col("total_size"),
          PRound.pround(col("fill_ratio"), 4).as("fill_ratio"))
        .orderBy(col("lang"), col("bin"))
    },

    // Training-mixture resampling: per-language keep rates (the
    // temperature-/weight-mixing shape), deterministic by doc hash —
    // membership survives reruns and repartitioning.
    "sample_weighted" -> { (s, dir) =>
      Sampling.weighted(Tables.documents(s, dir), "doc_id", "lang", weights)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
        .orderBy(col("lang"))
    },

    // Data-DERIVED mixture resampling — sample_weighted's rates are a
    // static config map; real mixture balancing derives them from the
    // data: downsample every source to the smallest source's token
    // count (rate = floor(1e4·T_min/T_s) permyriad), then the same
    // deterministic md5-slot membership. Scale shape: one token agg
    // (map-side combined), a |sources|-row broadcast of the derived
    // rates, and a map-side filter — no extra shuffle over the docs.
    "mix_resample" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val d = Tables.documents(s, dir).select(col("doc_id"), col("source"),
        TextAnalysis.tokenCount(col("text")).as("n_tok"))
      // T_min as an unbounded window on the |sources|-row agg — a
      // separate .agg(min) would re-derive the whole token scan
      val totW = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      val rates = d.groupBy(col("source")).agg(sum(col("n_tok")).as("ts"))
        .withColumn("tmin", min(col("ts")).over(totW))
        .select(col("source"),
          floor(col("tmin").cast("double") / col("ts").cast("double") * lit(10000.0))
            .as("pm"))
      d.join(broadcast(rates), Seq("source"))
        .filter(Sampling.dynamicPred(col("doc_id"), col("pm")))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs_kept"), sum(col("n_tok")).as("tokens_kept"))
        .orderBy(col("source"))
    },

    // One BPE merge-candidate census — the first iteration of vocab
    // induction: adjacent character-pair counts inside canonicalized
    // words, global top-20. The explode is linear in corpus chars and
    // collapses map-side into ≤ |alphabet|² keys; the final top-k is
    // TakeOrderedAndProject (per-partition heads + merge), never a
    // full sort.
    "bpe_pairs" -> { (s, dir) =>
      val words = Tables.documents(s, dir)
        .select(explode(TextAnalysis.wsTokens(
          TextAnalysis.canonicalize(col("text")))).as("w"))
        .filter(length(col("w")) >= 2)
      words
        .select(explode(expr(
          "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")).as("pair"))
        .groupBy(col("pair")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("pair"))
        .limit(20)
    },

    // BPE APPLY — the step bpe_pairs feeds: learn 3 merges (each
    // iteration re-censuses adjacent token pairs and takes the top by
    // count, (x,y) tie-break) and REPLAY them over the corpus,
    // producing exact per-doc token counts — the real input
    // pack_sequences wants (today it packs on whitespace counts).
    // Structured as a textbook BPE trainer: the fold and censuses run
    // over the WORD-FREQUENCY VOCABULARY (counts weighted by freq are
    // identical to occurrence-level counts, so the occurrence-level
    // oracle still matches bit-for-bit), eagerly checkpointed per
    // iteration so no census replays earlier folds — the corpus is
    // scanned exactly twice (vocab build + final per-doc join), and
    // iteration cost is O(vocabulary), not O(corpus): measured
    // 11.9 s → ~1 s at sf0.1. Each application is one codegen'd fold
    // (Bpe.applyMerge) and each learned merge stays distributed as a
    // broadcast 1-row frame — nothing round-trips the driver. The
    // per-word token counts rejoin broadcast here; at a 100M-row
    // vocabulary that join becomes a plain shuffle join on the word.
    "bpe_apply" -> { (s, dir) =>
      val (merged, _) = bpeLearned(s, dir)
      val words = bpeWords(s, dir)
      val perWord = merged.select(col("w"), size(col("t")).as("n_tok_w"))
      words.join(broadcast(perWord), Seq("w"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_words"),
          sum(col("n_tok_w")).cast("long").as("n_tok"),
          sum(length(col("w"))).as("n_chars"))
        .select(col("doc_id"), col("n_words"), col("n_tok"),
          PRound.pround(
            col("n_tok").cast("double") / col("n_chars").cast("double"), 6)
            .as("compression"))
        .orderBy(col("doc_id"))
    },

    // Packing on EXACT tokenizer counts — the composition bpe_apply
    // exists to feed: per-doc learned-BPE token counts (not the
    // whitespace proxy pack_sequences bins on) drive the same
    // per-language window-cumsum binning. Same learn chain (shared,
    // checkpointed); docs that canonicalize to nothing tokenize to 0
    // and still pack (left join + coalesce). At 100 TB the learned
    // per-word sizes are a |vocab|-row broadcast against the word
    // stream — the corpus never re-tokenizes for packing.
    "pack_bpe" -> { (s, dir) =>
      val (merged, _) = bpeLearned(s, dir)
      val perWord = merged.select(col("w"), size(col("t")).as("n_tok_w"))
      val counts = bpeWords(s, dir).join(broadcast(perWord), Seq("w"))
        .groupBy(col("doc_id"))
        .agg(sum(col("n_tok_w")).cast("long").as("n_tok"))
      val d = Tables.documents(s, dir).select(col("doc_id"), col("lang"))
        .join(counts, Seq("doc_id"), "left")
        .withColumn("n_tok", coalesce(col("n_tok"), lit(0L)))
      Packing.binStats(d, Seq("lang"), "doc_id", "n_tok", budget = 256)
        .select(col("lang"), col("bin"), col("n_docs"), col("total_size"),
          PRound.pround(col("fill_ratio"), 4).as("fill_ratio"))
        .orderBy(col("lang"), col("bin"))
    },

    // The learned merge LIST itself — the artifact a production
    // tokenizer-training run persists and ships (bpe_apply shows its
    // effect; this shows the merges, with the census count that
    // elected each). Same shared learn chain.
    "bpe_merges" -> { (s, dir) =>
      val (_, merges) = bpeLearned(s, dir)
      merges.zipWithIndex
        .map { case (m, i) => m.select(lit(i + 1).as("iter"),
          col("x"), col("y"), col("cnt")) }
        .reduce(_ unionByName _)
        .orderBy(col("iter"))
    },

    // BYTE-level BPE trainer (VERDICT r14 #6 — production tokenizers
    // are byte-level, GPT-2 style): the same census → top merge → fold
    // chain as bpe_merges but over UTF-8 BYTE tokens (2-hex-char
    // codes, Bpe.byteTokens), on RAW whitespace words — no
    // canonicalization, byte BPE owns every byte and has NO
    // unknown-token path by construction. The planted multi-byte word
    // (byteBpeWords) pushes 2- and 3-byte UTF-8 sequences through the
    // census in-engine. Training cost is O(vocabulary) per iteration,
    // exactly the char-BPE scale shape.
    "bpe_bytes_train" -> { (s, dir) =>
      val (_, merges) = bpeBytesLearned(s, dir)
      merges.zipWithIndex
        .map { case (m, i) => m.select(lit(i + 1).as("iter"),
          col("x"), col("y"), col("cnt")) }
        .reduce(_ unionByName _)
        .orderBy(col("iter"))
    },

    // Byte-BPE APPLY — per-doc exact token counts under the learned
    // byte merges, with compression = tokens per UTF-8 BYTE (the
    // byte-level fertility dial). Same broadcast per-word-size rejoin
    // as bpe_apply: the corpus never re-tokenizes.
    "bpe_bytes_apply" -> { (s, dir) =>
      val (merged, _) = bpeBytesLearned(s, dir)
      val perWord = merged.select(col("w"), size(col("t")).as("n_tok_w"))
      byteBpeWords(s, dir).join(broadcast(perWord), Seq("w"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_words"),
          sum(col("n_tok_w")).cast("long").as("n_tok"),
          sum(expr("octet_length(w)")).cast("long").as("n_bytes"))
        .select(col("doc_id"), col("n_words"), col("n_tok"), col("n_bytes"),
          PRound.pround(
            col("n_tok").cast("double") / col("n_bytes").cast("double"), 6)
            .as("compression"))
        .orderBy(col("doc_id"))
    },

    // Vocabulary coverage / OOV rate — the tokenizer-health dial: what
    // fraction of corpus token occurrences a top-k word vocabulary
    // covers. The honest 2-pass at scale: pass 1 takes the vocabulary
    // via TakeOrderedAndProject over the term-frequency agg, pass 2
    // rejoins it broadcast and aggregates coverage — no global sort of
    // the vocabulary table.
    "vocab_coverage" -> { (s, dir) =>
      def tf = Tables.documents(s, dir)
        .select(explode(TextAnalysis.wsTokens(
          TextAnalysis.canonicalize(col("text")))).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      val vocab = tf.orderBy(col("cnt").desc, col("w")).limit(10)
        .select(col("w"), lit(1).as("in_vocab"))
      tf.join(broadcast(vocab), Seq("w"), "left")
        .agg(sum(col("cnt")).as("total_tokens"),
          sum(when(col("in_vocab") === 1, col("cnt")).otherwise(lit(0L)))
            .as("covered_tokens"))
        .select(col("total_tokens"), col("covered_tokens"),
          PRound.pround(lit(1.0) -
            col("covered_tokens").cast("double") / col("total_tokens").cast("double"),
            6).as("oov_rate"))
    },

    // Gopher-style quality gates: word count, mean word length,
    // type-token ratio, stopword presence — per-doc metrics plus the
    // combined pass flag (the corpus-filter step of a curation run).
    "text_gopher_quality" -> { (s, dir) =>
      val toks = TextAnalysis.wsTokens(col("text"))
      val nWords = size(toks)
      val nChars = length(regexp_replace(col("text"), "\\s", ""))
      val mean = nChars.cast("double") / nWords
      val ttr = size(array_distinct(toks)).cast("double") / nWords
      val hasStop = array_contains(toks, "the") || array_contains(toks, "a")
      Tables.documents(s, dir)
        .filter(nWords > 0)
        .select(col("doc_id"), nWords.as("n_words"),
          PRound.pround(mean, 4).as("mean_word_len"),
          PRound.pround(ttr, 4).as("type_token_ratio"),
          hasStop.as("has_stopword"),
          TextAnalysis.gopherPass(col("text")).as("pass"))
        .orderBy(col("doc_id"))
    },

    // Gopher's REPETITION signals — the other half of its quality
    // suite (text_gopher_quality covers the length/lexical gates):
    // duplicate-word fraction and the most-frequent-bigram fraction
    // (the paper's top-2-gram rule at word granularity — these docs
    // have no line structure). The top-bigram count is the longest
    // equal run in the SORTED per-row bigram array — a per-row
    // array_sort + fold, so the whole query is map-side (zero
    // exchanges before the final presentation sort); the earlier
    // explode + two-level groupBy shuffled every bigram string.
    "text_repetition" -> { (s, dir) =>
      val toks = Tables.documents(s, dir)
        .select(col("doc_id").as("id"),
          TextAnalysis.wsTokens(col("text")).as("t"))
        .filter(size(col("t")) >= 2)
      toks
        .select(col("id"), size(col("t")).as("n_words"),
          size(array_distinct(col("t"))).as("n_distinct"),
          expr("""aggregate(
                    array_sort(transform(sequence(0, size(t) - 2),
                      i -> concat_ws(' ', t[i], t[i+1]))),
                    named_struct('prev', cast(null as string),
                                 'run', 0, 'best', 0),
                    (a, x) -> named_struct(
                      'prev', x,
                      'run',  if(a.prev <=> x, a.run + 1, 1),
                      'best', greatest(a.best,
                                       if(a.prev <=> x, a.run + 1, 1))),
                    a -> a.best)""").as("top"),
          (size(col("t")) - 1).as("tot"))
        .select(col("id"), col("n_words"),
          PRound.pround((col("n_words") - col("n_distinct")).cast("double")
            / col("n_words"), 6).as("dup_word_frac"),
          PRound.pround(col("top").cast("double") / col("tot"), 6)
            .as("top_bigram_frac"),
          (col("top").cast("double") / col("tot") <= 0.2).as("rep_pass"))
        .orderBy(col("id"))
    },

    // Chunk-level boilerplate dedup (the line-dedup shape of
    // CCNet/RefinedWeb at 10-token granularity): repeated chunks
    // across the planted corpus, keyed by md5 — shuffle carries only
    // (hash, id), never text.
    "dedup_chunks" -> { (s, dir) =>
      val toks = TextAnalysis.wsTokens(col("text"))
      // ceil(n/10) via double division — exact here (array sizes are
      // ints, far below double's 2^53 integer range; cf. the integer
      // `div` rule for offsets that can exceed it)
      val nChunks = ((size(toks) + 9) / 10).cast("int")
      val chunks = transform(sequence(lit(0), nChunks - 1),
        i => array_join(slice(toks, i * 10 + 1, lit(10)), " "))
      Corpus.plantedDocs(s, dir)
        .filter(size(toks) > 0)
        .select(col("id"), explode(chunks).as("chunk"))
        .select(col("id"), md5(col("chunk")).as("chunk_hash"))
        .groupBy(col("chunk_hash"))
        .agg(count(lit(1)).as("n_occ"), countDistinct(col("id")).as("n_docs"),
          min(col("id")).as("keep_doc"))
        .filter(col("n_occ") > 1)
        .orderBy(col("chunk_hash"))
    },

    // Boilerplate REMOVAL (the apply step of dedup_chunks): keep each
    // chunk's first occurrence (by id, then position) and rebuild the
    // cleaned documents — planted exact copies lose every chunk and
    // vanish; partially-overlapping docs keep their novel chunks.
    "dedup_chunks_apply" -> { (s, dir) =>
      val toks = TextAnalysis.wsTokens(col("text"))
      val nChunks = ((size(toks) + 9) / 10).cast("int")
      val chunks = transform(sequence(lit(0), nChunks - 1),
        i => array_join(slice(toks, i * 10 + 1, lit(10)), " "))
      val ch = Corpus.plantedDocs(s, dir)
        .filter(size(toks) > 0)
        .select(col("id"), posexplode(chunks).as(Seq("pos", "chunk")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(md5(col("chunk"))).orderBy(col("id"), col("pos"))
      val kept = ch.withColumn("__rk", row_number().over(w))
        .filter(col("__rk") === 1)
      val tot = ch.groupBy(col("id")).agg(count(lit(1)).as("n_chunks"))
      kept.groupBy(col("id"))
        .agg(md5(array_join(transform(
            array_sort(collect_list(struct(col("pos"), col("chunk")))),
            x => x.getField("chunk")), " ")).as("clean_hash"),
          count(lit(1)).as("n_kept"))
        .join(tot, Seq("id"))
        .select(col("id"), col("clean_hash"), col("n_kept"), col("n_chunks"))
        .orderBy(col("id"))
    },

    // CONTENT-DEFINED chunk dedup census (the storage-dedup /
    // boilerplate lens dedup_chunks' fixed positional grid cannot
    // give): Chunker.cdcChunks cuts where a rolling window hash hits
    // 0 mod 64, so boundaries re-synchronize after an edit and a
    // shared tail (the planted doc_id%5 boilerplate suffix) produces
    // IDENTICAL chunks across docs regardless of how long each doc's
    // unique prefix is — fixed-width chunking would misalign every
    // one of them. Census = chunks seen in ≥2 docs; one chunk-hash
    // groupBy (fixed-width keys, never text on the wire at the agg).
    "dedup_cdc" -> { (s, dir) =>
      Chunker.cdcChunks(cdcDocs(s, dir), "doc_id", "text")
        .groupBy(col("chunk_hash"))
        .agg(min(col("chunk_len")).as("chunk_len"),
          countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_occ"))
        .filter(col("n_docs") >= 2)
        .orderBy(col("chunk_hash"))
    },

    // INCREMENTAL CDC dedup — the daily-batch topology
    // (dedup_incremental's story at chunk level): yesterday's chunk
    // census is a store artifact (DatasetCache, built at most once
    // per dataset generation); today's batch chunks row-locally and
    // probes the store with one hash equi-join — no re-scan of the
    // accumulated corpus, ever. A doc whose chunks are mostly already
    // known is boilerplate/duplication against the whole history, the
    // signal a rolling crawl dedups on. Nightly maintenance is
    // "append today's chunk hashes" — the census only grows by the
    // day's novel chunks.
    "dedup_cdc_incremental" -> { (s, dir) =>
      val all = cdcDocs(s, dir)
      val store = graft.sources.DatasetCache.getOrBuild(
          dir, Seq("documents.parquet"), "cdc_chunkstore_w8m64") { path =>
        Chunker.cdcChunks(all.filter(col("doc_id") % 2 === 0),
            "doc_id", "text")
          .select(col("chunk_hash")).distinct()
          .write.mode("overwrite").parquet(s"$path/chunks")
      }
      val known = s.read.parquet(s"$store/chunks")
        .withColumn("known", lit(1L))
      Chunker.cdcChunks(all.filter(col("doc_id") % 2 === 1), "doc_id", "text")
        .join(known, Seq("chunk_hash"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_chunks"), count(col("known")).as("n_known"))
        .select(col("doc_id"), col("n_chunks"), col("n_known"),
          PRound.pround(col("n_known").cast("double") / col("n_chunks"), 4)
            .as("known_ratio"),
          (col("n_known") * 2 >= col("n_chunks")).cast("long").as("is_dup"))
        .orderBy(col("doc_id"))
    },

    // The apply side: per-doc duplication report under CDC chunking —
    // how many of a doc's chunks (and chars) are shared with some
    // other doc. The chunk frame is cut once (census + join-back fan
    // out of it); the shared set joins back on the hash key.
    "dedup_cdc_apply" -> { (s, dir) =>
      val ch = Materialize.cut(
        Chunker.cdcChunks(cdcDocs(s, dir), "doc_id", "text")
          .select(col("doc_id"), col("chunk_hash"), col("chunk_len")))
      val shared = ch.groupBy(col("chunk_hash"))
        .agg(countDistinct(col("doc_id")).as("nd"))
        .filter(col("nd") >= 2)
        .select(col("chunk_hash"), lit(1L).as("dup"))
      ch.join(shared, Seq("chunk_hash"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_chunks"),
          count(col("dup")).as("n_dup_chunks"),
          coalesce(sum(when(col("dup").isNotNull, col("chunk_len"))), lit(0L))
            .as("dup_chars"),
          sum(col("chunk_len")).as("total_chars"))
        .select(col("doc_id"), col("n_chunks"), col("n_dup_chunks"),
          col("dup_chars"),
          PRound.pround(col("dup_chars").cast("double") / col("total_chars"), 6)
            .as("dup_ratio"))
        .orderBy(col("doc_id"))
    },

    // Token-budget RAG chunking with overlap (VERDICT r10 #4): every
    // document splits into ≤32-token windows overlapping by 8 tokens
    // (stride 24), final runt kept — the produce-side sibling of
    // pack_sequences that every retrieval-corpus build runs before
    // embedding. Entirely row-local positional slicing (zero shuffles
    // beyond the presentation sort); geometry is deterministic, so an
    // incremental re-chunk reproduces old chunk ids/hashes exactly.
    "text_chunk" -> { (s, dir) =>
      Chunker.tokenChunks(Tables.documents(s, dir), "doc_id", "text",
          budget = 32, overlap = 8)
        .orderBy(col("doc_id"), col("chunk_id"))
    },

    // Corpus report: per-language doc counts, char/token volume, and
    // exact length percentiles — the summary a curation run publishes.
    // Mean is sum/count (exact integer sum, one deterministic
    // division), never avg() whose partial-aggregation order differs
    // across engines.
    "corpus_stats" -> { (s, dir) =>
      val toks = TextAnalysis.tokenCount(col("text"))
      Tables.documents(s, dir)
        .select(col("lang"), col("n_chars"), toks.as("n_tok"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"),
          sum(col("n_tok")).as("total_tokens"),
          PRound.pround(sum(col("n_chars")).cast("double") / count(lit(1)), 4)
            .as("mean_chars"),
          PRound.pround(expr("percentile(n_chars, 0.5)"), 4).as("p50_chars"),
          PRound.pround(expr("percentile(n_chars, 0.95)"), 4).as("p95_chars"))
        .orderBy(col("lang"))
    },

    // Gini coefficient of per-doc token counts per language — the
    // corpus-inequality dial next to corpus_stats' moments (a corpus
    // where 1% of docs carry half the tokens trains differently from
    // a uniform one at the same mean). Rank formula over the sorted
    // counts: G = 2·Σ i·xᵢ / (n·Σx) − (n+1)/n — Σ i·xᵢ is EXACT
    // integer arithmetic and invariant to tie order (equal x swap
    // freely), so the only doubles are the two final divisions. The
    // per-lang window shuffle carries (lang, x) only.
    "corpus_gini" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("x"), col("doc_id"))
      Tables.documents(s, dir)
        .select(col("lang"), col("doc_id"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("x"))
        .withColumn("rk", row_number().over(w))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("x")).as("tot_tokens"),
          sum(col("rk") * col("x")).as("s1"))
        .select(col("lang"), col("n_docs"), col("tot_tokens"),
          PRound.pround(
            lit(2.0) * col("s1") /
              (col("n_docs").cast("double") * col("tot_tokens"))
              - (col("n_docs") + lit(1.0)) / col("n_docs"), 6).as("gini"))
        .orderBy(col("lang"))
    },

    // Population Stability Index over the 256 hashed-unigram buckets
    // (the model-monitoring drift score beside stats_drift's KL
    // top-terms): PSI = Σ_b (p_a − p_b)·ln(p_a/p_b) between the two
    // doc_id-parity corpus halves. The FIXED 256-bucket space (the
    // DSIR trick) is what makes the metric scale-proof — vocabulary
    // growth cannot widen the sum — and the 6-dp contributions fold
    // over a value-sorted list (the bm25 discipline), so the one
    // float sum is order-deterministic in any engine.
    "stats_psi" -> { (s, dir) =>
      val occ = Tables.documents(s, dir)
        .select((col("doc_id") % 2).as("b"),
          explode(TextAnalysis.wsTokens(
            TextAnalysis.canonicalize(col("text")))).as("w"))
        .select(col("b"), dsirBucket(col("w")).as("bucket"))
      val census = occ.groupBy(col("bucket"))
        .agg(sum(when(col("b") === 0, 1L).otherwise(0L)).as("ca"),
          sum(when(col("b") === 1, 1L).otherwise(0L)).as("cb"))
      val tots = census.agg(sum(col("ca")).as("ta"), sum(col("cb")).as("tb"))
      census.crossJoin(broadcast(tots))
        .filter(col("ca") > 0 && col("cb") > 0)
        .select(PRound.pround(
          (col("ca") / col("ta") - col("cb") / col("tb")) *
            log((col("ca") / col("ta")) / (col("cb") / col("tb"))), 6)
          .as("c"))
        .agg(count(lit(1)).as("n_buckets"),
          sort_array(collect_list(col("c"))).as("l"))
        .select(col("n_buckets"),
          PRound.pround(aggregate(col("l"), lit(0.0), (a, x) => a + x), 6)
            .as("psi"))
    },

    // Deterministic digit-bin histogram (decimal-log scale via string
    // length — pure integer/string arithmetic, engine-portable unlike
    // floor(log10(x)) at power boundaries): a mergeable distribution
    // sketch for corpus reports.
    "sketch_histogram" -> { (s, dir) =>
      Tables.documents(s, dir)
        .groupBy(col("lang"), length(col("n_chars").cast("string")).as("bin"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("n_chars")).as("bin_min"), max(col("n_chars")).as("bin_max"))
        .orderBy(col("lang"), col("bin"))
    },

    // Real multimodal decode under the oracle gate: synthesize valid
    // PNG headers (signature + IHDR) from each doc's id, then parse
    // the dimensions BACK with the pure-Column header reader — the
    // byte arithmetic is genuinely exercised; only the pixel data is
    // absent, exactly as in the class-doc stub contract.
    "mm_image_dims" -> { (s, dir) =>
      val w = col("doc_id") % 640 + 1
      val h = col("doc_id") % 480 + 1
      val png = unhex(concat(
        lit("89504E470D0A1A0A"), // signature
        lit("0000000D49484452"), // IHDR length + type
        lpad(hex(w), 8, "0"), lpad(hex(h), 8, "0"),
        lit("0806000000"))) // bit depth, color type, etc.
      val dims = Multimodal.pngDims(col("png"))
      Tables.documents(s, dir)
        .select(col("doc_id"), png.as("png"))
        .select(col("doc_id"), dims.getField("width").as("width"),
          dims.getField("height").as("height"),
          length(col("png")).as("hdr_len"))
        .orderBy(col("doc_id"))
    },

    // The audio twin of mm_image_dims: synthesize canonical 44-byte
    // PCM WAV headers (RIFF/WAVE/fmt/data, little-endian fields) from
    // each doc's id, then parse the metadata BACK with the
    // pure-Column RIFF reader. The oracle is the analytic inverse.
    "mm_audio_duration" -> { (s, dir) =>
      def le16(v: Column): Column = {
        val h = lpad(hex(v), 4, "0")
        concat(substring(h, 3, 2), substring(h, 1, 2))
      }
      def le32(v: Column): Column = {
        val h = lpad(hex(v), 8, "0")
        concat(substring(h, 7, 2), substring(h, 5, 2),
          substring(h, 3, 2), substring(h, 1, 2))
      }
      val channels = col("doc_id") % 2 + 1
      val rate = when(col("doc_id") % 3 === 0, 8000L)
        .when(col("doc_id") % 3 === 1, 16000L).otherwise(44100L)
      val byteRate = rate * channels * 2 // 16-bit PCM: bits/8 = 2
      val dataSize = (col("doc_id") % 100000L) * 64 + 1000
      val wav = unhex(concat(
        lit("52494646"), le32(dataSize + 36), // "RIFF", riff chunk size
        lit("57415645"), lit("666D7420"),     // "WAVE", "fmt "
        le32(lit(16L)), le16(lit(1L)),        // fmt size, PCM tag
        le16(channels), le32(rate), le32(byteRate),
        le16(channels * 2), le16(lit(16L)),   // block align, bits
        lit("64617461"), le32(dataSize)))     // "data", data size
      val meta = Multimodal.wavMeta(col("wav"))
      Tables.documents(s, dir)
        .select(col("doc_id"), wav.as("wav"))
        .select(col("doc_id"),
          meta.getField("channels").as("channels"),
          meta.getField("sample_rate").as("sample_rate"),
          meta.getField("bits").as("bits"),
          meta.getField("duration_ms").as("duration_ms"),
          length(col("wav")).as("hdr_len"))
        .orderBy(col("doc_id"))
    },

    // REAL PCM audio stats (the PngCodec discipline on the audio leg —
    // where mm_audio_duration reads the RIFF header, this decodes the
    // SAMPLES): analytically-known md5-mixed waveforms are
    // round-tripped through the real WavCodec (44-byte header + LE16
    // data chunk walk), then the quality gates a speech pipeline runs
    // before transcription — peak, clipping census, zero-crossing
    // rate, RMS — reduce the decoded PCM row-locally. Every
    // cross-engine stat is an exact integer; the one derived double
    // (RMS) is a single sqrt + round at the Column edge. The oracle
    // replays the sample formula analytically (DuckDB cannot parse
    // WAV and does not need to — the codec round-trip is what the
    // Spark side proves).
    "mm_wav_rms" -> { (s, dir) =>
      import s.implicits._
      val ids = Tables.documents(s, dir).select(col("doc_id"))
        .as[java.lang.Long]
      WavCodec.pcmStats(WavCodec.synthWavs(ids)).toDF()
        .select(col("id").as("doc_id"), col("n"), col("peak"), col("clip"),
          col("zerox"), col("sumsq"),
          PRound.pround(sqrt(col("sumsq").cast("double") / col("n")), 4)
            .as("rms"))
        .orderBy(col("doc_id"))
    },

    // The LOSSLESS-audio leg (round 16, VERDICT r15 #6 — FLAC was
    // STREAMINFO-only until now, so the format speech datasets
    // actually ship never reached the PCM gates): synthesize real
    // Rice-coded FLAC streams — fixed-blocksize frames with a partial
    // last frame, constant subframes for the id%7==3 flat class,
    // fixed-predictor/verbatim subframes for the md5-noise class,
    // CRC-8/CRC-16 per frame and the STREAMINFO MD5 verified on
    // decode — then reduce the DECODED samples with the SAME PcmStats
    // reducer as mm_wav_rms, so both audio legs gate identical
    // semantics. The oracle replays the "f"-seeded sample formula
    // analytically (DuckDB cannot Rice-decode and does not need to).
    "mm_flac_rms" -> { (s, dir) =>
      import s.implicits._
      val ids = Tables.documents(s, dir).select(col("doc_id"))
        .as[java.lang.Long]
      FlacCodec.flacPcmStats(FlacCodec.synthFlacs(ids)).toDF()
        .select(col("id").as("doc_id"), col("n"), col("peak"), col("clip"),
          col("zerox"), col("sumsq"),
          PRound.pround(sqrt(col("sumsq").cast("double") / col("n")), 4)
            .as("rms"))
        .orderBy(col("doc_id"))
    },

    // Perceptual AUDIO dedup (round 16 — the audio twin of the
    // mm_phash_* image legs, riding DECODED PCM): 48-bit
    // frame-energy gradient hash (e_i = Σv² over 16-sample frames,
    // bit i = e_i > e_i+1), AMPLITUDE-INVARIANT by construction so
    // re-levelled re-posts of one recording collide at hamming 0 —
    // the fixture plants ×2-amplified pairs whose WAV bytes differ
    // everywhere; md5-mixed per-frame energies keep cross-group
    // collisions at the banded floor. Pairs ride the SHARED
    // banded-hamming skeleton; the oracle replays the UNSCALED base
    // energies (the invariance makes the parity term vanish
    // analytically) and the same band join.
    "mm_audio_phash" -> { (s, dir) =>
      import s.implicits._
      val ids = Tables.documents(s, dir).select(col("doc_id"))
        .as[java.lang.Long]
      val sigs = WavCodec.audioPHash(WavCodec.synthWavPairs(ids)).toDF()
        .select(col("id"), col("phash"))
      graft.operators.Dedup.bandedHammingPairs(sigs, "id", "phash",
          maxHamming = 6)
        .orderBy(col("id_a"), col("id_b"))
    },

    // The DECORRELATED-stereo + LPC leg (round 16 — both were loud
    // refusals when mm_flac_rms landed, and both are what real FLAC
    // encoders emit by default): left/side, right/side and mid/side
    // frames (mode cycling by doc_id % 3; side channel at bits+1,
    // mid's floored low bit restored from side — reconstruction
    // EXACT) with even docs riding the LPC subframe bitstream
    // (order-2 fixed-equivalent coefficients through the full
    // warmup/precision/shift/coefficient grammar). The left channel
    // is md5-noise, the right is left + a small md5 delta — the
    // genuinely-correlated shape decorrelation exists for — and the
    // oracle replays the INTERLEAVED stream analytically.
    "mm_flac_stereo" -> { (s, dir) =>
      import s.implicits._
      val ids = Tables.documents(s, dir).select(col("doc_id"))
        .as[java.lang.Long]
      FlacCodec.flacPcmStats(FlacCodec.synthFlacsStereo(ids)).toDF()
        .select(col("id").as("doc_id"), col("n"), col("peak"), col("clip"),
          col("zerox"), col("sumsq"),
          PRound.pround(sqrt(col("sumsq").cast("double") / col("n")), 4)
            .as("rms"))
        .orderBy(col("doc_id"))
    },

    // Silence-trim offsets from DECODED PCM — the pre-transcription
    // trim a speech pipeline applies (and the "drop this clip" signal
    // when nothing clears the floor): lead/kept/trail sample counts
    // at an absolute threshold, scanned row-locally over the real
    // WavCodec round-trip; all-silent clips report (lead = n, kept =
    // 0, trail = 0). Exact integers end to end; the oracle replays
    // the md5 sample formula with filtered min/max.
    "mm_wav_trim" -> { (s, dir) =>
      import s.implicits._
      val ids = Tables.documents(s, dir).select(col("doc_id"))
        .as[java.lang.Long]
      WavCodec.trimStats(WavCodec.synthWavs(ids), threshold = 24576).toDF()
        .select(col("id").as("doc_id"), col("n"), col("lead"), col("kept"),
          col("trail"))
        .orderBy(col("doc_id"))
    },

    // Energy-based voice-activity detection on DECODED PCM — the
    // frame census a speech pipeline runs before ASR (speech share +
    // longest contiguous speech run decide whether a clip is worth
    // transcribing): 16-sample frames (aligned with the fixture's
    // md5 block), speech when Σv² ≥ 16384²·n_frame — the decision is
    // BIGINT-exact with no division; the runt frame votes with its
    // real sample count. Row-local scan over the real WavCodec
    // round-trip; the oracle replays the sample formula with a
    // gaps-and-islands run census.
    "mm_audio_vad" -> { (s, dir) =>
      import s.implicits._
      val ids = Tables.documents(s, dir).select(col("doc_id"))
        .as[java.lang.Long]
      WavCodec.vadStats(WavCodec.synthWavs(ids), frame = 16,
          meanSqThr = 16384L * 16384L).toDF()
        .select(col("id").as("doc_id"), col("n"), col("nFrames").as("n_frames"),
          col("nSpeech").as("n_speech"), col("longestRun").as("longest_run"),
          PRound.pround(col("nSpeech").cast("double") / col("nFrames"), 4)
            .as("speech_ratio"))
        .orderBy(col("doc_id"))
    },

    // MP4 SAMPLE-TABLE walk (round 16, VERDICT r15 #8 — past mvhd at
    // last): synthesize real streaming-layout MP4s (moov AFTER mdat)
    // whose stsz/stsc/stco/stss tables describe analytically-known
    // samples — chunk gaps in mdat make per-sample offsets NOT a
    // plain prefix sum, so only the genuine stsc/stco chunk math
    // recovers the ranges — then emit each SYNC sample's byte range
    // with the md5 of its actual mdat payload. The oracle replays
    // sizes, the gap-adjusted offsets AND the payload hashes
    // analytically (payloads are ASCII md5-hex prefixes, so DuckDB
    // re-derives the bytes as strings). No H.264 decode — keyframe
    // byte ranges are what per-keyframe dedup censuses need.
    "mm_mp4_samples" -> { (s, dir) =>
      import s.implicits._
      val ids = Tables.documents(s, dir).select(col("doc_id"))
        .as[java.lang.Long]
      Multimodal.mp4SyncSamples(Multimodal.synthMp4s(ids)).toDF()
        .select(col("id").as("doc_id"), col("sample"), col("offset"),
          col("size"), col("payload_md5"))
        .orderBy(col("doc_id"), col("sample"))
    },

    // The VIDEO leg of the multimodal trio: synthesize canonical
    // fast-start MP4 headers ([ftyp][moov[mvhd]]) with a VARYING ftyp
    // brand list — so the parser must read the ftyp size instead of
    // assuming an offset — then parse back with the pure-Column
    // ISO-BMFF reader. Oracle = the analytic inverse. (The general
    // post-mdat / v1 layout runs through the Multimodal.mp4Meta box
    // walk, spec-tested like jpegDims.)
    "mm_video_duration" -> { (s, dir) =>
      def be32(v: Column): Column = lpad(hex(v), 8, "0")
      val extra = col("doc_id") % 3 // 0/1/2 extra compat-brand pairs
      val ftypSize = lit(16L) + extra * 8
      val compat = when(extra === 0, lit(""))
        .when(extra === 1, lit("69736F6D69736F32")) // isom iso2
        .otherwise(lit("69736F6D69736F32617663316D703432")) // +avc1 mp42
      val timescale = when(col("doc_id") % 3 === 0, 600L)
        .when(col("doc_id") % 3 === 1, 1000L).otherwise(90000L)
      val duration = (col("doc_id") % 90000L) * 10 + 7
      val mp4 = unhex(concat(
        be32(ftypSize), lit("66747970"),        // ftyp
        lit("69736F6D"), lit("00000000"),       // major brand, minor
        compat,
        lit("00000074"), lit("6D6F6F76"),       // moov (8 + 108)
        lit("0000006C"), lit("6D766864"),       // mvhd (108, version 0)
        lit("00000000"),                        // version + flags
        lit("00000000"), lit("00000000"),       // ctime, mtime
        be32(timescale), be32(duration),
        lit("00010000"), lit("0100"),           // rate 1.0, volume 1.0
        lit("00" * 10),                         // reserved
        lit("00010000000000000000000000000000"),
        lit("00010000000000000000000000000000"),
        lit("40000000"),                        // unity matrix
        lit("00" * 24),                         // pre_defined
        lit("00000002")))                       // next track id
      val meta = Multimodal.mp4MetaCanonical(col("mp4"))
      Tables.documents(s, dir)
        .select(col("doc_id"), mp4.as("mp4"))
        .select(col("doc_id"),
          meta.getField("timescale").as("timescale"),
          meta.getField("duration").as("duration"),
          meta.getField("duration_ms").as("duration_ms"),
          length(col("mp4")).as("hdr_len"))
        .orderBy(col("doc_id"))
    },

    // The BIT-PACKED audio leg: synthesize FLAC fLaC+STREAMINFO
    // headers (sample_rate|channels|bits|total_samples packed into
    // 20+3+5+36 bits — unlike WAV's byte-aligned little-endian
    // fields, the parser must split a big-endian u64 across the bit
    // boundaries), then parse BACK with the pure-Column reader. The
    // oracle is the analytic inverse. Totals straddle the 32-bit
    // boundary (up to ~2^35 samples at high ids), so the two-half
    // u32 recombination path is genuinely exercised.
    "mm_flac_duration" -> { (s, dir) =>
      def be(v: Column, hexDigits: Int): Column = lpad(hex(v), hexDigits, "0")
      val rate = when(col("doc_id") % 4 === 0, 8000L)
        .when(col("doc_id") % 4 === 1, 16000L)
        .when(col("doc_id") % 4 === 2, 44100L).otherwise(48000L)
      val channels = col("doc_id") % 2 + 1
      // doc_id%150 · ~2^28.4: crosses 2^32 from id%150 ≥ 13 (every SF)
      // while staying under the 36-bit field's 2^36 ceiling
      val total = (col("doc_id") % 150L) * 343597383L + 44100L
      val hi = rate * lit(4096L) + (channels - 1) * lit(512L) +
        lit((16 - 1) * 16L) + shiftright(total, 32)
      val lo = total.bitwiseAND(lit(4294967295L))
      val flac = unhex(concat(
        lit("664C6143"),                  // "fLaC"
        lit("80"), lit("000022"),         // last-block STREAMINFO, len 34
        lit("1000"), lit("1000"),         // min/max blocksize 4096
        lit("000000"), lit("000000"),     // min/max framesize unknown
        be(hi, 8), be(lo, 8),             // the packed 64 bits
        md5(col("doc_id").cast("string")))) // 16-byte MD5 field
      val meta = Multimodal.flacMeta(col("flac"))
      Tables.documents(s, dir)
        .select(col("doc_id"), flac.as("flac"))
        .select(col("doc_id"),
          meta.getField("channels").as("channels"),
          meta.getField("sample_rate").as("sample_rate"),
          meta.getField("bits").as("bits"),
          meta.getField("total_samples").as("total_samples"),
          meta.getField("duration_ms").as("duration_ms"),
          length(col("flac")).as("hdr_len"))
        .orderBy(col("doc_id"))
    },

    // The SYNCSAFE leg (round 11, VBR-widened round 14 per VERDICT
    // r13 #4; fixture factored to [[mp3FixtureBlob]] round 15 so
    // graft.Mp3Split can time synthesis and probe separately —
    // VERDICT r14 #8): synthesize ID3v2-tagged MPEG-1 Layer III
    // files —
    // syncsafe 28-bit tag size (four 7-bit bytes, the third integer
    // encoding in the family after WAV's little-endian and FLAC's
    // bit-packed big-endian), a zero-padded tag body that crosses the
    // 7-bit boundary (so byte 9 is exercised, not just byte 10), a
    // real frame header with per-doc bitrate/sample-rate indexes —
    // then one of THREE stream shapes by doc_id mod 3: plain CBR,
    // a Xing/Info tag after the REAL side-info offset (17 mono / 32
    // stereo — mono docs plant "Info", stereo "Xing") with the
    // frames flag + big-endian frame count, or a Fraunhofer VBRI tag
    // at the fixed 32-byte offset. VBR durations come from the
    // planted frame count (frames·1152/rate, exact); CBR keeps the
    // byte-count estimate. The oracle is the analytic inverse.
    "mm_mp3_duration" -> { (s, dir) =>
      val mp3 = Curation.mp3FixtureBlob
      // the meta struct is STAGED through its own projection (round
      // 15): janino rejects the probe's generated code (64KB-class),
      // so the projection runs INTERPRETED — where nothing shares the
      // 7 per-field copies of the parse tree. CollapseProject keeps
      // the stage because the alias is non-cheap and referenced 7
      // times, so the struct evaluates ONCE per row and the fields
      // extract from it. (The explode(array(meta)) Generate trick
      // remains measured-slower — 2.9 vs 4.0 s r14 A/B — this is a
      // plain projection, no Generate.) Measured by graft.Mp3Split.
      Tables.documents(s, dir)
        .select(col("doc_id"), mp3.as("mp3"))
        .select(col("doc_id"), Multimodal.mp3Meta(col("mp3")).as("m"),
          length(col("mp3")).as("file_len"))
        .select(col("doc_id"),
          col("m.tag_size").as("tag_size"),
          col("m.bitrate_kbps").as("bitrate_kbps"),
          col("m.sample_rate").as("sample_rate"),
          col("m.channels").as("channels"),
          col("m.mode").as("mode"),
          col("m.vbr_frames").as("vbr_frames"),
          col("m.duration_ms").as("duration_ms"),
          col("file_len"))
        .orderBy(col("doc_id"))
    },

    // Temperature-scaled mixture (the multilingual alpha-sampling
    // shape, τ=2): target share q_i ∝ t_i^(1/τ), downsample-only
    // budget B = min_i t_i/q_i so no language upsamples. The algebra
    // collapses to rate_i = sqrt(t_min/t_i) — the normalizer Σ√t
    // cancels, so there is NO order-sensitive float sum anywhere:
    // token totals are exact integer aggs, the rate is one sqrt of
    // their ratio, floored to permyriad. Same scale shape as
    // mix_resample: one token agg, a |langs|-row broadcast, a
    // map-side membership filter.
    "mix_temperature" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val d = Tables.documents(s, dir).select(col("doc_id"), col("lang"),
        TextAnalysis.tokenCount(col("text")).as("n_tok"))
      val totW = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      val rates = d.groupBy(col("lang")).agg(sum(col("n_tok")).as("ts"))
        .withColumn("tmin", min(col("ts")).over(totW))
        .select(col("lang"),
          floor(sqrt(col("tmin").cast("double") / col("ts").cast("double"))
            * lit(10000.0)).as("pm"))
      d.join(broadcast(rates), Seq("lang"))
        .filter(Sampling.dynamicPred(col("doc_id"), col("pm")))
        .groupBy(col("lang"))
        .agg(max(col("pm")).as("pm"), count(lit(1)).as("n_docs_kept"),
          sum(col("n_tok")).as("tokens_kept"))
        .orderBy(col("lang"))
    },

    // Exact token-budget apportionment across languages — the step
    // AFTER mixture weights: a training run has a fixed budget B
    // (here 100k shares) and the per-domain allocation must sum to
    // EXACTLY B (a per-domain float-rounded quota drifts by ±|domains|
    // tokens and breaks the packing plan downstream). Hamilton
    // largest-remainder apportionment on INTEGER weights: w_i =
    // floor(√t_i·10³) (the τ=2 temperature weight; sqrt is IEEE
    // correctly-rounded, so the floor is engine-exact), base_i =
    // ⌊B·w_i/Σw⌋, and the B−Σbase leftover seats go to the largest
    // remainders B·w_i mod Σw (ties → lang asc). Every comparison and
    // sum is BIGINT — no float normalizer anywhere. Scale shape: one
    // map-side-combined token agg; everything after runs on the
    // |domains|-row census frame (the window over it is census-sized
    // by construction, never data-sized).
    "mix_token_budget" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val b = 100000L
      val totW = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      val t = Tables.documents(s, dir)
        .select(col("lang"), TextAnalysis.tokenCount(col("text"))
          .cast("long").as("n_tok"))
        .groupBy(col("lang")).agg(sum(col("n_tok")).as("n_tokens"))
        .withColumn("w",
          floor(sqrt(col("n_tokens").cast("double")) * 1000).cast("long"))
        .withColumn("s", sum(col("w")).over(totW))
        .withColumn("alloc_base", expr(s"($b * w) div s"))
        .withColumn("rem", expr(s"($b * w) % s"))
      t.withColumn("leftover", lit(b) - sum(col("alloc_base")).over(totW))
        .withColumn("rk",
          row_number().over(Window.orderBy(col("rem").desc, col("lang"))))
        .withColumn("topup", (col("rk") <= col("leftover")).cast("long"))
        .select(col("lang"), col("n_tokens"), col("w"), col("alloc_base"),
          col("topup"), (col("alloc_base") + col("topup")).as("alloc"))
        .orderBy(col("lang"))
    },

    // DoReMi-shaped domain reweighting (Xie et al., NeurIPS 2023 —
    // the excess-loss signal, single-pass): a domain whose own LM
    // beats the GLOBAL LM by a lot is under-served by uniform mixing,
    // so its weight rises with its mean per-token excess cost
    //   excess_d = Σ_t c_dt · (cost_global(t) − cost_d(t)) / tokens_d
    // (both LMs add-one over the SHARED global vocabulary, every
    // parameter one rounded double in integer micro-nats — the
    // NaiveBayes/DSIR discipline, so the token-weighted sum is exact
    // integer arithmetic). The mean is rounded to an INTEGER
    // micro-nat before normalizing, so the weight denominator is an
    // exact integer sum — no cross-engine float-summation-order
    // hazard. Census-bounded: one token-occurrence census; the global
    // cost side is a vocabulary-sized broadcast.
    "mix_excess_loss" -> { (s, dir) =>
      def mn(p: Column): Column =
        PRound.pround(-log(p) * 1e6, 0).cast("long")
      val occ = Tables.documents(s, dir).select(col("lang"),
        explode(TextAnalysis.wsTokens(
          TextAnalysis.canonicalize(col("text")))).as("tok"))
      val dt = Materialize.cut(occ.groupBy(col("lang"), col("tok"))
        .agg(count(lit(1)).as("c_dt")))
      val gt = dt.groupBy(col("tok")).agg(sum(col("c_dt")).as("c_gt"))
      val dTot = dt.groupBy(col("lang")).agg(sum(col("c_dt")).as("tot_d"))
      val gTot = gt.agg(sum(col("c_gt")).as("tot_g"), count(lit(1)).as("v"))
      val perDom = dt
        .join(broadcast(gt), Seq("tok"))
        .join(broadcast(dTot), Seq("lang"))
        .crossJoin(broadcast(gTot))
        .select(col("lang"), col("c_dt"), col("tot_d"),
          (mn((col("c_gt") + 1).cast("double") /
              (col("tot_g") + col("v")).cast("double")) -
            mn((col("c_dt") + 1).cast("double") /
              (col("tot_d") + col("v")).cast("double"))).as("x"))
        .groupBy(col("lang"))
        .agg(max(col("tot_d")).as("n_tokens"),
          sum(col("c_dt") * col("x")).as("excess_mu"))
        .withColumn("me", PRound.pround(
          col("excess_mu").cast("double") / col("n_tokens"), 0).cast("long"))
      val wtot = perDom.agg(sum(greatest(col("me"), lit(0L))).as("wt"))
      perDom.crossJoin(broadcast(wtot))
        .select(col("lang"), col("n_tokens"),
          PRound.pround(col("me").cast("double") / 1e6, 6).as("excess_nats"),
          PRound.pround(when(col("wt") > 0,
            greatest(col("me"), lit(0L)).cast("double") / col("wt"))
            .otherwise(lit(0.0)), 4).as("weight"))
        .orderBy(col("lang"))
    },

    // Per-language ADAPTIVE quality threshold — a fixed global cutoff
    // over-filters languages whose score distribution sits lower; the
    // production gate derives each language's cutoff from its own
    // quantile (p25 here). Exact interpolated percentile (the
    // `percentiles` query's proven quantile_cont twin) over the per-
    // doc score, broadcast back as a |langs|-row frame; the second
    // pass over docs is a map-side flag + count (the mix_resample
    // shape — at 100 TB the narrow (lang, q) projection is what
    // re-scans, never the text).
    "quality_adaptive" -> { (s, dir) =>
      val q = Tables.documents(s, dir).select(col("lang"),
        TextAnalysis.qualityScore(col("text")).as("q"))
      val thr = q.groupBy(col("lang"))
        .agg(PRound.pround(expr("percentile(q, 0.25)"), 4).as("thr"))
      q.join(broadcast(thr), Seq("lang"))
        .groupBy(col("lang"))
        .agg(max(col("thr")).as("thr"), count(lit(1)).as("n_docs"),
          sum((col("q") >= col("thr")).cast("long")).as("n_kept"))
        .orderBy(col("lang"))
    },

    // quality_adaptive's SERVE topology (VERDICT r12 #6): the per-
    // language p25 cut is exactly ThresholdStore's shape — build it AT
    // MOST ONCE per dataset generation into the content-keyed
    // DatasetCache (geometry in the artifact name) and serve every
    // curation run by broadcast-joining the |langs|-row stored frame;
    // the serve plan carries ZERO percentile aggregates (plan-gated).
    // Stored cuts are bit-identical to the fresh build (deterministic
    // exact percentile + 4dp rounding), so the shared quality_adaptive
    // oracle proves serve ≡ build.
    "quality_adaptive_stored" -> { (s, dir) =>
      val q = Tables.documents(s, dir).select(col("lang"),
        TextAnalysis.qualityScore(col("text")).as("q"))
      val thr = graft.operators.ThresholdStore.storedCuts(
        s, dir, Seq("documents.parquet"), "quality_cuts", q,
        Seq("lang"), "q", Seq("thr" -> 0.25), dp = 4)
      q.join(broadcast(thr), Seq("lang"))
        .groupBy(col("lang"))
        .agg(max(col("thr")).as("thr"), count(lit(1)).as("n_docs"),
          sum((col("q") >= col("thr")).cast("long")).as("n_kept"))
        .orderBy(col("lang"))
    },

    // MODEL-BASED quality filter, train leg (VERDICT r12 #5): a
    // deterministic multinomial Naive Bayes — the fastText-classifier
    // gate every real curation stack runs after the heuristic gates —
    // trained on the hash-split 80% with the existing heuristic gate
    // (qualityScore >= 0.4) as the teacher label. Every parameter is
    // one rounded double frozen to integer micro-nats (the UnigramLm
    // cost discipline), so the model table replays bit-for-bit in any
    // engine. Census-bounded: one explode feeds one (label, token)
    // aggregation; everything downstream runs on the vocabulary-sized
    // census (operators.NaiveBayes).
    "quality_nb_train" -> { (s, dir) =>
      NaiveBayes.train(nbTrainDocs(s, dir))
        .orderBy(col("label"), col("token"))
    },

    // Apply leg: the whole model rides ONE broadcast row of
    // token→cost maps; each document folds its own tokens — integer
    // adds, so the argmin class is total-order-exact and the corpus
    // never shuffles (map-side except the presentation sort). Output
    // is the per-doc annotation a curation pipeline would carry:
    // teacher label, predicted class, both class costs.
    "quality_nb_apply" -> { (s, dir) =>
      val labeled = nbLabeledCut(s, dir)
      val d = labeled
      val params = NaiveBayes.broadcastParams(
        NaiveBayes.train(nbTrainSlice(labeled)), Seq("bad", "good"))
      NaiveBayes.score(
          d.select(col("doc_id"), col("label"), col("tokens")),
          params, Seq("bad", "good"))
        .select(col("doc_id"), col("label"), col("pred"),
          col("cost_bad"), col("cost_good"))
        .orderBy(col("doc_id"))
    },

    // Eval leg — the held-out confusion a teacher-student gate is
    // judged by before it gates anything: score the UNSEEN 20%
    // (slot < 2000, the split quality_nb_train never saw) under the
    // 80%-trained model, then per-class tp/fp/fn/tn and
    // precision/recall/F1 (f1 in the tie-free algebraic form
    // 2·tp/(2·tp+fp+fn) — one division, identical doubles in any
    // engine, rounded once at the edge). Scale shape: scoring is the
    // map-side quality_nb_apply plan; the confusion collapses through
    // ONE ≤4-row (label, pred) census before the class fan-out, so
    // the per-class pass runs on a broadcast-sized frame — the corpus
    // is scanned exactly once.
    "quality_nb_eval" -> { (s, dir) =>
      import s.implicits._
      val labeled = nbLabeledCut(s, dir)
      val held = nbHeldSlice(labeled)
      val params = NaiveBayes.broadcastParams(
        NaiveBayes.train(nbTrainSlice(labeled)), Seq("bad", "good"))
      val cells = NaiveBayes.score(
          held.select(col("doc_id"), col("label"), col("tokens")),
          params, Seq("bad", "good"))
        .groupBy(col("label"), col("pred")).agg(count(lit(1)).as("n"))
      val per = cells.crossJoin(broadcast(Seq("bad", "good").toDF("cls")))
        .groupBy(col("cls"))
        .agg(
          sum(when(col("label") === col("cls") && col("pred") === col("cls"),
            col("n")).otherwise(0L)).as("tp"),
          sum(when(col("label") =!= col("cls") && col("pred") === col("cls"),
            col("n")).otherwise(0L)).as("fp"),
          sum(when(col("label") === col("cls") && col("pred") =!= col("cls"),
            col("n")).otherwise(0L)).as("fn"),
          sum(when(col("label") =!= col("cls") && col("pred") =!= col("cls"),
            col("n")).otherwise(0L)).as("tn"))
      per.select(col("cls"), col("tp"), col("fp"), col("fn"), col("tn"),
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

    // Calibration curve for the NB gate — the reliability diagram in
    // LOG-ODDS space: bucket the integer margin cost_bad − cost_good
    // (positive → model favors "good") into fixed 2-nat bands and
    // compare each band's empirical teacher good-rate against its
    // mean margin. Log-odds bands instead of sigmoid-probability
    // deciles keep the cross-engine boundary INTEGER (exp() is libm-
    // dependent; floor of an exact IEEE division is not) — the same
    // diagram, monotone-equivalent x-axis. Held-out slice only (the
    // eval discipline); two divisions at the edge, everything before
    // them exact.
    "quality_nb_calibrate" -> { (s, dir) =>
      val labeled = nbLabeledCut(s, dir)
      val held = nbHeldSlice(labeled)
      val params = NaiveBayes.broadcastParams(
        NaiveBayes.train(nbTrainSlice(labeled)), Seq("bad", "good"))
      NaiveBayes.score(
          held.select(col("doc_id"), col("label"), col("tokens")),
          params, Seq("bad", "good"))
        .select(col("label"), (col("cost_bad") - col("cost_good")).as("m"))
        .withColumn("bucket", greatest(lit(0L),
          least(lit(9L), floor(col("m").cast("double") / 2e6) + 5)))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          sum((col("label") === "good").cast("long")).as("n_good"),
          PRound.pround(sum((col("label") === "good").cast("long"))
            .cast("double") / count(lit(1)), 6).as("good_rate"),
          PRound.pround(
            sum(col("m")).cast("double") / count(lit(1)) / lit(1e6), 6)
            .as("mean_margin_nats"))
        .orderBy(col("bucket"))
    },

    // quality_nb_apply's SERVE topology (the lm_kn_stored story on the
    // classifier): the NB parameter table is a keyed frame like any
    // store artifact — train it AT MOST ONCE per dataset generation
    // into the content-keyed DatasetCache (geometry in the artifact
    // name: multinomial, add-one smoothing, q≥0.4 teacher, 80% hash
    // split) and serve every scoring run from the stored parquet. The
    // serve plan carries ZERO token-census aggregation over the train
    // slice (plan-gated: two parquet scans — corpus + params — and no
    // shuffled join); stored params are bit-identical to the fresh
    // build, so the shared quality_nb_apply oracle proves serve ≡
    // build.
    // Precision/recall CURVE of the NB gate over integer margin
    // thresholds — the operating-point sweep a filter rollout runs
    // before picking its cut (quality_nb_eval reports ONE point at
    // margin 0; real deployments trade precision for yield along this
    // curve). Thresholds are integer micro-nats (−6e6..6e6 step 2e6),
    // so every comparison is BIGINT-exact; held-out slice only; the
    // scored frame is cut once and the 7-row threshold frame rides a
    // broadcast.
    "quality_nb_pr_curve" -> { (s, dir) =>
      val labeled = nbLabeledCut(s, dir)
      val held = nbHeldSlice(labeled)
      val params = NaiveBayes.broadcastParams(
        NaiveBayes.train(nbTrainSlice(labeled)), Seq("bad", "good"))
      val scored = Materialize.cut(NaiveBayes.score(
          held.select(col("doc_id"), col("label"), col("tokens")),
          params, Seq("bad", "good"))
        .select(col("label"), (col("cost_bad") - col("cost_good")).as("m")))
      val ts = s.range(-3, 4).select((col("id") * 2000000L).as("t"))
      scored.crossJoin(broadcast(ts))
        .groupBy(col("t"))
        .agg(sum((col("m") > col("t")).cast("long")).as("n_pred_good"),
          sum(((col("m") > col("t")) && col("label") === "good")
            .cast("long")).as("tp"),
          sum((col("label") === "good").cast("long")).as("n_good"))
        .select(col("t"), col("n_pred_good"), col("tp"), col("n_good"),
          PRound.pround(when(col("n_pred_good") > 0,
            col("tp").cast("double") / col("n_pred_good")).otherwise(0.0), 4)
            .as("precision"),
          PRound.pround(when(col("n_good") > 0,
            col("tp").cast("double") / col("n_good")).otherwise(0.0), 4)
            .as("recall"))
        .orderBy(col("t"))
    },

    "quality_nb_stored" -> { (s, dir) =>
      val store = graft.sources.DatasetCache.getOrBuild(
          dir, Seq("documents.parquet"), "nb_multinomial_q04_split80") { path =>
        NaiveBayes.train(nbTrainDocs(s, dir))
          .write.mode("overwrite").parquet(s"$path/params")
      }
      val d = nbLabeledDocs(s, dir)
      val params = NaiveBayes.broadcastParams(
        s.read.parquet(s"$store/params"), Seq("bad", "good"))
      NaiveBayes.score(
          d.select(col("doc_id"), col("label"), col("tokens")),
          params, Seq("bad", "good"))
        .select(col("doc_id"), col("label"), col("pred"),
          col("cost_bad"), col("cost_good"))
        .orderBy(col("doc_id"))
    },

    // Kneser-Ney bigram LM TRAINER — the KenLM/CCNet perplexity gate
    // (train a small LM on the target domain, score the crawl; Wenzek
    // et al., LREC 2020). Target domain = the English slice; the
    // parameter table is the KenLM prob+backoff decomposition frozen
    // to integer micro-nats, so scoring anywhere is an integer sum
    // (operators.KneserNey).
    "lm_kn_train" -> { (s, dir) =>
      KneserNey.train(knTargetDocs(s, dir))
        .orderBy(col("kind"), col("w1"), col("w2"))
    },

    // The trained LM APPLIED to the whole corpus: per-doc mean bigram
    // cost in nats (perplexity = e^avg_nats — the monotone integer
    // form). Map-side: the model rides ONE broadcast row of three
    // token→cost maps; each doc folds its own bigrams — zero shuffle
    // on the scored corpus.
    "lm_kn_score" -> { (s, dir) =>
      knScoredDocs(s, dir).orderBy(col("doc_id"))
    },

    // CCNet's head/middle/tail split: per-language perplexity tertiles
    // over the KN scores (exact percentile, the quality_adaptive
    // discipline), then the bucket census a shard write would
    // partition by. At 100 TB the thresholds are a |langs|×2 broadcast
    // and the bucket column is map-side — the census agg is the only
    // shuffle.
    "ccnet_buckets" -> { (s, dir) =>
      // cut before the fan-out: the scored frame feeds both the
      // threshold agg and the bucket join
      val scored = Materialize.cut(knScoredDocs(s, dir)
        .select(col("lang"), col("n_bg"), col("avg_nats")))
      val thr = scored.groupBy(col("lang"))
        .agg(PRound.pround(expr("percentile(avg_nats, 0.33)"), 4).as("t33"),
          PRound.pround(expr("percentile(avg_nats, 0.67)"), 4).as("t67"))
      scored.join(broadcast(thr), Seq("lang"))
        .withColumn("bucket",
          when(col("avg_nats") <= col("t33"), lit("head"))
            .when(col("avg_nats") <= col("t67"), lit("middle"))
            .otherwise(lit("tail")))
        .groupBy(col("lang"), col("bucket"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_bg")).as("n_tokens"),
          min(col("avg_nats")).as("min_nats"),
          max(col("avg_nats")).as("max_nats"))
        .orderBy(col("lang"), col("bucket"))
    },

    // lm_kn_score's SERVE topology: the KN parameter table is a keyed
    // frame like any ThresholdStore artifact — train it AT MOST ONCE
    // per dataset generation into the content-keyed DatasetCache
    // (geometry in the artifact name: bigram, D=0.75, en target) and
    // serve every scoring run from the stored parquet. The serve plan
    // carries ZERO bigram-census aggregation over the train slice
    // (plan-gated); stored params are bit-identical to the fresh
    // build, so the shared lm_kn_score oracle proves serve ≡ build.
    "lm_kn_stored" -> { (s, dir) =>
      val store = graft.sources.DatasetCache.getOrBuild(
          dir, Seq("documents.parquet"), "kn_bigram_d075_en") { path =>
        KneserNey.train(knTargetDocs(s, dir))
          .write.mode("overwrite").parquet(s"$path/params")
      }
      KneserNey.score(knDocs(s, dir), s.read.parquet(s"$store/params"),
          keyCols = Seq("doc_id", "lang"))
        .select(col("doc_id"), col("lang"), col("n_bg"), col("cost"),
          col("avg_nats"))
        .orderBy(col("doc_id"))
    },

    // The CCNet capstone (Wenzek et al., LREC 2020 — the pipeline the
    // KN family exists for): exact dedup (skew-proof groupBy-min on
    // the text hash) → KN LM trained on the DEDUPED English slice →
    // per-language perplexity tertiles → keep head+middle (the CCNet
    // policy: the tail is the junk cut) → per-language funnel census
    // (raw → deduped → kept, with kept token mass). Everything before
    // the census is map-side or census-bounded; the thresholds are a
    // |langs|×1 broadcast.
    "pipeline_ccnet" -> { (s, dir) =>
      // planted exact copies (every 20th doc) so the dedup stage has
      // real work — the synthetic corpus has no organic byte dups
      val base = Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"), col("text"))
      val docs = base.unionByName(base.filter(col("doc_id") % 20 === 0)
        .select((col("doc_id") + 1000000).as("doc_id"), col("lang"),
          col("text")))
      val keep = docs.groupBy(md5(col("text")).as("h"))
        .agg(min(col("doc_id")).as("doc_id")).select(col("doc_id"))
      val dd = Materialize.cut(docs.join(keep, Seq("doc_id")))
      val ddToks = dd.select(col("doc_id"), col("lang"),
          TextAnalysis.wsTokens(TextAnalysis.canonicalize(col("text")))
            .as("tokens"))
        .filter(size(col("tokens")) >= 1)
      val scored = Materialize.cut(KneserNey.score(ddToks,
          KneserNey.train(ddToks.filter(col("lang") === "en")),
          keyCols = Seq("doc_id", "lang"))
        .select(col("doc_id"), col("lang"), col("n_bg"), col("avg_nats")))
      val thr = scored.groupBy(col("lang"))
        .agg(PRound.pround(expr("percentile(avg_nats, 0.67)"), 4).as("t67"))
      val kept = scored.join(broadcast(thr), Seq("lang"))
        .filter(col("avg_nats") <= col("t67"))
      val nRaw = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_raw"))
      val nDedup = dd.groupBy(col("lang")).agg(count(lit(1)).as("n_dedup"))
      val nKept = kept.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_kept"), sum(col("n_bg")).as("tok_kept"))
      nRaw.join(nDedup, Seq("lang")).join(nKept, Seq("lang"))
        .orderBy(col("lang"))
    },

    // Tokenizer FERTILITY per language (pieces per word — the metric
    // tokenizer teams track per language to catch under-served
    // scripts; Rust et al., ACL 2021): the trained unigram LM's
    // segmentation joined to a per-language word census, piece totals
    // freq-weighted. The per-word DP runs ONCE on the distinct-word
    // census; languages weight it by their own counts.
    "tokenizer_fertility" -> { (s, dir) =>
      val census = unigramCensus(s, dir)
      val trained = UnigramLm.train(census, topMulti = 24, rounds = 2)
      val segd = UnigramLm.segment(census, trained)
        .select(col("w"), col("n_pieces"))
      val lc = Tables.documents(s, dir).select(col("lang"),
          explode(TextAnalysis.wsTokens(TextAnalysis.canonicalize(col("text"))))
            .as("w"))
        .groupBy(col("lang"), col("w")).agg(count(lit(1)).as("freql"))
      lc.join(segd, Seq("w"))
        .groupBy(col("lang"))
        .agg(sum(col("freql")).as("n_words"),
          sum(col("freql") * col("n_pieces")).as("n_pieces"))
        .withColumn("fertility",
          PRound.pround(col("n_pieces").cast("double") / col("n_words"), 6))
        .orderBy(col("lang"))
    },

    // BPE vs unigram-LM head-to-head — the tokenizer BAKE-OFF a vocab
    // decision runs (same canonical word census, same training data,
    // occurrence-weighted fertility per word-length bucket): BPE's
    // greedy merges vs the unigram EM's Viterbi segmentations, joined
    // per word type. Both trainers are census-bounded, so the compare
    // adds no corpus-sized pass beyond what each trainer already pays;
    // the join runs on vocabulary-sized frames.
    "tokenizer_compare" -> { (s, dir) =>
      val census = unigramCensus(s, dir)
      val uni = UnigramLm.segment(census,
          UnigramLm.train(census, topMulti = 24, rounds = 2))
        .select(col("w"), col("freq"), col("n_pieces").cast("long").as("nu"))
      val bpe = bpeLearned(s, dir)._1
        .select(col("w"), size(col("t")).cast("long").as("nb"))
      uni.join(bpe, Seq("w"))
        .select(least(length(col("w")), lit(10)).cast("long")
          .as("wlen_bucket"), col("freq"), col("nb"), col("nu"))
        .groupBy(col("wlen_bucket"))
        .agg(count(lit(1)).as("n_types"),
          sum(col("freq")).as("n_occurrences"),
          sum(col("freq") * col("nb")).as("bpe_pieces"),
          sum(col("freq") * col("nu")).as("uni_pieces"))
        .select(col("wlen_bucket"), col("n_types"), col("n_occurrences"),
          col("bpe_pieces"), col("uni_pieces"),
          PRound.pround(col("bpe_pieces").cast("double") /
            col("n_occurrences"), 4).as("bpe_fertility"),
          PRound.pround(col("uni_pieces").cast("double") /
            col("n_occurrences"), 4).as("uni_fertility"))
        .orderBy(col("wlen_bucket"))
    },

    // DSIR importance weights (Xie et al., NeurIPS 2023: Data Selection
    // via Importance Resampling): hashed-unigram bag LMs for the
    // target domain (the English slice) vs the raw corpus, per-bucket
    // importance = cost_raw − cost_target in integer micro-nats (two
    // separately rounded add-one parameters — the NaiveBayes
    // discipline, so doc weights are integer sums). 256 md5 buckets
    // (the text_feature_hash idiom).
    "dsir_weights" -> { (s, dir) =>
      dsirWeightTable(s, dir).orderBy(col("bucket"))
    },

    // DSIR selection: per-doc importance = Σ w[bucket(token)] folded
    // map-side against the broadcast 256-entry weight map, keep docs
    // at or above the exact p80 cut (broadcast threshold — the
    // winsorize topology, no global sort).
    "dsir_select" -> { (s, dir) =>
      val wmap = dsirWeightTable(s, dir).agg(
        map_from_entries(collect_list(struct(col("bucket"), col("w"))))
          .as("m"))
      val scored = Materialize.cut(knDocs(s, dir)
        .crossJoin(broadcast(wmap))
        .select(col("doc_id"), col("lang"),
          size(col("tokens")).cast("long").as("n_tok"),
          aggregate(col("tokens"), lit(0L), (acc, t) =>
            acc + coalesce(element_at(col("m"), dsirBucket(t)), lit(0L)))
            .as("w")))
      val thr = scored.agg(
        PRound.pround(expr("percentile(w, 0.8)"), 4).as("thr"))
      scored.crossJoin(broadcast(thr))
        .filter(col("w") >= col("thr"))
        .select(col("doc_id"), col("lang"), col("n_tok"), col("w"))
        .orderBy(col("doc_id"))
    },

    // Deterministic shard assignment — the final global shuffle before
    // tensors: shard = md5-slot(doc_id) mod 16 (16 divides the slot
    // modulus, so the reduction is exactly uniform over slots). The
    // report is the balance gate a shard write runs before committing:
    // per-shard doc/token totals plus the id spread proving the hash
    // mixes across the key range. One map-side-combined agg keyed on
    // the shard — at 100 TB this column IS the write partitioning
    // (partitionBy(shard)), never a repartition(rand()) whose
    // assignment dies with the job.
    "shuffle_shards" -> { (s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("n_tok"))
        .withColumn("shard", Sampling.shardOf(col("doc_id"), 16))
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"),
          min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
        .orderBy(col("shard"))
    },

    // Per-shard integrity MANIFEST — the receipt a corpus ship writes
    // next to the data (the handoff-manifest story at content level):
    // every shard carries doc/char totals plus two ORDER-FREE content
    // checksums over the docs' md5-48 prefixes — bit_xor (any single
    // flipped/swapped doc flips it) and a modular sum (catches the
    // xor blind spot: a doc duplicated an even number of times xors
    // away but still moves the sum and n_docs). A consumer re-derives
    // the manifest from what it received and diffs — no doc-level
    // compare, no ordering assumption (shards are written in parallel
    // and read partially). One map-side-combined agg on the shard key;
    // at 100 TB the manifest is 16 rows regardless of corpus size.
    "shards_manifest" -> { (s, dir) =>
      val h = conv(substring(md5(col("text")), 1, 12), 16, 10).cast("long")
      Tables.documents(s, dir)
        .select(col("doc_id"), col("n_chars"), h.as("h"))
        .withColumn("shard", Sampling.shardOf(col("doc_id"), 16))
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars"),
          expr("bit_xor(h)").as("h_xor"),
          sum(col("h") % 1000000007L).as("h_sum"))
        .orderBy(col("shard"))
    },

    // DPO/RLHF preference-PAIR mining — the dataset-construction step
    // of preference tuning: per language, rank docs by the heuristic
    // quality score and pair the i-th BEST with the i-th WORST
    // (chosen, rejected), carrying the quality margin. Rank-matched
    // extremes give the widest, most consistent margins (pairing
    // adjacent ranks gives near-zero margins a DPO loss can't learn
    // from). One window shuffle on the language key; the quartile
    // self-join runs on rank-sized frames. Scale honesty: the rank
    // bound is DYNAMIC (n/4 per language), so the window is a full
    // per-language sort — exact quartile pairing needs it. A capped
    // production run (top-K × bottom-K for literal K, the usual DPO
    // dataset shape) gets the WindowGroupLimit partial-top-k and
    // never sorts a language whole.
    "pref_pairs" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("q").desc, col("doc_id"))
      val ranked = Materialize.cut(Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"),
          TextAnalysis.qualityScore(col("text")).as("q"))
        .withColumn("rk", row_number().over(w).cast("long"))
        .withColumn("n", count(lit(1)).over(Window.partitionBy(col("lang")))))
      val k = (col("n") / lit(4)).cast("long")
      val chosen = ranked.filter(col("rk") <= k)
        .select(col("lang"), col("rk").as("i"),
          col("doc_id").as("chosen_doc"), col("q").as("q_chosen"))
      val rejected = ranked.filter(col("rk") > col("n") - k)
        .select(col("lang"), (col("n") - col("rk") + 1).as("i"),
          col("doc_id").as("rejected_doc"), col("q").as("q_rejected"))
      chosen.join(rejected, Seq("lang", "i"))
        .select(col("lang"), col("i").as("pair_id"), col("chosen_doc"),
          col("rejected_doc"), col("q_chosen"), col("q_rejected"),
          PRound.pround(col("q_chosen") - col("q_rejected"), 4).as("margin"))
        .orderBy(col("lang"), col("pair_id"))
    },

    // pref_pairs' PRODUCTION form: the rank bound is a LITERAL K=16
    // per side, so both windows get the WindowGroupLimit partial
    // top-k (each task keeps ≤16 rows per language before the final
    // per-language merge — no task ever sorts a language whole;
    // PlanShapeSpec pins the node). This is also the shape real DPO
    // dataset builds use — a capped pair count per domain, not a
    // quartile of the corpus.
    "pref_pairs_topk" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val k = 16
      val d = Materialize.cut(Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"),
          TextAnalysis.qualityScore(col("text")).as("q")))
      val best = Window.partitionBy(col("lang"))
        .orderBy(col("q").desc, col("doc_id"))
      val worst = Window.partitionBy(col("lang"))
        .orderBy(col("q").asc, col("doc_id").desc)
      val chosen = d.withColumn("i", row_number().over(best).cast("long"))
        .filter(col("i") <= k)
        .select(col("lang"), col("i"), col("doc_id").as("chosen_doc"),
          col("q").as("q_chosen"))
      val rejected = d.withColumn("i", row_number().over(worst).cast("long"))
        .filter(col("i") <= k)
        .select(col("lang"), col("i"), col("doc_id").as("rejected_doc"),
          col("q").as("q_rejected"))
      chosen.join(rejected, Seq("lang", "i"))
        .select(col("lang"), col("i").as("pair_id"), col("chosen_doc"),
          col("rejected_doc"), col("q_chosen"), col("q_rejected"),
          PRound.pround(col("q_chosen") - col("q_rejected"), 4).as("margin"))
        .orderBy(col("lang"), col("pair_id"))
    },

    // Multi-signal quality ENSEMBLE via reciprocal-rank fusion — the
    // combination step after individual gates (heuristic score,
    // lexical diversity, length prior): ranks fuse as Σ 1/(60+rank)
    // (RRF, Cormack et al. SIGIR 2009 — the same fusion search_hybrid
    // uses on retrieval lists, applied to quality signals), which
    // needs no score calibration across signals. Per-language ranking
    // (signals are not cross-lingually comparable); all four windows
    // share one language-keyed shuffle. Scale honesty (the
    // ntile_quartiles caveat): the three SIGNAL ranks are exact global
    // ranks per language — data-sized per language, because exact RRF
    // needs every doc's rank (only the final top-10 window gets the
    // WindowGroupLimit partial-top-k). At a billion docs per language
    // the production form replaces exact ranks with quantile-bucket
    // ranks from broadcast cuts (the orders_rfm discipline) at a small
    // RRF distortion; this query is the exact-rank reference.
    "quality_ensemble" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val toks = TextAnalysis.wsTokens(TextAnalysis.canonicalize(col("text")))
      def rk(c: String) = row_number().over(
        Window.partitionBy(col("lang")).orderBy(col(c).desc, col("doc_id")))
      val d = Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"),
          TextAnalysis.qualityScore(col("text")).as("q"),
          PRound.pround(
            size(array_distinct(toks)).cast("double") / size(toks), 4)
            .as("ttr"),
          size(toks).cast("long").as("n_words"))
        .withColumn("r_q", rk("q"))
        .withColumn("r_ttr", rk("ttr"))
        .withColumn("r_len", rk("n_words"))
        .withColumn("rrf", PRound.pround(
          lit(1.0) / (lit(60) + col("r_q")) +
            lit(1.0) / (lit(60) + col("r_ttr")) +
            lit(1.0) / (lit(60) + col("r_len")), 6))
      d.withColumn("final_rk", row_number().over(
          Window.partitionBy(col("lang"))
            .orderBy(col("rrf").desc, col("doc_id"))))
        .filter(col("final_rk") <= 10)
        .select(col("lang"), col("final_rk"), col("doc_id"),
          col("r_q"), col("r_ttr"), col("r_len"), col("rrf"))
        .orderBy(col("lang"), col("final_rk"))
    },

    // Pairwise-preference LEADERBOARD (the arena shape): sources play
    // matches — one representative doc per (bucket, source), every
    // source pair within a bucket is a match, higher quality score
    // wins (ties to the lower doc id) — and operators.BradleyTerry
    // fits strengths with 3 MM iterations (Hunter 2004), max-
    // normalized and 6-dp-rounded each round so the trajectory is
    // engine-exact. Match census ≈ buckets × source-pairs rows; the
    // fit runs entirely on |sources|-sized frames.
    "eval_bt_leaderboard" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("bucket"), col("source"))
        .orderBy(col("doc_id"))
      val reps = Materialize.cut(Tables.documents(s, dir)
        .select(col("doc_id"), col("source"),
          (col("doc_id") % 10).as("bucket"),
          TextAnalysis.qualityScore(col("text")).as("q"))
        .withColumn("__rk", row_number().over(w))
        .filter(col("__rk") === 1).drop("__rk"))
      val a = reps.select(col("bucket"), col("source").as("sa"),
        col("q").as("qa"), col("doc_id").as("da"))
      val b = reps.select(col("bucket"), col("source").as("sb"),
        col("q").as("qb"), col("doc_id").as("db"))
      val games = a.join(b, Seq("bucket"))
        .filter(col("sa") < col("sb"))
        .select(col("sa"), col("sb"),
          (col("qa") > col("qb") ||
            (col("qa") === col("qb") && col("da") < col("db")))
            .cast("long").as("win_a"))
      val directed = games
        .select(col("sa").as("i"), col("sb").as("j"), col("win_a").as("w"))
        .unionByName(games.select(col("sb").as("i"), col("sa").as("j"),
          (lit(1L) - col("win_a")).as("w")))
      val census = Materialize.cut(directed.groupBy(col("i"), col("j"))
        .agg(count(lit(1)).as("n"), sum(col("w")).as("w")))
      val strengths = BradleyTerry.fit(census, iters = 3)
      val totals = census.groupBy(col("i"))
        .agg(sum(col("n")).as("n_matches"), sum(col("w")).as("wins"))
      strengths.join(totals, Seq("i"))
        .select(col("i").as("source"), col("n_matches"), col("wins"),
          col("s").as("strength"))
        .withColumn("rank", row_number().over(
          Window.orderBy(col("strength").desc, col("source"))).cast("long"))
        .orderBy(col("rank"))
    })

  // -------------------------------------------------------------- oracles

  /** DuckDB value of the first 8 hex chars of md5(key) mod 10000 —
    * the Sampling.slot replay (cf. Layout.slotPred). */
  private[queries] def slotSql(keyExpr: String): String = {
    val h = s"md5(CAST($keyExpr AS VARCHAR))"
    val sum = (0 until 8).map { i =>
      val mult = 1L << (4 * (7 - i))
      s"(strpos('0123456789abcdef', substr($h, ${i + 1}, 1)) - 1) * $mult"
    }.mkString(" + ")
    s"(($sum) % 10000)"
  }

  private[queries] val toksSql =
    "[x for x in string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ') if x <> '']"

  /** Quality-score replay (the text_quality oracle formula) with
    * pass-through columns — shared by the preference/ensemble/
    * leaderboard oracles. Plain-string build: the regexes must not
    * pass through the s-interpolator. */
  private def qualitySql(extra: String): String =
    "SELECT doc_id" + extra + ",\n" +
      "  round(least(CASE WHEN n_words > 0 THEN stop / n_words ELSE 0 END" +
      " * 2, 1.0) * 0.4\n" +
      "    + least((CASE WHEN n_words > 0 THEN n_chars / n_words ELSE 0" +
      " END) / 8.0, 1.0) * 0.3\n" +
      "    + least(n_words / 100.0, 1.0) * 0.3, 4) AS q\n" +
      "  FROM (SELECT doc_id" + extra + ",\n" +
      "    CAST(len(" + toksSql + ") AS DOUBLE) AS n_words,\n" +
      "    CAST(length(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE)" +
      " AS n_chars,\n" +
      "    CAST(len(regexp_extract_all(lower(text)," +
      " '\\b(the|a|of|and|to|in)\\b')) AS DOUBLE) AS stop\n" +
      "  FROM documents)"

  /** Canonical-token list (lowercased, alnum-only, ws-collapsed) —
    * the wsTokens(canonicalize(text)) replay. */
  private val ctoksSql: String =
    "[x for x in string_split(trim(regexp_replace(regexp_replace(" +
      "lower(text), '[^a-z0-9 ]', ' ', 'g'), '\\s+', ' ', 'g')), ' ')" +
      " if x <> '']"

  /** Shared CDC oracle chain — replays Chunker.cdcChunks exactly:
    * 8-char Horner window hash (init 0, base 31, BIGINT-exact),
    * boundary at h ≡ 0 (mod 64), final boundary at n, chunks between
    * consecutive boundaries. Emits `cdc_chunks(doc_id, chunk)`.
    * The window hash is UNROLLED as eight plain multiply-adds
    * (Σ cp·31^k — max ~2.4e17, BIGINT-safe): the previous list_reduce
    * fold was in the DuckDB 1.0.0 lambda flake class the unigram
    * oracle escaped via recursive CTEs (VERDICT r14 #9); a fixed
    * 8-wide window needs no recursion at all. */
  private val cdcChainSql: String = {
    val pows = Seq(27512614111L, 887503681L, 28629151L, 923521L,
      29791L, 961L, 31L, 1L) // 31^7 .. 31^0
    val horner = pows.zipWithIndex.map { case (p, k) =>
      s"CAST(cps[CAST(i - ${7 - k} AS INT)] AS BIGINT) * $p"
    }.mkString(" + ")
    s"""base AS (
       |  SELECT doc_id,
       |    text || CASE WHEN doc_id % 5 = 0 THEN '$cdcBoiler' ELSE '' END
       |      AS t
       |  FROM documents),
       |d2 AS MATERIALIZED (
       |  SELECT doc_id, t, CAST(length(t) AS BIGINT) AS n,
       |    [unicode(x) for x in string_split_regex(t, '')] AS cps
       |  FROM base),
       |bset AS MATERIALIZED (
       |  SELECT doc_id, t, n,
       |    list_append(CASE WHEN n >= 8 THEN
       |      [i for i in generate_series(8, n)
       |       if i < n and ($horner) % 64 = 0]
       |      ELSE CAST([] AS BIGINT[]) END, n) AS bounds
       |  FROM d2),
       |cdc_chunks AS MATERIALIZED (
       |  SELECT doc_id,
       |    unnest([t[CASE WHEN j = 1 THEN 1
       |               ELSE CAST(bounds[CAST(j - 1 AS INT)] + 1 AS INT) END :
       |              CAST(bounds[CAST(j AS INT)] AS INT)]
       |            for j in generate_series(1, len(bounds))]) AS chunk
       |  FROM bset WHERE n > 0)""".stripMargin
  }

  /** The mm_mp3_duration FIXTURE column (ID3v2 + MPEG-1 L3 header +
    * CBR/Xing/VBRI stream shapes keyed on doc_id) — factored out so
    * [[graft.Mp3Split]] can time fixture synthesis separately from the
    * header probe (VERDICT r14 #8 adjudication). See the query's
    * comment for the byte-level contract. */
  private[graft] def mp3FixtureBlob: Column = {
    def be(v: Column, hexDigits: Int): Column = lpad(hex(v), hexDigits, "0")
    val tagSize = col("doc_id") % 2048L // crosses 127: 2 syncsafe bytes
    val brIdx = col("doc_id") % 14L + 1L
    val srIdx = col("doc_id") % 3L
    val mono = col("doc_id") % 2 === 0
    val modeSel = col("doc_id") % 3L // 0 cbr, 1 xing/info, 2 vbri
    val frames = col("doc_id") % 5000L + 100L
    // side-info zeros: the real 17/32 for CBR/Xing; VBRI's tag sits
    // at the FIXED 32-byte offset, so VBRI docs pad 32 regardless
    val sideZeros = expr("repeat('00', CASE WHEN doc_id % 3 = 2 THEN 32 " +
      "WHEN doc_id % 2 = 0 THEN 17 ELSE 32 END)")
    val vbrBlock = when(modeSel === 1L,
        concat(when(mono, lit("496E666F")).otherwise(lit("58696E67")),
          lit("00000001"), be(frames, 8)))
      .when(modeSel === 2L,
        concat(lit("56425249"), lit("0001"), lit("0000"), lit("0000"),
          lit("00000000"), be(frames, 8)))
      .otherwise(lit(""))
    unhex(concat(
      lit("494433"), lit("0400"), lit("00"),      // "ID3" v2.4, flags
      lit("0000"),                                 // syncsafe b7, b8
      be(shiftright(tagSize, 7), 2),               // syncsafe b9
      be(tagSize.bitwiseAND(lit(127L)), 2),        // syncsafe b10
      expr("repeat('00', cast(doc_id % 2048 as int))"), // tag padding
      lit("FFFB"),                                 // sync, MPEG-1 L3
      be(brIdx * 16L + srIdx * 4L, 2),             // bitrate|rate idx
      when(mono, lit("C0")).otherwise(lit("00")),  // channel mode
      sideZeros, vbrBlock,
      expr("repeat('00', cast(doc_id % 600 + 100 as int))")))
  }

  /** Shared CTE chain of the BPE oracle pair: canon -> words -> char
    * tokens -> census/merge/fold x3 (occurrence-level; equals the
    * query's freq-weighted vocabulary computation bit-for-bit). */
  /** Unigram-LM oracle chain: the trainer's fixed-round hard-EM
    * unrolled as MATERIALIZED CTEs (the bpeLearnSql / graph_lpa
    * precedent). The Viterbi DP runs as two list_reduce folds — the
    * forward scores over a BIGINT list (sentinel [0] = empty-prefix
    * cost) and the backtrace over a VARCHAR list ([remaining_pos,
    * piece...]; DuckDB 1.0 mis-binds STRUCT field access inside
    * nested list expressions in list_reduce lambdas, so state rides a
    * list). Candidate lengths 1..4 are unrolled in both engines. */
  private object UnigramSql {
    private val Inf = UnigramLm.Inf.toString

    private def hit(l: Int): String =
      s"(CAST(acc[1] AS INT) >= $l AND coalesce(" +
        s"s[CAST(acc[1] AS INT) - $l + 1] + " +
        s"map_extract(m, CAST((CAST(acc[1] AS INT)-$l+1)*10+$l AS BIGINT))[1], -1) " +
        "= s[CAST(acc[1] AS INT) + 1])"

    private val choose =
      s"(CASE WHEN ${hit(4)} THEN 4 WHEN ${hit(3)} THEN 3 WHEN ${hit(2)} THEN 2 ELSE 1 END)"

    private def cand(l: Int): String =
      s"CASE WHEN x[1] >= $l THEN coalesce(" +
        s"acc[CAST(x[1] AS INT) - $l + 1] + " +
        s"map_extract(m, CAST((x[1]-$l+1)*10+$l AS BIGINT))[1], $Inf) ELSE $Inf END"

    // Viterbi DP as RECURSIVE CTEs, not list_reduce folds (round-13
    // session 3): DuckDB 1.0.0's list_reduce lambda evaluation can
    // contaminate rows ACROSS a vector chunk under multi-query
    // process state — observed twice live (a score off by ~1% in a
    // 352-oracle run; another word's backtrace bound to 'customer' at
    // sf0.01), both unreproducible in isolation. The recursive form
    // iterates positions as ROWS with only plain expressions
    // (list indexing, map_extract, CASE) — no lambdas anywhere, so
    // the buggy code path is never entered. Interfaces unchanged:
    // fwd$r = (w, freq, m, s), seg$r = (w, freq, score, tr).
    private def rcand(l: Int): String =
      s"CASE WHEN p + 1 >= $l THEN coalesce(" +
        s"s[p + 2 - $l] + map_extract(m, CAST((p + 2 - $l)*10 + $l AS BIGINT))[1], $Inf) " +
        s"ELSE $Inf END"

    private def rhit(l: Int): String =
      s"(p >= $l AND coalesce(" +
        s"s[p - $l + 1] + map_extract(m, CAST((p - $l + 1)*10 + $l AS BIGINT))[1], -1) " +
        "= s[p + 1])"

    private val rchoose =
      s"(CASE WHEN ${rhit(4)} THEN 4 WHEN ${rhit(3)} THEN 3 WHEN ${rhit(2)} THEN 2 ELSE 1 END)"

    private def viterbi(r: Int, cost: String): String =
      s"""map$r AS MATERIALIZED (
  SELECT s.w, s.freq, map_from_entries(list(struct_pack(k := CAST(s.i*10 + s.len AS BIGINT), v := c.cost))) AS m
  FROM spans s JOIN $cost c ON c.piece = s.piece
  GROUP BY s.w, s.freq),
fwdrec$r AS (
  SELECT w, freq, m, length(w) AS n, 0 AS p, [CAST(0 AS BIGINT)] AS s
  FROM map$r
  UNION ALL
  SELECT w, freq, m, n, p + 1,
    s || [LEAST(${rcand(1)}, ${rcand(2)}, ${rcand(3)}, ${rcand(4)})]
  FROM fwdrec$r WHERE p < n),
fwd$r AS MATERIALIZED (
  SELECT w, freq, m, s FROM fwdrec$r WHERE p = n),
segrec$r AS (
  SELECT w, freq, m, s, s[length(w) + 1] AS score, length(w) AS p,
    CAST([] AS VARCHAR[]) AS pieces
  FROM fwd$r
  UNION ALL
  SELECT w, freq, m, s, score, p - ch,
    list_prepend(substr(w, p - ch + 1, ch), pieces)
  FROM (SELECT *, $rchoose AS ch FROM segrec$r WHERE p > 0)),
seg$r AS MATERIALIZED (
  SELECT w, freq, score, list_prepend('0', pieces) AS tr
  FROM segrec$r WHERE p = 0)"""

    private def em(r: Int): String =
      s"""cnt$r AS MATERIALIZED (
  SELECT piece, CAST(sum(freq) AS BIGINT) AS cnt FROM (
    SELECT freq, unnest(tr[2:]) AS piece FROM seg$r)
  GROUP BY piece),
vocab$r AS MATERIALIZED (
  SELECT ch.piece, coalesce(c.cnt, 1) AS cnt FROM chars ch LEFT JOIN cnt$r c ON c.piece = ch.piece
  UNION ALL
  SELECT piece, cnt FROM cnt$r WHERE length(piece) > 1),
cost$r AS MATERIALIZED (
  SELECT piece, cnt, CAST(round(-ln(CAST(cnt AS DOUBLE) / t.total) * 1000000) AS BIGINT) AS cost
  FROM vocab$r, (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM vocab$r) t)"""

    // CTE named ucanon (not canon): the tokenizer_compare oracle
    // composes this chain WITH bpeLearnSql, which owns `canon`
    private val base =
      """ucanon AS (
  SELECT trim(regexp_replace(regexp_replace(lower(text),
    '[^a-z0-9 ]', ' ', 'g'), '\s+', ' ', 'g')) AS c
  FROM documents),
wordsu AS (
  SELECT unnest([x FOR x IN string_split(c, ' ') IF x <> '']) AS w FROM ucanon),
census AS MATERIALIZED (SELECT w, count(*) AS freq FROM wordsu GROUP BY w),
spans AS MATERIALIZED (
  SELECT w, freq, u.i AS i, u.len AS len, u.piece AS piece FROM (
    SELECT w, freq, unnest(flatten(list_transform(generate_series(1, length(w)), i ->
      [struct_pack(i := i, len := l, piece := substr(w, i, l))
       for l in generate_series(1, 4) if i + l - 1 <= length(w)]))) AS u
    FROM census)),
seed AS (SELECT piece, CAST(sum(freq) AS BIGINT) AS cnt FROM spans GROUP BY piece),
vocab0 AS MATERIALIZED (
  SELECT piece, cnt FROM seed WHERE length(piece) = 1
  UNION ALL
  SELECT piece, cnt FROM (SELECT piece, cnt FROM seed WHERE length(piece) > 1
    ORDER BY cnt DESC, piece LIMIT 24)),
chars AS MATERIALIZED (SELECT DISTINCT piece FROM spans WHERE len = 1),
cost0 AS MATERIALIZED (
  SELECT piece, cnt, CAST(round(-ln(CAST(cnt AS DOUBLE) / t.total) * 1000000) AS BIGINT) AS cost
  FROM vocab0, (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM vocab0) t)"""

    val chain = Seq(base, viterbi(1, "cost0"), em(1),
      viterbi(2, "cost1"), em(2), viterbi(3, "cost2")).mkString(",\n")

    val train: String =
      s"WITH RECURSIVE $chain\nSELECT piece, cnt, cost FROM cost2 ORDER BY cnt DESC, piece"

    val apply: String =
      s"WITH RECURSIVE $chain\nSELECT w, CAST(freq AS BIGINT) AS freq, " +
        "array_to_string(tr[2:], ' ') AS seg, CAST(len(tr) - 1 AS INT) AS n_pieces, score " +
        "FROM seg3 ORDER BY w"

    /** Per-language fertility under the trained model: the shared EM
      * chain's seg3 joined to a per-language word census. */
    val fertility: String =
      s"""WITH RECURSIVE $chain,
         |lcanon AS (
         |  SELECT lang, trim(regexp_replace(regexp_replace(lower(text),
         |    '[^a-z0-9 ]', ' ', 'g'), '\\s+', ' ', 'g')) AS c
         |  FROM documents),
         |lcensus AS (
         |  SELECT lang, w, count(*) AS freql FROM (
         |    SELECT lang, unnest([x FOR x IN string_split(c, ' ') IF x <> '']) AS w
         |    FROM lcanon)
         |  GROUP BY 1, 2),
         |j AS (
         |  SELECT l.lang, l.freql, CAST(len(s.tr) - 1 AS BIGINT) AS np
         |  FROM lcensus l JOIN seg3 s ON s.w = l.w)
         |SELECT lang, CAST(sum(freql) AS BIGINT) AS n_words,
         |  CAST(sum(freql * np) AS BIGINT) AS n_pieces,
         |  round(CAST(sum(freql * np) AS DOUBLE) / sum(freql), 6) AS fertility
         |FROM j GROUP BY lang ORDER BY lang""".stripMargin
  }

  private val bpeLearnSql =
    """canon AS (
       |  SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text),
       |    '[^a-z0-9 ]', ' ', 'g'), '\s+', ' ', 'g')) AS c
       |  FROM documents),
       |words AS (
       |  SELECT doc_id, unnest([x FOR x IN string_split(c, ' ') IF x <> '']) AS w
       |  FROM canon),
       |tok1 AS (
       |  SELECT doc_id, w,
       |    list_transform(generate_series(1, length(w)), i -> substr(w, i, 1)) AS t
       |  FROM words),
       |c1 AS (
       |  SELECT u.x AS x, u.y AS y, count(*) AS cnt FROM (
       |    SELECT unnest(list_transform(generate_series(1, len(t) - 1),
       |      i -> struct_pack(x := t[i], y := t[i + 1]))) AS u
       |    FROM tok1 WHERE len(t) >= 2)
       |  GROUP BY 1, 2),
       |m1 AS (SELECT x, y, cnt FROM c1 ORDER BY cnt DESC, x, y LIMIT 1),
       |tok2 AS (
       |  SELECT doc_id, w, string_split(list_reduce(t, (acc, tk) -> CASE
       |      WHEN (acc = m.x OR ends_with(acc, '|' || m.x)) AND tk = m.y
       |        THEN acc || m.y
       |      ELSE acc || '|' || tk END), '|') AS t
       |  FROM tok1 CROSS JOIN m1 m),
       |c2 AS (
       |  SELECT u.x AS x, u.y AS y, count(*) AS cnt FROM (
       |    SELECT unnest(list_transform(generate_series(1, len(t) - 1),
       |      i -> struct_pack(x := t[i], y := t[i + 1]))) AS u
       |    FROM tok2 WHERE len(t) >= 2)
       |  GROUP BY 1, 2),
       |m2 AS (SELECT x, y, cnt FROM c2 ORDER BY cnt DESC, x, y LIMIT 1),
       |tok3 AS (
       |  SELECT doc_id, w, string_split(list_reduce(t, (acc, tk) -> CASE
       |      WHEN (acc = m.x OR ends_with(acc, '|' || m.x)) AND tk = m.y
       |        THEN acc || m.y
       |      ELSE acc || '|' || tk END), '|') AS t
       |  FROM tok2 CROSS JOIN m2 m),
       |c3 AS (
       |  SELECT u.x AS x, u.y AS y, count(*) AS cnt FROM (
       |    SELECT unnest(list_transform(generate_series(1, len(t) - 1),
       |      i -> struct_pack(x := t[i], y := t[i + 1]))) AS u
       |    FROM tok3 WHERE len(t) >= 2)
       |  GROUP BY 1, 2),
       |m3 AS (SELECT x, y, cnt FROM c3 ORDER BY cnt DESC, x, y LIMIT 1)""".stripMargin

  /** The byte-level BPE learn chain (bpe_bytes_train/_apply oracles):
    * the bpeLearnSql shape over UTF-8 BYTE tokens — words are RAW
    * whitespace tokens of text + the planted multi-byte suffix, and
    * iteration-0 tokens are the 2-hex-char bytes of hex(encode(w)).
    * The list_reduce merge fold is the documented bpe-oracle residual
    * (never flaked; recursive rewrite on first incident). */
  private val bpeBytesLearnSql: String = {
    def census(tok: String, c: String): String =
      s"""$c AS (
         |  SELECT u.x AS x, u.y AS y, count(*) AS cnt FROM (
         |    SELECT unnest(list_transform(generate_series(1, len(t) - 1),
         |      i -> struct_pack(x := t[i], y := t[i + 1]))) AS u
         |    FROM $tok WHERE len(t) >= 2)
         |  GROUP BY 1, 2)""".stripMargin
    def fold(prev: String, m: String, tok: String): String =
      s"""$tok AS (
         |  SELECT doc_id, w, string_split(list_reduce(t, (acc, tk) -> CASE
         |      WHEN (acc = m.x OR ends_with(acc, '|' || m.x)) AND tk = m.y
         |        THEN acc || m.y
         |      ELSE acc || '|' || tk END), '|') AS t
         |  FROM $prev CROSS JOIN $m m)""".stripMargin
    s"""bwords AS (
       |  SELECT doc_id, unnest([x FOR x IN string_split(trim(
       |    regexp_replace(text || ' naïve中文tör' || (doc_id % 3),
       |      '\\s+', ' ', 'g')), ' ') IF x <> '']) AS w
       |  FROM documents),
       |btok1 AS (
       |  SELECT doc_id, w,
       |    list_transform(generate_series(1, CAST(strlen(w) AS INT)),
       |      i -> substr(hex(encode(w)), 2 * i - 1, 2)) AS t
       |  FROM bwords),
       |${census("btok1", "bc1")},
       |bm1 AS (SELECT x, y, cnt FROM bc1 ORDER BY cnt DESC, x, y LIMIT 1),
       |${fold("btok1", "bm1", "btok2")},
       |${census("btok2", "bc2")},
       |bm2 AS (SELECT x, y, cnt FROM bc2 ORDER BY cnt DESC, x, y LIMIT 1),
       |${fold("btok2", "bm2", "btok3")},
       |${census("btok3", "bc3")},
       |bm3 AS (SELECT x, y, cnt FROM bc3 ORDER BY cnt DESC, x, y LIMIT 1),
       |${fold("btok3", "bm3", "btok4")}""".stripMargin
  }

  /** Heuristic-teacher labeling for the NB quality filter: tokens +
    * the gate label (qualityScore >= 0.4 → "good", else "bad" — 0.4
    * sits near the corpus median, so both classes are populated at
    * every SF). */
  private def nbLabeledDocs(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(col("doc_id"),
        TextAnalysis.wsTokens(col("text")).as("tokens"),
        TextAnalysis.qualityScore(col("text")).as("q"))
      .withColumn("label",
        when(col("q") >= 0.4, lit("good")).otherwise(lit("bad")))

  /** The hash-split 80% train slice (slot >= 2000 — splitLabel's
    * "train" side), so the filter is trained on held-in docs and can
    * be evaluated on the held-out 20% like a real teacher-student
    * gate. */
  private def nbTrainDocs(s: SparkSession, dir: String): DataFrame =
    nbTrainSlice(nbLabeledDocs(s, dir))

  private def nbTrainSlice(labeled: DataFrame): DataFrame =
    Sampling.splitLabel(labeled, "doc_id", 2000)
      .filter(col("split") === "train")

  private def nbHeldSlice(labeled: DataFrame): DataFrame =
    Sampling.splitLabel(labeled, "doc_id", 2000)
      .filter(col("split") === "test")

  /** Labeled docs featurized ONCE per query (r16, the langid pattern):
    * the train slice and the scored side are separate plans with no
    * exchange to reuse, so without the cut the wsTokens+qualityScore
    * pass ran twice per query. */
  private def nbLabeledCut(s: SparkSession, dir: String): DataFrame =
    graft.operators.Materialize.cut(nbLabeledDocs(s, dir))

  /** (doc_id, lang, tokens) over the canonicalized corpus — the token
    * stream both KN legs consume (the text_lm_score canon). */
  private def knDocs(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(col("doc_id"), col("lang"),
        TextAnalysis.wsTokens(TextAnalysis.canonicalize(col("text")))
          .as("tokens"))
      .filter(size(col("tokens")) >= 1)

  /** The KN target-domain train slice: the English documents (CCNet
    * trains its KenLM on the target corpus, not the crawl). */
  private def knTargetDocs(s: SparkSession, dir: String): DataFrame =
    knDocs(s, dir).filter(col("lang") === "en")

  /** The whole corpus scored under the en-trained KN model —
    * (doc_id, lang, n_bg, cost, avg_nats), shared by lm_kn_score and
    * ccnet_buckets. */
  private def knScoredDocs(s: SparkSession, dir: String): DataFrame =
    KneserNey.score(knDocs(s, dir), KneserNey.train(knTargetDocs(s, dir)),
        keyCols = Seq("doc_id", "lang"))
      .select(col("doc_id"), col("lang"), col("n_bg"), col("cost"),
        col("avg_nats"))

  /** md5 feature bucket 0..255 — the text_feature_hash idiom (last two
    * hex digits), shared by both DSIR legs. */
  private def dsirBucket(w: Column): Column =
    conv(substring(md5(w), 31, 2), 16, 10).cast("long")

  /** The DSIR per-bucket importance table (bucket, cnt_target,
    * cnt_raw, w): one token-occurrence census with a target flag, then
    * two add-one hashed-unigram LMs whose micro-nat cost difference is
    * the importance weight. Census-bounded (256 rows out). */
  private def dsirWeightTable(s: SparkSession, dir: String): DataFrame = {
    def mn(p: Column): Column = PRound.pround(-log(p) * 1e6, 0).cast("long")
    val occ = knDocs(s, dir)
      .select(col("lang"), explode(col("tokens")).as("tok"))
      .select(dsirBucket(col("tok")).as("bucket"),
        (col("lang") === "en").cast("long").as("is_t"))
    val census = occ.groupBy(col("bucket"))
      .agg(count(lit(1)).as("cnt_raw"), sum(col("is_t")).as("cnt_target"))
    val tots = census.agg(sum(col("cnt_raw")).as("tot_r"),
      sum(col("cnt_target")).as("tot_t"))
    census.crossJoin(broadcast(tots))
      .select(col("bucket"), col("cnt_target"), col("cnt_raw"),
        (mn((col("cnt_raw") + 1).cast("double") / (col("tot_r") + lit(256)))
          - mn((col("cnt_target") + 1).cast("double") /
              (col("tot_t") + lit(256)))).as("w"))
  }

  /** quality_adaptive's oracle, shared verbatim by the store-served
    * variant — stored cuts are bit-identical to the fresh build. */
  private val qualityAdaptiveSql =
    """WITH stats AS (
      |  SELECT lang,
      |    CAST(len([x for x in string_split(trim(regexp_replace(text,
      |      '\s+', ' ', 'g')), ' ') if x <> '']) AS DOUBLE) AS n_words,
      |    CAST(length(regexp_replace(text, '\s', '', 'g')) AS DOUBLE) AS n_chars,
      |    CAST(len(regexp_extract_all(lower(text),
      |      '\b(the|a|of|and|to|in)\b')) AS DOUBLE) AS stop
      |  FROM documents),
      |scored AS (
      |  SELECT lang,
      |    round(least(CASE WHEN n_words > 0 THEN stop / n_words ELSE 0 END * 2, 1.0) * 0.4
      |        + least((CASE WHEN n_words > 0 THEN n_chars / n_words ELSE 0 END) / 8.0, 1.0) * 0.3
      |        + least(n_words / 100.0, 1.0) * 0.3, 4) AS q
      |  FROM stats),
      |thr AS (
      |  SELECT lang, round(quantile_cont(q, 0.25), 4) AS thr
      |  FROM scored GROUP BY lang)
      |SELECT s.lang, max(t.thr) AS thr, count(*) AS n_docs,
      |  CAST(sum(CASE WHEN s.q >= t.thr THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
      |FROM scored s JOIN thr t ON t.lang = s.lang
      |GROUP BY s.lang ORDER BY s.lang""".stripMargin

  /** Shared CTE chain of the NB oracle pair: heuristic labeling →
    * hash-split train slice → token census → integer micro-nat model
    * table (real tokens + __prior__/__unseen__ pseudo rows). census
    * and model are MATERIALIZED — both are referenced more than once
    * downstream and DuckDB inlines plain CTEs. */
  private val nbModelSql =
    s"""stats AS (
       |  SELECT doc_id, text,
       |    CAST(len($toksSql) AS DOUBLE) AS n_words,
       |    CAST(length(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE) AS n_chars,
       |    CAST(len(regexp_extract_all(lower(text),
       |      '\\b(the|a|of|and|to|in)\\b')) AS DOUBLE) AS stop
       |  FROM documents),
       |labeled AS (
       |  SELECT doc_id, $toksSql AS tokens,
       |    CASE WHEN round(
       |        least(CASE WHEN n_words > 0 THEN stop / n_words ELSE 0 END * 2, 1.0) * 0.4
       |      + least((CASE WHEN n_words > 0 THEN n_chars / n_words ELSE 0 END) / 8.0, 1.0) * 0.3
       |      + least(n_words / 100.0, 1.0) * 0.3, 4) >= 0.4
       |      THEN 'good' ELSE 'bad' END AS label
       |  FROM stats),
       |train AS (
       |  SELECT * FROM labeled WHERE ${slotSql("doc_id")} >= 2000),
       |census AS MATERIALIZED (
       |  SELECT label, token, count(*) AS cnt
       |  FROM (SELECT label, unnest(tokens) AS token FROM train)
       |  WHERE token NOT IN ('__prior__', '__unseen__')
       |  GROUP BY label, token),
       |totals AS (
       |  SELECT label, CAST(sum(cnt) AS BIGINT) AS total
       |  FROM census GROUP BY label),
       |vocab AS (
       |  SELECT CAST(count(DISTINCT token) AS BIGINT) AS v FROM census),
       |model AS MATERIALIZED (
       |  SELECT c.label, c.token, CAST(c.cnt AS BIGINT) AS cnt,
       |    CAST(round(-ln((c.cnt + 1.0) / (t.total + v.v)) * 1e6) AS BIGINT) AS cost
       |  FROM census c JOIN totals t ON t.label = c.label CROSS JOIN vocab v
       |  UNION ALL
       |  SELECT n.label, '__prior__', CAST(n.n AS BIGINT),
       |    CAST(round(-ln(CAST(n.n AS DOUBLE) / a.n_all) * 1e6) AS BIGINT)
       |  FROM (SELECT label, count(*) AS n FROM train GROUP BY label) n
       |  CROSS JOIN (SELECT CAST(count(*) AS DOUBLE) AS n_all FROM train) a
       |  UNION ALL
       |  SELECT t.label, '__unseen__', CAST(0 AS BIGINT),
       |    CAST(round(-ln(1.0 / (t.total + v.v)) * 1e6) AS BIGINT)
       |  FROM totals t CROSS JOIN vocab v)""".stripMargin

  /** The full apply-leg oracle — shared by `quality_nb_apply` and
    * `quality_nb_stored` (serve ≡ build: stored params are
    * bit-identical to the fresh build). */
  private val nbApplySql =
    s"""WITH $nbModelSql,
       |percls AS (
       |  SELECT d.doc_id, l.label AS cls,
       |    CAST(sum(coalesce(m.cost, u.cost)) AS BIGINT) AS tc
       |  FROM (SELECT doc_id, unnest(tokens) AS token FROM labeled) d
       |  CROSS JOIN (VALUES ('bad'), ('good')) l(label)
       |  JOIN model u ON u.label = l.label AND u.token = '__unseen__'
       |  LEFT JOIN model m ON m.label = l.label AND m.token = d.token
       |    AND m.token NOT IN ('__prior__', '__unseen__')
       |  GROUP BY d.doc_id, l.label),
       |costs AS (
       |  SELECT b.doc_id, b.label,
       |    pb.cost + coalesce(cb.tc, 0) AS cost_bad,
       |    pg.cost + coalesce(cg.tc, 0) AS cost_good
       |  FROM labeled b
       |  JOIN model pb ON pb.label = 'bad' AND pb.token = '__prior__'
       |  JOIN model pg ON pg.label = 'good' AND pg.token = '__prior__'
       |  LEFT JOIN percls cb ON cb.doc_id = b.doc_id AND cb.cls = 'bad'
       |  LEFT JOIN percls cg ON cg.doc_id = b.doc_id AND cg.cls = 'good')
       |SELECT doc_id, label,
       |  CASE WHEN cost_good < cost_bad THEN 'good' ELSE 'bad' END AS pred,
       |  CAST(cost_bad AS BIGINT) AS cost_bad,
       |  CAST(cost_good AS BIGINT) AS cost_good
       |FROM costs ORDER BY doc_id""".stripMargin

  /** Shared CTE chain of the KN oracle family: canonicalized English
    * token stream → bigram census → fan-out/fan-in censuses → the
    * micro-nat parameter table (the KneserNey.train replay, D = 0.75).
    * bi and params are MATERIALIZED — both fan out downstream and
    * DuckDB inlines plain CTEs. `src` parameterizes the corpus table so
    * the capstone can train/score on its deduped survivor frame. */
  private def knParamsSqlFrom(src: String) =
    s"""encanon AS (
      |  SELECT trim(regexp_replace(regexp_replace(lower(text),
      |    '[^a-z0-9 ]', ' ', 'g'), '\\s+', ' ', 'g')) AS c
      |  FROM $src WHERE lang = 'en'),
      |entoks AS (
      |  SELECT list_prepend('<s>',
      |    [x for x in string_split(c, ' ') if x <> '']) AS t
      |  FROM encanon WHERE c <> ''),
      |bg AS (
      |  SELECT unnest(t[1:len(t)-1]) AS w1, unnest(t[2:len(t)]) AS w2
      |  FROM entoks),
      |bi AS MATERIALIZED (
      |  SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY 1, 2),
      |fol AS MATERIALIZED (
      |  SELECT w1, CAST(sum(c2) AS BIGINT) AS tot, count(*) AS n1f
      |  FROM bi GROUP BY 1),
      |pre AS MATERIALIZED (
      |  SELECT w2, count(*) AS n1p FROM bi GROUP BY 1),
      |btot AS (SELECT CAST(count(*) AS BIGINT) AS b FROM bi),
      |params AS MATERIALIZED (
      |  SELECT 'bi' AS kind, bi.w1, bi.w2, CAST(bi.c2 AS BIGINT) AS cnt,
      |    CAST(round(-ln((bi.c2 - 0.75) / fol.tot
      |      + (0.75 * fol.n1f / fol.tot)
      |        * (pre.n1p / CAST(bt.b AS DOUBLE))) * 1e6) AS BIGINT) AS cost
      |  FROM bi JOIN fol USING (w1) JOIN pre USING (w2) CROSS JOIN btot bt
      |  UNION ALL
      |  SELECT 'bo', w1, '', CAST(n1f AS BIGINT),
      |    CAST(round(-ln(0.75 * n1f / tot) * 1e6) AS BIGINT) FROM fol
      |  UNION ALL
      |  SELECT 'cont', '', w2, CAST(n1p AS BIGINT),
      |    CAST(round(-ln(n1p / CAST(bt.b AS DOUBLE)) * 1e6) AS BIGINT)
      |  FROM pre CROSS JOIN btot bt
      |  UNION ALL
      |  SELECT 'unk', '', '', CAST(0 AS BIGINT),
      |    CAST(round(-ln(1.0 / (bt.b + 1)) * 1e6) AS BIGINT)
      |  FROM btot bt)""".stripMargin

  private val knParamsSql = knParamsSqlFrom("documents")

  /** The whole-corpus scoring chain appended to [[knParamsSqlFrom]]:
    * seen pair → fused cost; else backoff(w1) + continuation(w2) with
    * the OOV floor — the KneserNey.score replay. `src` as above. */
  private def knScoredSqlFrom(src: String) =
    s"""dcanon AS (
      |  SELECT doc_id, lang, trim(regexp_replace(regexp_replace(lower(text),
      |    '[^a-z0-9 ]', ' ', 'g'), '\\s+', ' ', 'g')) AS c
      |  FROM $src),
      |dtoks AS (
      |  SELECT doc_id, lang, list_prepend('<s>',
      |    [x for x in string_split(c, ' ') if x <> '']) AS t
      |  FROM dcanon WHERE c <> ''),
      |dbg AS (
      |  SELECT doc_id, unnest(t[1:len(t)-1]) AS w1, unnest(t[2:len(t)]) AS w2
      |  FROM dtoks),
      |term AS (
      |  SELECT d.doc_id,
      |    coalesce(p.cost, coalesce(bo.cost, 0) + coalesce(ct.cost, u.cost))
      |      AS cost
      |  FROM dbg d
      |  LEFT JOIN params p ON p.kind = 'bi' AND p.w1 = d.w1 AND p.w2 = d.w2
      |  LEFT JOIN params bo ON bo.kind = 'bo' AND bo.w1 = d.w1
      |  LEFT JOIN params ct ON ct.kind = 'cont' AND ct.w2 = d.w2
      |  CROSS JOIN (SELECT cost FROM params WHERE kind = 'unk') u),
      |dscore AS (
      |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bg,
      |    CAST(sum(cost) AS BIGINT) AS cost
      |  FROM term GROUP BY doc_id),
      |scored AS MATERIALIZED (
      |  SELECT dt.doc_id, dt.lang, s.n_bg, s.cost,
      |    round(CAST(s.cost AS DOUBLE) / s.n_bg / 1e6, 6) AS avg_nats
      |  FROM dtoks dt JOIN dscore s USING (doc_id))""".stripMargin

  private val knScoredSql = knScoredSqlFrom("documents")

  /** Shared CTE chain of the DSIR oracle pair: canonical token
    * occurrences → md5 bucket (the text_feature_hash nib idiom) →
    * flagged census → micro-nat importance table. */
  private val dsirSql = {
    def nib(i: Int) =
      s"(strpos('0123456789abcdef', substr(md5(w), $i, 1)) - 1)"
    s"""ccanon AS (
       |  SELECT doc_id, lang, trim(regexp_replace(regexp_replace(lower(text),
       |    '[^a-z0-9 ]', ' ', 'g'), '\\s+', ' ', 'g')) AS c
       |  FROM documents),
       |ctoks AS (
       |  SELECT doc_id, lang,
       |    [x for x in string_split(c, ' ') if x <> ''] AS t
       |  FROM ccanon WHERE c <> ''),
       |bocc AS (
       |  SELECT doc_id, lang, (${nib(31)} * 16 + ${nib(32)}) AS bucket
       |  FROM (SELECT doc_id, lang, unnest(t) AS w FROM ctoks)),
       |census AS MATERIALIZED (
       |  SELECT bucket, count(*) AS cnt_raw,
       |    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
       |      AS cnt_target
       |  FROM bocc GROUP BY 1),
       |tots AS (
       |  SELECT CAST(sum(cnt_raw) AS BIGINT) AS tot_r,
       |    CAST(sum(cnt_target) AS BIGINT) AS tot_t FROM census),
       |wtab AS MATERIALIZED (
       |  SELECT CAST(bucket AS BIGINT) AS bucket, cnt_target,
       |    CAST(cnt_raw AS BIGINT) AS cnt_raw,
       |    CAST(round(-ln((cnt_raw + 1.0) / (tot_r + 256)) * 1e6) AS BIGINT)
       |      - CAST(round(-ln((cnt_target + 1.0) / (tot_t + 256)) * 1e6)
       |          AS BIGINT) AS w
       |  FROM census CROSS JOIN tots)""".stripMargin
  }

  def oracle: Map[String, String] = Map(
    "unigram_train" -> UnigramSql.train,
    "unigram_apply" -> UnigramSql.apply,
    // store-served segmentation is bit-identical to the fresh build —
    // the stored variant shares the apply oracle (the
    // winsorize_stored / quality_nb_stored discipline)
    "unigram_stored" -> UnigramSql.apply,
    "tokenizer_fertility" -> UnigramSql.fertility,

    // both chains composed in one WITH: the unigram EM (ucanon-named
    // base so the BPE chain keeps `canon`) + the 3-merge BPE fold
    "tokenizer_compare" ->
      s"""WITH RECURSIVE ${UnigramSql.chain},
         |$bpeLearnSql,
         |tok4 AS (
         |  SELECT doc_id, w, string_split(list_reduce(t, (acc, tk) -> CASE
         |      WHEN (acc = m.x OR ends_with(acc, '|' || m.x)) AND tk = m.y
         |        THEN acc || m.y
         |      ELSE acc || '|' || tk END), '|') AS t
         |  FROM tok3 CROSS JOIN m3 m),
         |bpe AS (
         |  SELECT w, min(len(t)) AS nb, count(*) AS bfreq
         |  FROM tok4 GROUP BY w),
         |uni AS (
         |  SELECT w, CAST(len(tr) - 1 AS BIGINT) AS nu FROM seg3),
         |j AS (
         |  SELECT least(length(b.w), 10) AS bucket, b.bfreq, b.nb, u.nu
         |  FROM bpe b JOIN uni u ON u.w = b.w)
         |SELECT CAST(bucket AS BIGINT) AS wlen_bucket, count(*) AS n_types,
         |  CAST(sum(bfreq) AS BIGINT) AS n_occurrences,
         |  CAST(sum(bfreq * nb) AS BIGINT) AS bpe_pieces,
         |  CAST(sum(bfreq * nu) AS BIGINT) AS uni_pieces,
         |  round(CAST(sum(bfreq * nb) AS DOUBLE) / sum(bfreq), 4)
         |    AS bpe_fertility,
         |  round(CAST(sum(bfreq * nu) AS DOUBLE) / sum(bfreq), 4)
         |    AS uni_fertility
         |FROM j GROUP BY bucket ORDER BY wlen_bucket""".stripMargin,

    "dsir_weights" ->
      s"""WITH $dsirSql
         |SELECT bucket, cnt_target, cnt_raw, w FROM wtab
         |ORDER BY bucket""".stripMargin,

    "dsir_select" ->
      s"""WITH $dsirSql,
         |docw AS MATERIALIZED (
         |  SELECT b.doc_id, CAST(sum(wt.w) AS BIGINT) AS w
         |  FROM bocc b JOIN wtab wt USING (bucket) GROUP BY 1),
         |thr AS (SELECT round(quantile_cont(w, 0.8), 4) AS thr FROM docw)
         |SELECT c.doc_id, c.lang, CAST(len(c.t) AS BIGINT) AS n_tok, d.w
         |FROM ctoks c JOIN docw d USING (doc_id) CROSS JOIN thr
         |WHERE d.w >= thr.thr
         |ORDER BY doc_id""".stripMargin,

    "lm_kn_train" ->
      s"""WITH $knParamsSql
         |SELECT kind, w1, w2, cnt, cost FROM params
         |ORDER BY kind, w1, w2""".stripMargin,

    "lm_kn_score" ->
      s"""WITH $knParamsSql,
         |$knScoredSql
         |SELECT doc_id, lang, n_bg, cost, avg_nats
         |FROM scored ORDER BY doc_id""".stripMargin,

    // serve ≡ build: the stored variant shares lm_kn_score's oracle
    // (the winsorize_stored discipline)
    "lm_kn_stored" ->
      s"""WITH $knParamsSql,
         |$knScoredSql
         |SELECT doc_id, lang, n_bg, cost, avg_nats
         |FROM scored ORDER BY doc_id""".stripMargin,

    "pipeline_ccnet" ->
      s"""WITH pdocs AS MATERIALIZED (
         |  SELECT doc_id, lang, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 1000000, lang, text FROM documents
         |  WHERE doc_id % 20 = 0),
         |dd AS MATERIALIZED (
         |  SELECT d.doc_id, d.lang, d.text FROM pdocs d
         |  JOIN (SELECT min(doc_id) AS doc_id FROM pdocs
         |        GROUP BY md5(text)) k USING (doc_id)),
         |${knParamsSqlFrom("dd")},
         |${knScoredSqlFrom("dd")},
         |thr AS (
         |  SELECT lang, round(quantile_cont(avg_nats, 0.67), 4) AS t67
         |  FROM scored GROUP BY lang),
         |kept AS (
         |  SELECT s.lang, s.n_bg FROM scored s JOIN thr t USING (lang)
         |  WHERE s.avg_nats <= t.t67),
         |raw AS (SELECT lang, count(*) AS n_raw FROM pdocs GROUP BY lang),
         |ded AS (SELECT lang, count(*) AS n_dedup FROM dd GROUP BY lang),
         |kc AS (
         |  SELECT lang, count(*) AS n_kept,
         |    CAST(sum(n_bg) AS BIGINT) AS tok_kept
         |  FROM kept GROUP BY lang)
         |SELECT lang, n_raw, n_dedup, n_kept, tok_kept
         |FROM raw JOIN ded USING (lang) JOIN kc USING (lang)
         |ORDER BY lang""".stripMargin,

    "ccnet_buckets" ->
      s"""WITH $knParamsSql,
         |$knScoredSql,
         |thr AS (
         |  SELECT lang, round(quantile_cont(avg_nats, 0.33), 4) AS t33,
         |    round(quantile_cont(avg_nats, 0.67), 4) AS t67
         |  FROM scored GROUP BY lang),
         |bkt AS (
         |  SELECT s.lang,
         |    CASE WHEN s.avg_nats <= t.t33 THEN 'head'
         |         WHEN s.avg_nats <= t.t67 THEN 'middle'
         |         ELSE 'tail' END AS bucket,
         |    s.n_bg, s.avg_nats
         |  FROM scored s JOIN thr t USING (lang))
         |SELECT lang, bucket, count(*) AS n_docs,
         |  CAST(sum(n_bg) AS BIGINT) AS n_tokens,
         |  min(avg_nats) AS min_nats, max(avg_nats) AS max_nats
         |FROM bkt GROUP BY lang, bucket ORDER BY lang, bucket""".stripMargin,

    "mix_resample" ->
      s"""WITH d AS (
         |  SELECT doc_id, source, len($toksSql) AS n_tok FROM documents),
         |per_src AS (
         |  SELECT source, CAST(sum(n_tok) AS BIGINT) AS ts
         |  FROM d GROUP BY source),
         |tmin AS (SELECT min(ts) AS tmin FROM per_src),
         |rates AS (
         |  SELECT source,
         |    CAST(floor((CAST(tmin AS DOUBLE) / CAST(ts AS DOUBLE))
         |      * 10000.0) AS BIGINT) AS pm
         |  FROM per_src, tmin)
         |SELECT d.source, count(*) AS n_docs_kept,
         |  CAST(sum(d.n_tok) AS BIGINT) AS tokens_kept
         |FROM d JOIN rates r ON r.source = d.source
         |WHERE ${slotSql("doc_id")} < r.pm
         |GROUP BY d.source ORDER BY d.source""".stripMargin,

    "vocab_coverage" ->
      """WITH canon AS (
        |  SELECT trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z0-9 ]', ' ', 'g'), '\s+', ' ', 'g')) AS c
        |  FROM documents),
        |words AS (
        |  SELECT unnest([x FOR x IN string_split(c, ' ') IF x <> '']) AS w
        |  FROM canon),
        |tf AS (SELECT w, count(*) AS cnt FROM words GROUP BY w),
        |vocab AS (SELECT w FROM tf ORDER BY cnt DESC, w LIMIT 10),
        |agg AS (
        |  SELECT CAST(sum(t.cnt) AS BIGINT) AS total_tokens,
        |    CAST(sum(CASE WHEN v.w IS NOT NULL THEN t.cnt ELSE 0 END)
        |      AS BIGINT) AS covered_tokens
        |  FROM tf t LEFT JOIN vocab v ON v.w = t.w)
        |SELECT total_tokens, covered_tokens,
        |  round(1.0 - CAST(covered_tokens AS DOUBLE)
        |    / CAST(total_tokens AS DOUBLE), 6) AS oov_rate
        |FROM agg""".stripMargin,

    "bpe_pairs" ->
      """WITH canon AS (
        |  SELECT trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z0-9 ]', ' ', 'g'), '\s+', ' ', 'g')) AS c
        |  FROM documents),
        |words AS (
        |  SELECT unnest([x FOR x IN string_split(c, ' ') IF x <> '']) AS w
        |  FROM canon),
        |pairs AS (
        |  SELECT substr(w, unnest(generate_series(1, length(w) - 1)), 2) AS pair
        |  FROM words WHERE length(w) >= 2)
        |SELECT pair, count(*) AS cnt FROM pairs GROUP BY pair
        |ORDER BY cnt DESC, pair LIMIT 20""".stripMargin,

    // Replays the IDENTICAL merge algorithm: list_reduce is the same
    // first-element-seeded left fold as Bpe.applyMerge's aggregate,
    // so greedy non-overlapping semantics (incl. x==y runs) match
    // bit-for-bit rather than being approximated.
    "bpe_apply" ->
      s"""WITH $bpeLearnSql,
         |tok4 AS (
         |  SELECT doc_id, w, string_split(list_reduce(t, (acc, tk) -> CASE
         |      WHEN (acc = m.x OR ends_with(acc, '|' || m.x)) AND tk = m.y
         |        THEN acc || m.y
         |      ELSE acc || '|' || tk END), '|') AS t
         |  FROM tok3 CROSS JOIN m3 m)
         |SELECT doc_id, count(*) AS n_words,
         |  CAST(sum(len(t)) AS BIGINT) AS n_tok,
         |  round(CAST(sum(len(t)) AS DOUBLE) / CAST(sum(length(w)) AS DOUBLE), 6)
         |    AS compression
         |FROM tok4 GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "bpe_merges" ->
      s"""WITH $bpeLearnSql
         |SELECT 1 AS iter, x, y, cnt FROM m1
         |UNION ALL SELECT 2, x, y, cnt FROM m2
         |UNION ALL SELECT 3, x, y, cnt FROM m3
         |ORDER BY iter""".stripMargin,

    "bpe_bytes_train" ->
      s"""WITH $bpeBytesLearnSql
         |SELECT 1 AS iter, x, y, cnt FROM bm1
         |UNION ALL SELECT 2, x, y, cnt FROM bm2
         |UNION ALL SELECT 3, x, y, cnt FROM bm3
         |ORDER BY iter""".stripMargin,

    "bpe_bytes_apply" ->
      s"""WITH $bpeBytesLearnSql
         |SELECT doc_id, count(*) AS n_words,
         |  CAST(sum(len(t)) AS BIGINT) AS n_tok,
         |  CAST(sum(strlen(w)) AS BIGINT) AS n_bytes,
         |  round(CAST(sum(len(t)) AS DOUBLE) / sum(strlen(w)), 6)
         |    AS compression
         |FROM btok4 GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "pack_bpe" ->
      s"""WITH $bpeLearnSql,
         |tok4 AS (
         |  SELECT doc_id, w, string_split(list_reduce(t, (acc, tk) -> CASE
         |      WHEN (acc = m.x OR ends_with(acc, '|' || m.x)) AND tk = m.y
         |        THEN acc || m.y
         |      ELSE acc || '|' || tk END), '|') AS t
         |  FROM tok3 CROSS JOIN m3 m),
         |counts AS (
         |  SELECT doc_id, CAST(sum(len(t)) AS BIGINT) AS n_tok
         |  FROM tok4 GROUP BY doc_id),
         |d AS (
         |  SELECT doc.doc_id, doc.lang, COALESCE(c.n_tok, 0) AS n_tok
         |  FROM documents doc LEFT JOIN counts c ON c.doc_id = doc.doc_id),
         |packed AS (
         |  SELECT lang, doc_id, n_tok,
         |    (sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
         |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok)
         |      // 256 AS bin
         |  FROM d)
         |SELECT lang, CAST(bin AS BIGINT) AS bin, count(*) AS n_docs,
         |  CAST(sum(n_tok) AS BIGINT) AS total_size,
         |  round(CAST(sum(n_tok) AS DOUBLE) / 256, 4) AS fill_ratio
         |FROM packed GROUP BY lang, bin ORDER BY lang, bin""".stripMargin,

    "text_repetition" ->
      s"""WITH tok AS (
         |  SELECT doc_id AS id, $toksSql AS t FROM documents),
         |tt AS (SELECT id, t FROM tok WHERE len(t) >= 2),
         |bg AS (
         |  SELECT id, len(t) AS n_words, len(list_distinct(t)) AS n_distinct,
         |    unnest([array_to_string(t[i:i+1], ' ') for i in range(1, len(t))]) AS bg
         |  FROM tt),
         |cnt AS (
         |  SELECT id, n_words, n_distinct, bg, count(*) AS c
         |  FROM bg GROUP BY 1, 2, 3, 4),
         |agg AS (
         |  SELECT id, n_words, n_distinct, CAST(max(c) AS BIGINT) AS top,
         |    CAST(sum(c) AS BIGINT) AS tot
         |  FROM cnt GROUP BY 1, 2, 3)
         |SELECT id, CAST(n_words AS INT) AS n_words,
         |  round(CAST(n_words - n_distinct AS DOUBLE) / n_words, 6) AS dup_word_frac,
         |  round(CAST(top AS DOUBLE) / tot, 6) AS top_bigram_frac,
         |  (CAST(top AS DOUBLE) / tot) <= 0.2 AS rep_pass
         |FROM agg ORDER BY id""".stripMargin,

    "pack_sequences" ->
      s"""WITH d AS (
         |  SELECT doc_id, lang, len($toksSql) AS n_tok FROM documents),
         |packed AS (
         |  SELECT lang, doc_id, n_tok,
         |    (sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
         |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok)
         |      // 256 AS bin
         |  FROM d)
         |SELECT lang, CAST(bin AS BIGINT) AS bin, count(*) AS n_docs,
         |  CAST(sum(n_tok) AS BIGINT) AS total_size,
         |  round(CAST(sum(n_tok) AS DOUBLE) / 256, 4) AS fill_ratio
         |FROM packed GROUP BY lang, bin ORDER BY lang, bin""".stripMargin,

    "sample_weighted" -> {
      val rate = weights.toSeq.sortBy(_._1)
        .map { case (l, r) => s"WHEN lang = '$l' THEN $r" }
        .mkString("CASE ", " ", " ELSE 10000 END")
      s"""SELECT lang, count(*) AS n_docs,
         |  CAST(sum(n_chars) AS BIGINT) AS total_chars
         |FROM documents
         |WHERE ${slotSql("doc_id")} < ($rate)
         |GROUP BY lang ORDER BY lang""".stripMargin
    },

    "text_gopher_quality" ->
      s"""WITH t AS (
         |  SELECT doc_id, $toksSql AS toks,
         |    length(regexp_replace(text, '\\s', '', 'g')) AS n_chars
         |  FROM documents),
         |m AS (
         |  SELECT doc_id, CAST(len(toks) AS INT) AS n_words,
         |    CAST(n_chars AS DOUBLE) / len(toks) AS mean0,
         |    CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS ttr0,
         |    (list_contains(toks, 'the') OR list_contains(toks, 'a')) AS has_stopword
         |  FROM t WHERE len(toks) > 0)
         |SELECT doc_id, n_words, round(mean0, 4) AS mean_word_len,
         |  round(ttr0, 4) AS type_token_ratio, has_stopword,
         |  (n_words BETWEEN 30 AND 10000 AND mean0 BETWEEN 3.0 AND 10.0
         |    AND ttr0 >= 0.35 AND has_stopword) AS pass
         |FROM m ORDER BY doc_id""".stripMargin,

    "dedup_chunks" ->
      s"""WITH ${Corpus.plantedSql},
         |t AS (
         |  SELECT id, $toksSql AS toks FROM corpus),
         |idx AS (
         |  SELECT id, toks,
         |    unnest(range(0, CAST(ceil(len(toks) / 10.0) AS INT))) AS i
         |  FROM t WHERE len(toks) > 0),
         |ch AS (
         |  SELECT id, md5(array_to_string(toks[(i*10+1):(i*10+10)], ' ')) AS h
         |  FROM idx)
         |SELECT h AS chunk_hash, count(*) AS n_occ,
         |  count(DISTINCT id) AS n_docs, min(id) AS keep_doc
         |FROM ch GROUP BY h HAVING count(*) > 1 ORDER BY chunk_hash""".stripMargin,

    "dedup_chunks_apply" ->
      s"""WITH ${Corpus.plantedSql},
         |t AS (
         |  SELECT id, $toksSql AS toks FROM corpus),
         |idx AS (
         |  SELECT id, toks,
         |    unnest(range(0, CAST(ceil(len(toks) / 10.0) AS INT))) AS i
         |  FROM t WHERE len(toks) > 0),
         |ch AS (
         |  SELECT id, i AS pos,
         |    array_to_string(toks[(i*10+1):(i*10+10)], ' ') AS chunk
         |  FROM idx),
         |rk AS (
         |  SELECT id, pos, chunk,
         |    row_number() OVER (PARTITION BY md5(chunk) ORDER BY id, pos) AS rk
         |  FROM ch),
         |kept AS (SELECT id, pos, chunk FROM rk WHERE rk = 1),
         |rebuilt AS (
         |  SELECT id, md5(string_agg(chunk, ' ' ORDER BY pos)) AS clean_hash,
         |    count(*) AS n_kept
         |  FROM kept GROUP BY id),
         |tot AS (SELECT id, count(*) AS n_chunks FROM ch GROUP BY id)
         |SELECT r.id, r.clean_hash, r.n_kept, t.n_chunks
         |FROM rebuilt r JOIN tot t USING (id) ORDER BY id""".stripMargin,

    "dedup_cdc" ->
      s"""WITH $cdcChainSql
         |SELECT md5(chunk) AS chunk_hash,
         |  CAST(min(length(chunk)) AS BIGINT) AS chunk_len,
         |  count(DISTINCT doc_id) AS n_docs, count(*) AS n_occ
         |FROM cdc_chunks GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2
         |ORDER BY chunk_hash""".stripMargin,

    "dedup_cdc_incremental" ->
      s"""WITH $cdcChainSql,
         |y AS (SELECT DISTINCT md5(chunk) AS h FROM cdc_chunks
         |      WHERE doc_id % 2 = 0),
         |t AS (SELECT doc_id, md5(chunk) AS h FROM cdc_chunks
         |      WHERE doc_id % 2 = 1),
         |j AS (SELECT t.doc_id, y.h AS known FROM t
         |      LEFT JOIN y ON y.h = t.h)
         |SELECT doc_id, count(*) AS n_chunks, count(known) AS n_known,
         |  round(CAST(count(known) AS DOUBLE) / count(*), 4) AS known_ratio,
         |  CAST(count(known) * 2 >= count(*) AS BIGINT) AS is_dup
         |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "dedup_cdc_apply" ->
      s"""WITH $cdcChainSql,
         |h AS (SELECT doc_id, md5(chunk) AS ch,
         |        CAST(length(chunk) AS BIGINT) AS cl FROM cdc_chunks),
         |shared AS (
         |  SELECT ch FROM h GROUP BY ch HAVING count(DISTINCT doc_id) >= 2),
         |j AS (SELECT h.doc_id, h.cl, s.ch AS dup
         |      FROM h LEFT JOIN shared s ON s.ch = h.ch)
         |SELECT doc_id, count(*) AS n_chunks, count(dup) AS n_dup_chunks,
         |  CAST(coalesce(sum(CASE WHEN dup IS NOT NULL THEN cl END), 0)
         |    AS BIGINT) AS dup_chars,
         |  round(CAST(coalesce(sum(CASE WHEN dup IS NOT NULL THEN cl END), 0)
         |      AS DOUBLE) / CAST(sum(cl) AS DOUBLE), 6) AS dup_ratio
         |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // Replays the chunk geometry positionally: chunk i covers tokens
    // [i*24, i*24+32); n_chunks = 1 + ceil((n-32)/24) for n > 32.
    "text_chunk" ->
      s"""WITH t AS (
         |  SELECT doc_id, $toksSql AS toks FROM documents),
         |idx AS (
         |  SELECT doc_id, toks,
         |    unnest(range(0, 1 + greatest(0,
         |      CAST(ceil((len(toks) - 32) / 24.0) AS BIGINT)))) AS i
         |  FROM t WHERE len(toks) > 0),
         |ch AS (
         |  SELECT doc_id, i AS chunk_id, i * 24 AS first_pos,
         |    toks[(i*24+1):(i*24+32)] AS sl
         |  FROM idx)
         |SELECT doc_id, chunk_id, first_pos,
         |  CAST(len(sl) AS BIGINT) AS n_tokens,
         |  md5(array_to_string(sl, ' ')) AS chunk_hash
         |FROM ch ORDER BY doc_id, chunk_id""".stripMargin,

    "corpus_stats" ->
      s"""WITH d AS (
         |  SELECT lang, n_chars, len($toksSql) AS n_tok FROM documents)
         |SELECT lang, count(*) AS n_docs,
         |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
         |  CAST(sum(n_tok) AS BIGINT) AS total_tokens,
         |  round(CAST(sum(n_chars) AS DOUBLE) / count(*), 4) AS mean_chars,
         |  round(quantile_cont(n_chars, 0.5), 4) AS p50_chars,
         |  round(quantile_cont(n_chars, 0.95), 4) AS p95_chars
         |FROM d GROUP BY lang ORDER BY lang""".stripMargin,

    "corpus_gini" ->
      s"""WITH d AS (
         |  SELECT lang, doc_id, CAST(len($toksSql) AS BIGINT) AS x
         |  FROM documents),
         |r AS (
         |  SELECT lang, x, row_number() OVER (PARTITION BY lang
         |    ORDER BY x, doc_id) AS rk
         |  FROM d)
         |SELECT lang, count(*) AS n_docs,
         |  CAST(sum(x) AS BIGINT) AS tot_tokens,
         |  round(2.0 * CAST(sum(rk * x) AS DOUBLE)
         |      / (CAST(count(*) AS DOUBLE) * CAST(sum(x) AS BIGINT))
         |    - (count(*) + 1.0) / count(*), 6) AS gini
         |FROM r GROUP BY lang ORDER BY lang""".stripMargin,

    "stats_psi" -> {
      def nib(i: Int) =
        s"(strpos('0123456789abcdef', substr(md5(w), $i, 1)) - 1)"
      s"""WITH canon AS (
         |  SELECT doc_id % 2 AS b, trim(regexp_replace(regexp_replace(
         |    lower(text), '[^a-z0-9 ]', ' ', 'g'), '\\s+', ' ', 'g')) AS c
         |  FROM documents),
         |occ AS (
         |  SELECT b, (${nib(31)} * 16 + ${nib(32)}) AS bucket
         |  FROM (SELECT b,
         |    unnest([x for x in string_split(c, ' ') if x <> '']) AS w
         |    FROM canon)),
         |census AS (
         |  SELECT bucket,
         |    CAST(sum(CASE WHEN b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
         |    CAST(sum(CASE WHEN b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cb
         |  FROM occ GROUP BY bucket),
         |tots AS (
         |  SELECT CAST(sum(ca) AS BIGINT) AS ta,
         |    CAST(sum(cb) AS BIGINT) AS tb FROM census),
         |contrib AS (
         |  SELECT round((ca / ta - cb / tb) * ln((ca / ta) / (cb / tb)), 6)
         |    AS c
         |  FROM census CROSS JOIN tots WHERE ca > 0 AND cb > 0)
         |SELECT count(*) AS n_buckets,
         |  round(list_aggregate(list_sort(list(c)), 'sum'), 6) AS psi
         |FROM contrib""".stripMargin
    },

    "sketch_histogram" ->
      """SELECT lang, CAST(length(CAST(n_chars AS VARCHAR)) AS INT) AS bin,
        |  count(*) AS n_docs,
        |  min(n_chars) AS bin_min, max(n_chars) AS bin_max
        |FROM documents GROUP BY lang, bin ORDER BY lang, bin""".stripMargin,

    "mm_image_dims" ->
      """SELECT doc_id, doc_id % 640 + 1 AS width, doc_id % 480 + 1 AS height,
        |  CAST(29 AS INT) AS hdr_len
        |FROM documents ORDER BY doc_id""".stripMargin,

    "mm_audio_duration" ->
      """WITH syn AS (
        |  SELECT doc_id,
        |    doc_id % 2 + 1 AS channels,
        |    CAST(CASE WHEN doc_id % 3 = 0 THEN 8000
        |              WHEN doc_id % 3 = 1 THEN 16000
        |              ELSE 44100 END AS BIGINT) AS sample_rate,
        |    (doc_id % 100000) * 64 + 1000 AS data_size
        |  FROM documents)
        |SELECT doc_id, channels, sample_rate, CAST(16 AS BIGINT) AS bits,
        |  CAST((data_size * 1000) // (sample_rate * channels * 2)
        |    AS BIGINT) AS duration_ms,
        |  CAST(44 AS INT) AS hdr_len
        |FROM syn ORDER BY doc_id""".stripMargin,

    "mm_wav_rms" ->
      """WITH j AS (
        |  SELECT doc_id,
        |    unnest(generate_series(0, CAST(doc_id % 48 + 15 AS INT))) AS j
        |  FROM documents),
        |b AS (
        |  SELECT doc_id, j,
        |    md5(CAST(doc_id AS VARCHAR) || '-' || CAST(j // 16 AS VARCHAR))
        |      AS d
        |  FROM j),
        |s AS (
        |  SELECT doc_id, j,
        |    ((strpos('0123456789abcdef', substr(d, 2 * (j % 16) + 1, 1)) - 1)
        |        * 16
        |      + strpos('0123456789abcdef', substr(d, 2 * (j % 16) + 2, 1)) - 1
        |      - 128) * 256 AS v
        |  FROM b),
        |z AS (
        |  SELECT doc_id, v,
        |    CASE WHEN lag(v) OVER w IS NOT NULL
        |      AND ((v >= 0) <> (lag(v) OVER w >= 0)) THEN 1 ELSE 0 END AS x
        |  FROM s WINDOW w AS (PARTITION BY doc_id ORDER BY j))
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n,
        |  CAST(max(abs(v)) AS BIGINT) AS peak,
        |  CAST(sum(CASE WHEN abs(v) >= 32512 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS clip,
        |  CAST(sum(x) AS BIGINT) AS zerox,
        |  CAST(sum(CAST(v AS BIGINT) * v) AS BIGINT) AS sumsq,
        |  round(sqrt(CAST(sum(CAST(v AS BIGINT) * v) AS DOUBLE) / count(*)),
        |    4) AS rms
        |FROM z GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // the mm_wav_rms shape with the FLAC fixture's "f" seed, longer
    // clips (id%80+48) and the id%7==3 constant-sample class
    "mm_flac_rms" ->
      """WITH j AS (
        |  SELECT doc_id,
        |    unnest(generate_series(0, CAST(doc_id % 80 + 47 AS INT))) AS j
        |  FROM documents),
        |b AS (
        |  SELECT doc_id, j,
        |    md5('f' || CAST(doc_id AS VARCHAR) || '-' ||
        |      CAST(j // 16 AS VARCHAR)) AS d
        |  FROM j),
        |s AS (
        |  SELECT doc_id, j,
        |    CASE WHEN doc_id % 7 = 3
        |      THEN (CAST(doc_id % 256 AS INT) - 128) * 256
        |      ELSE
        |        ((strpos('0123456789abcdef',
        |            substr(d, 2 * (j % 16) + 1, 1)) - 1) * 16
        |          + strpos('0123456789abcdef',
        |            substr(d, 2 * (j % 16) + 2, 1)) - 1
        |          - 128) * 256
        |    END AS v
        |  FROM b),
        |z AS (
        |  SELECT doc_id, v,
        |    CASE WHEN lag(v) OVER w IS NOT NULL
        |      AND ((v >= 0) <> (lag(v) OVER w >= 0)) THEN 1 ELSE 0 END AS x
        |  FROM s WINDOW w AS (PARTITION BY doc_id ORDER BY j))
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n,
        |  CAST(max(abs(v)) AS BIGINT) AS peak,
        |  CAST(sum(CASE WHEN abs(v) >= 32512 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS clip,
        |  CAST(sum(x) AS BIGINT) AS zerox,
        |  CAST(sum(CAST(v AS BIGINT) * v) AS BIGINT) AS sumsq,
        |  round(sqrt(CAST(sum(CAST(v AS BIGINT) * v) AS DOUBLE) / count(*)),
        |    4) AS rms
        |FROM z GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // base frame energies from the "a"-seeded digests (each digest IS
    // one 16-sample frame), gradient bits via lead(), the shared
    // 12-bit band join — scale cancels, so no parity term appears
    "mm_audio_phash" ->
      """WITH fj AS (
        |  SELECT d.doc_id, f.f, j.j,
        |    md5('a' || CAST(d.doc_id // 2 AS VARCHAR) || '-' ||
        |      CAST(f.f AS VARCHAR)) AS h
        |  FROM documents d, generate_series(0, 48) f(f),
        |    generate_series(0, 15) j(j)),
        |e AS (
        |  SELECT doc_id, f,
        |    sum(((strpos('0123456789abcdef', substr(h, 2 * j + 1, 1)) - 1)
        |          * 16
        |        + strpos('0123456789abcdef', substr(h, 2 * j + 2, 1)) - 1
        |        - 128)
        |      * ((strpos('0123456789abcdef', substr(h, 2 * j + 1, 1)) - 1)
        |          * 16
        |        + strpos('0123456789abcdef', substr(h, 2 * j + 2, 1)) - 1
        |        - 128)) AS be
        |  FROM fj GROUP BY doc_id, f),
        |g AS (
        |  SELECT doc_id, f, be,
        |    lead(be) OVER (PARTITION BY doc_id ORDER BY f) AS nxt
        |  FROM e),
        |sigs AS (
        |  SELECT doc_id AS id,
        |    CAST(sum(CASE WHEN f < 48 AND be > nxt
        |      THEN CAST(1 AS BIGINT) << (47 - f) ELSE 0 END) AS BIGINT)
        |      AS phash
        |  FROM g GROUP BY doc_id),
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

    // the interleaved stereo stream: even j = left (md5 "fl" bytes),
    // odd j = left + the small "fr" delta — container-blind like the
    // mono leg, the decorrelated round-trip is what Spark proves
    "mm_flac_stereo" ->
      """WITH j AS (
        |  SELECT doc_id,
        |    unnest(generate_series(0,
        |      CAST(2 * (doc_id % 40 + 32) - 1 AS INT))) AS j
        |  FROM documents),
        |b AS (
        |  SELECT doc_id, j, j // 2 AS k, j % 2 AS ch,
        |    md5('fl' || CAST(doc_id AS VARCHAR) || '-' ||
        |      CAST((j // 2) // 16 AS VARCHAR)) AS dl,
        |    md5('fr' || CAST(doc_id AS VARCHAR) || '-' ||
        |      CAST((j // 2) // 16 AS VARCHAR)) AS dr
        |  FROM j),
        |s AS (
        |  SELECT doc_id, j,
        |    ((strpos('0123456789abcdef', substr(dl, 2 * (k % 16) + 1, 1))
        |        - 1) * 16
        |      + strpos('0123456789abcdef', substr(dl, 2 * (k % 16) + 2, 1))
        |        - 1 - 128) * 250
        |    + ch * (((strpos('0123456789abcdef',
        |          substr(dr, 2 * (k % 16) + 1, 1)) - 1) * 16
        |        + strpos('0123456789abcdef',
        |          substr(dr, 2 * (k % 16) + 2, 1)) - 1) % 7 - 3) * 64 AS v
        |  FROM b),
        |z AS (
        |  SELECT doc_id, v,
        |    CASE WHEN lag(v) OVER w IS NOT NULL
        |      AND ((v >= 0) <> (lag(v) OVER w >= 0)) THEN 1 ELSE 0 END AS x
        |  FROM s WINDOW w AS (PARTITION BY doc_id ORDER BY j))
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n,
        |  CAST(max(abs(v)) AS BIGINT) AS peak,
        |  CAST(sum(CASE WHEN abs(v) >= 32512 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS clip,
        |  CAST(sum(x) AS BIGINT) AS zerox,
        |  CAST(sum(CAST(v AS BIGINT) * v) AS BIGINT) AS sumsq,
        |  round(sqrt(CAST(sum(CAST(v AS BIGINT) * v) AS DOUBLE) / count(*)),
        |    4) AS rms
        |FROM z GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "mm_wav_trim" ->
      """WITH j AS (
        |  SELECT doc_id,
        |    unnest(generate_series(0, CAST(doc_id % 48 + 15 AS INT))) AS j
        |  FROM documents),
        |b AS (
        |  SELECT doc_id, j,
        |    md5(CAST(doc_id AS VARCHAR) || '-' || CAST(j // 16 AS VARCHAR))
        |      AS d
        |  FROM j),
        |s AS (
        |  SELECT doc_id, j,
        |    ((strpos('0123456789abcdef', substr(d, 2 * (j % 16) + 1, 1)) - 1)
        |        * 16
        |      + strpos('0123456789abcdef', substr(d, 2 * (j % 16) + 2, 1)) - 1
        |      - 128) * 256 AS v
        |  FROM b),
        |act AS (
        |  SELECT doc_id, count(*) AS n,
        |    min(CASE WHEN abs(v) >= 24576 THEN j END) AS f,
        |    max(CASE WHEN abs(v) >= 24576 THEN j END) AS l
        |  FROM s GROUP BY doc_id)
        |SELECT doc_id, CAST(n AS BIGINT) AS n,
        |  CAST(coalesce(f, n) AS BIGINT) AS lead,
        |  CAST(CASE WHEN f IS NULL THEN 0 ELSE l - f + 1 END AS BIGINT)
        |    AS kept,
        |  CAST(CASE WHEN f IS NULL THEN 0 ELSE n - 1 - l END AS BIGINT)
        |    AS trail
        |FROM act ORDER BY doc_id""".stripMargin,

    "mm_audio_vad" ->
      """WITH j AS (
        |  SELECT doc_id,
        |    unnest(generate_series(0, CAST(doc_id % 48 + 15 AS INT))) AS j
        |  FROM documents),
        |b AS (
        |  SELECT doc_id, j,
        |    md5(CAST(doc_id AS VARCHAR) || '-' || CAST(j // 16 AS VARCHAR))
        |      AS d
        |  FROM j),
        |s AS (
        |  SELECT doc_id, j,
        |    ((strpos('0123456789abcdef', substr(d, 2 * (j % 16) + 1, 1)) - 1)
        |        * 16
        |      + strpos('0123456789abcdef', substr(d, 2 * (j % 16) + 2, 1)) - 1
        |      - 128) * 256 AS v
        |  FROM b),
        |fr AS (
        |  SELECT doc_id, j // 16 AS k, sum(CAST(v AS BIGINT) * v) AS ss,
        |    count(*) AS c
        |  FROM s GROUP BY 1, 2),
        |sp AS (
        |  SELECT doc_id, k, (ss >= 268435456 * c) AS speech FROM fr),
        |isl AS (
        |  SELECT doc_id,
        |    k - row_number() OVER (PARTITION BY doc_id ORDER BY k) AS g
        |  FROM sp WHERE speech),
        |runs AS (SELECT doc_id, count(*) AS run FROM isl GROUP BY doc_id, g),
        |mx AS (SELECT doc_id, max(run) AS longest FROM runs GROUP BY doc_id),
        |tot AS (
        |  SELECT doc_id, count(*) AS n FROM s GROUP BY doc_id),
        |agg AS (
        |  SELECT doc_id, count(*) AS n_frames,
        |    CAST(sum(speech::INT) AS BIGINT) AS n_speech
        |  FROM sp GROUP BY doc_id)
        |SELECT a.doc_id, CAST(t.n AS BIGINT) AS n,
        |  CAST(a.n_frames AS BIGINT) AS n_frames, a.n_speech,
        |  CAST(coalesce(m.longest, 0) AS BIGINT) AS longest_run,
        |  round(CAST(a.n_speech AS DOUBLE) / a.n_frames, 4) AS speech_ratio
        |FROM agg a JOIN tot t ON t.doc_id = a.doc_id
        |LEFT JOIN mx m ON m.doc_id = a.doc_id
        |ORDER BY a.doc_id""".stripMargin,

    // analytic inverse of the planted sample table: sizes from the
    // first md5 byte, offsets as the gap-adjusted chunked prefix sum
    // (4-byte pad between chunks of spc samples), payload hashes over
    // the ASCII md5-hex prefixes the builder wrote
    "mm_mp4_samples" ->
      """WITH k AS (
        |  SELECT doc_id, doc_id % 2 + 2 AS spc,
        |    unnest(generate_series(1, CAST(doc_id % 7 + 4 AS INT))) AS k
        |  FROM documents),
        |s2 AS (
        |  SELECT doc_id, spc, k,
        |    ((strpos('0123456789abcdef', substr(md5('s' ||
        |          CAST(doc_id AS VARCHAR) || '-' || CAST(k AS VARCHAR)),
        |        1, 1)) - 1) * 16
        |      + strpos('0123456789abcdef', substr(md5('s' ||
        |          CAST(doc_id AS VARCHAR) || '-' || CAST(k AS VARCHAR)),
        |        2, 1)) - 1) % 24 + 8 AS size
        |  FROM k),
        |o AS (
        |  SELECT doc_id, k, size,
        |    24 + COALESCE(sum(size) OVER (PARTITION BY doc_id ORDER BY k
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      + 4 * ((k - 1) // spc) AS off
        |  FROM s2)
        |SELECT doc_id, CAST(k AS INT) AS sample,
        |  CAST(off AS BIGINT) AS "offset", CAST(size AS BIGINT) AS size,
        |  md5(substr(repeat(md5('m' || CAST(doc_id AS VARCHAR) || '-' ||
        |      CAST(k AS VARCHAR)), 2), 1, CAST(size AS INT)))
        |    AS payload_md5
        |FROM o WHERE (k - 1) % 3 = 0 ORDER BY doc_id, sample""".stripMargin,

    "mm_video_duration" ->
      """WITH syn AS (
        |  SELECT doc_id,
        |    CAST(CASE WHEN doc_id % 3 = 0 THEN 600
        |              WHEN doc_id % 3 = 1 THEN 1000
        |              ELSE 90000 END AS BIGINT) AS timescale,
        |    CAST((doc_id % 90000) * 10 + 7 AS BIGINT) AS duration,
        |    16 + (doc_id % 3) * 8 AS ftyp
        |  FROM documents)
        |SELECT doc_id, timescale, duration,
        |  CAST((duration * 1000) // timescale AS BIGINT) AS duration_ms,
        |  CAST(ftyp + 116 AS INT) AS hdr_len
        |FROM syn ORDER BY doc_id""".stripMargin,

    "mm_flac_duration" ->
      """WITH syn AS (
        |  SELECT doc_id,
        |    doc_id % 2 + 1 AS channels,
        |    CAST(CASE WHEN doc_id % 4 = 0 THEN 8000
        |              WHEN doc_id % 4 = 1 THEN 16000
        |              WHEN doc_id % 4 = 2 THEN 44100
        |              ELSE 48000 END AS BIGINT) AS sample_rate,
        |    CAST((doc_id % 150) * 343597383 + 44100 AS BIGINT)
        |      AS total_samples
        |  FROM documents)
        |SELECT doc_id, channels, sample_rate, CAST(16 AS BIGINT) AS bits,
        |  total_samples,
        |  CAST((total_samples * 1000) // sample_rate AS BIGINT)
        |    AS duration_ms,
        |  CAST(42 AS INT) AS hdr_len
        |FROM syn ORDER BY doc_id""".stripMargin,

    "mm_mp3_duration" ->
      """WITH syn AS (
        |  SELECT doc_id,
        |    CAST(doc_id % 2048 AS BIGINT) AS tag_size,
        |    CAST(CASE doc_id % 14 + 1
        |      WHEN 1 THEN 32 WHEN 2 THEN 40 WHEN 3 THEN 48
        |      WHEN 4 THEN 56 WHEN 5 THEN 64 WHEN 6 THEN 80
        |      WHEN 7 THEN 96 WHEN 8 THEN 112 WHEN 9 THEN 128
        |      WHEN 10 THEN 160 WHEN 11 THEN 192 WHEN 12 THEN 224
        |      WHEN 13 THEN 256 ELSE 320 END AS BIGINT) AS bitrate_kbps,
        |    CAST(CASE doc_id % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000
        |      ELSE 32000 END AS BIGINT) AS sample_rate,
        |    CAST(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 2 END AS BIGINT)
        |      AS channels,
        |    CASE doc_id % 3 WHEN 1 THEN 'xing' WHEN 2 THEN 'vbri'
        |      ELSE 'cbr' END AS mode,
        |    CAST(doc_id % 5000 + 100 AS BIGINT) AS frames,
        |    CAST(4
        |      + (CASE WHEN doc_id % 3 = 2 THEN 32
        |              WHEN doc_id % 2 = 0 THEN 17 ELSE 32 END)
        |      + (CASE doc_id % 3 WHEN 1 THEN 12 WHEN 2 THEN 18 ELSE 0 END)
        |      + doc_id % 600 + 100 AS BIGINT) AS audio_bytes
        |  FROM documents)
        |SELECT doc_id, tag_size, bitrate_kbps, sample_rate, channels,
        |  mode,
        |  CASE WHEN mode = 'cbr' THEN NULL ELSE frames END AS vbr_frames,
        |  CAST(CASE WHEN mode = 'cbr'
        |    THEN (audio_bytes * 8000) // (bitrate_kbps * 1000)
        |    ELSE (frames * 1152000) // sample_rate END AS BIGINT)
        |    AS duration_ms,
        |  CAST(10 + tag_size + audio_bytes AS INT) AS file_len
        |FROM syn ORDER BY doc_id""".stripMargin,

    "mix_temperature" ->
      s"""WITH d AS (
         |  SELECT doc_id, lang, len($toksSql) AS n_tok FROM documents),
         |per_lang AS (
         |  SELECT lang, CAST(sum(n_tok) AS BIGINT) AS ts
         |  FROM d GROUP BY lang),
         |tmin AS (SELECT min(ts) AS tmin FROM per_lang),
         |rates AS (
         |  SELECT lang,
         |    CAST(floor(sqrt(CAST(tmin AS DOUBLE) / CAST(ts AS DOUBLE))
         |      * 10000.0) AS BIGINT) AS pm
         |  FROM per_lang, tmin)
         |SELECT d.lang, max(r.pm) AS pm, count(*) AS n_docs_kept,
         |  CAST(sum(d.n_tok) AS BIGINT) AS tokens_kept
         |FROM d JOIN rates r ON r.lang = d.lang
         |WHERE ${slotSql("doc_id")} < r.pm
         |GROUP BY d.lang ORDER BY d.lang""".stripMargin,

    "mix_excess_loss" ->
      """WITH canon AS (
        |  SELECT lang, trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z0-9 ]', ' ', 'g'), '\s+', ' ', 'g')) AS c
        |  FROM documents),
        |occ AS (
        |  SELECT lang,
        |    unnest([x for x in string_split(c, ' ') if x <> '']) AS tok
        |  FROM canon),
        |dt AS (SELECT lang, tok, count(*) AS c_dt FROM occ GROUP BY 1, 2),
        |gt AS (
        |  SELECT tok, CAST(sum(c_dt) AS BIGINT) AS c_gt FROM dt GROUP BY tok),
        |dtot AS (
        |  SELECT lang, CAST(sum(c_dt) AS BIGINT) AS tot_d
        |  FROM dt GROUP BY lang),
        |gtot AS (
        |  SELECT CAST(sum(c_gt) AS BIGINT) AS tot_g, count(*) AS v FROM gt),
        |x AS (
        |  SELECT d.lang, d.c_dt, t.tot_d,
        |    CAST(round(-ln((g.c_gt + 1.0)
        |        / (gg.tot_g + gg.v)) * 1e6) AS BIGINT)
        |    - CAST(round(-ln((d.c_dt + 1.0)
        |        / (t.tot_d + gg.v)) * 1e6) AS BIGINT) AS x
        |  FROM dt d JOIN gt g USING (tok) JOIN dtot t USING (lang)
        |  CROSS JOIN gtot gg),
        |per AS (
        |  SELECT lang, max(tot_d) AS n_tokens,
        |    CAST(sum(c_dt * x) AS BIGINT) AS excess_mu
        |  FROM x GROUP BY lang),
        |me AS (
        |  SELECT lang, n_tokens,
        |    CAST(round(CAST(excess_mu AS DOUBLE) / n_tokens) AS BIGINT) AS me
        |  FROM per),
        |wt AS (SELECT CAST(sum(greatest(me, 0)) AS BIGINT) AS wt FROM me)
        |SELECT lang, CAST(n_tokens AS BIGINT) AS n_tokens,
        |  round(CAST(me AS DOUBLE) / 1e6, 6) AS excess_nats,
        |  round(CASE WHEN wt > 0 THEN CAST(greatest(me, 0) AS DOUBLE) / wt
        |    ELSE 0.0 END, 4) AS weight
        |FROM me CROSS JOIN wt ORDER BY lang""".stripMargin,

    "quality_adaptive" -> qualityAdaptiveSql,

    // serve ≡ build: the stored variant shares quality_adaptive's
    // oracle (the winsorize_stored discipline)
    "quality_adaptive_stored" -> qualityAdaptiveSql,

    "quality_nb_train" ->
      s"""WITH $nbModelSql
         |SELECT label, token, cnt, cost FROM model
         |ORDER BY label, token""".stripMargin,

    "quality_nb_apply" -> nbApplySql,

    // serve ≡ build: the stored variant shares quality_nb_apply's
    // oracle (the winsorize_stored / lm_kn_stored discipline)
    "quality_nb_stored" -> nbApplySql,

    "quality_nb_calibrate" ->
      s"""WITH $nbModelSql,
         |heldout AS (
         |  SELECT * FROM labeled WHERE ${slotSql("doc_id")} < 2000),
         |percls AS (
         |  SELECT d.doc_id, l.label AS cls2,
         |    CAST(sum(coalesce(m.cost, u.cost)) AS BIGINT) AS tc
         |  FROM (SELECT doc_id, unnest(tokens) AS token FROM heldout) d
         |  CROSS JOIN (VALUES ('bad'), ('good')) l(label)
         |  JOIN model u ON u.label = l.label AND u.token = '__unseen__'
         |  LEFT JOIN model m ON m.label = l.label AND m.token = d.token
         |    AND m.token NOT IN ('__prior__', '__unseen__')
         |  GROUP BY d.doc_id, l.label),
         |margins AS (
         |  SELECT b.label,
         |    (pb.cost + coalesce(cb.tc, 0)) - (pg.cost + coalesce(cg.tc, 0))
         |      AS m
         |  FROM heldout b
         |  JOIN model pb ON pb.label = 'bad' AND pb.token = '__prior__'
         |  JOIN model pg ON pg.label = 'good' AND pg.token = '__prior__'
         |  LEFT JOIN percls cb ON cb.doc_id = b.doc_id AND cb.cls2 = 'bad'
         |  LEFT JOIN percls cg ON cg.doc_id = b.doc_id AND cg.cls2 = 'good'),
         |bucketed AS (
         |  SELECT label, m, greatest(0, least(9,
         |    CAST(floor(CAST(m AS DOUBLE) / 2e6) AS BIGINT) + 5)) AS bucket
         |  FROM margins)
         |SELECT bucket, count(*) AS n_docs,
         |  CAST(sum(CASE WHEN label = 'good' THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_good,
         |  round(CAST(sum(CASE WHEN label = 'good' THEN 1 ELSE 0 END)
         |    AS DOUBLE) / count(*), 6) AS good_rate,
         |  round(CAST(sum(m) AS DOUBLE) / count(*) / 1e6, 6)
         |    AS mean_margin_nats
         |FROM bucketed GROUP BY bucket ORDER BY bucket""".stripMargin,

    "quality_nb_pr_curve" ->
      s"""WITH $nbModelSql,
         |heldout AS (
         |  SELECT * FROM labeled WHERE ${slotSql("doc_id")} < 2000),
         |percls AS (
         |  SELECT d.doc_id, l.label AS cls2,
         |    CAST(sum(coalesce(m.cost, u.cost)) AS BIGINT) AS tc
         |  FROM (SELECT doc_id, unnest(tokens) AS token FROM heldout) d
         |  CROSS JOIN (VALUES ('bad'), ('good')) l(label)
         |  JOIN model u ON u.label = l.label AND u.token = '__unseen__'
         |  LEFT JOIN model m ON m.label = l.label AND m.token = d.token
         |    AND m.token NOT IN ('__prior__', '__unseen__')
         |  GROUP BY d.doc_id, l.label),
         |margins AS (
         |  SELECT b.label,
         |    (pb.cost + coalesce(cb.tc, 0)) - (pg.cost + coalesce(cg.tc, 0))
         |      AS m
         |  FROM heldout b
         |  JOIN model pb ON pb.label = 'bad' AND pb.token = '__prior__'
         |  JOIN model pg ON pg.label = 'good' AND pg.token = '__prior__'
         |  LEFT JOIN percls cb ON cb.doc_id = b.doc_id AND cb.cls2 = 'bad'
         |  LEFT JOIN percls cg ON cg.doc_id = b.doc_id AND cg.cls2 = 'good'),
         |th AS (SELECT unnest([-6000000, -4000000, -2000000, 0,
         |                      2000000, 4000000, 6000000]) AS t)
         |SELECT CAST(t AS BIGINT) AS t,
         |  CAST(sum(CASE WHEN m > t THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_pred_good,
         |  CAST(sum(CASE WHEN m > t AND label = 'good' THEN 1 ELSE 0 END)
         |    AS BIGINT) AS tp,
         |  CAST(sum(CASE WHEN label = 'good' THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_good,
         |  round(CASE WHEN sum(CASE WHEN m > t THEN 1 ELSE 0 END) > 0
         |    THEN CAST(sum(CASE WHEN m > t AND label = 'good' THEN 1
         |      ELSE 0 END) AS DOUBLE)
         |      / sum(CASE WHEN m > t THEN 1 ELSE 0 END)
         |    ELSE 0.0 END, 4) AS precision,
         |  round(CASE WHEN sum(CASE WHEN label = 'good' THEN 1 ELSE 0 END)
         |      > 0
         |    THEN CAST(sum(CASE WHEN m > t AND label = 'good' THEN 1
         |      ELSE 0 END) AS DOUBLE)
         |      / sum(CASE WHEN label = 'good' THEN 1 ELSE 0 END)
         |    ELSE 0.0 END, 4) AS recall
         |FROM margins CROSS JOIN th GROUP BY t ORDER BY t""".stripMargin,

    "quality_nb_eval" ->
      s"""WITH $nbModelSql,
         |heldout AS (
         |  SELECT * FROM labeled WHERE ${slotSql("doc_id")} < 2000),
         |percls AS (
         |  SELECT d.doc_id, l.label AS cls2,
         |    CAST(sum(coalesce(m.cost, u.cost)) AS BIGINT) AS tc
         |  FROM (SELECT doc_id, unnest(tokens) AS token FROM heldout) d
         |  CROSS JOIN (VALUES ('bad'), ('good')) l(label)
         |  JOIN model u ON u.label = l.label AND u.token = '__unseen__'
         |  LEFT JOIN model m ON m.label = l.label AND m.token = d.token
         |    AND m.token NOT IN ('__prior__', '__unseen__')
         |  GROUP BY d.doc_id, l.label),
         |pred AS (
         |  SELECT b.label, CASE
         |      WHEN pg.cost + coalesce(cg.tc, 0) < pb.cost + coalesce(cb.tc, 0)
         |      THEN 'good' ELSE 'bad' END AS pred
         |  FROM heldout b
         |  JOIN model pb ON pb.label = 'bad' AND pb.token = '__prior__'
         |  JOIN model pg ON pg.label = 'good' AND pg.token = '__prior__'
         |  LEFT JOIN percls cb ON cb.doc_id = b.doc_id AND cb.cls2 = 'bad'
         |  LEFT JOIN percls cg ON cg.doc_id = b.doc_id AND cg.cls2 = 'good'),
         |cells AS (
         |  SELECT label, pred, count(*) AS n FROM pred GROUP BY 1, 2),
         |per AS (
         |  SELECT c.cls,
         |    CAST(coalesce(sum(CASE WHEN e.label = c.cls AND e.pred = c.cls
         |      THEN e.n END), 0) AS BIGINT) AS tp,
         |    CAST(coalesce(sum(CASE WHEN e.label <> c.cls AND e.pred = c.cls
         |      THEN e.n END), 0) AS BIGINT) AS fp,
         |    CAST(coalesce(sum(CASE WHEN e.label = c.cls AND e.pred <> c.cls
         |      THEN e.n END), 0) AS BIGINT) AS fn,
         |    CAST(coalesce(sum(CASE WHEN e.label <> c.cls AND e.pred <> c.cls
         |      THEN e.n END), 0) AS BIGINT) AS tn
         |  FROM (VALUES ('bad'), ('good')) c(cls) CROSS JOIN cells e
         |  GROUP BY c.cls)
         |SELECT cls, tp, fp, fn, tn,
         |  round(CASE WHEN tp + fp > 0
         |    THEN CAST(tp AS DOUBLE) / (tp + fp) ELSE 0.0 END, 6) AS prec,
         |  round(CASE WHEN tp + fn > 0
         |    THEN CAST(tp AS DOUBLE) / (tp + fn) ELSE 0.0 END, 6) AS rec,
         |  round(CASE WHEN 2 * tp + fp + fn > 0
         |    THEN 2.0 * tp / (2 * tp + fp + fn) ELSE 0.0 END, 6) AS f1
         |FROM per ORDER BY cls""".stripMargin,

    "shuffle_shards" ->
      s"""WITH d AS (
         |  SELECT doc_id, len($toksSql) AS n_tok FROM documents)
         |SELECT (${slotSql("doc_id")}) % 16 AS shard,
         |  count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens,
         |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
         |FROM d GROUP BY 1 ORDER BY shard""".stripMargin,

    "mix_token_budget" ->
      s"""WITH d AS (
         |  SELECT lang, len($toksSql) AS n_tok FROM documents),
         |t AS (
         |  SELECT lang, CAST(sum(n_tok) AS BIGINT) AS n_tokens,
         |    CAST(floor(sqrt(CAST(sum(n_tok) AS DOUBLE)) * 1000) AS BIGINT)
         |      AS w
         |  FROM d GROUP BY lang),
         |b AS (
         |  SELECT lang, n_tokens, w, sum(w) OVER () AS s FROM t),
         |c AS (
         |  SELECT lang, n_tokens, w,
         |    CAST((100000 * w) // s AS BIGINT) AS alloc_base,
         |    (100000 * w) % s AS rem
         |  FROM b),
         |e AS (
         |  SELECT lang, n_tokens, w, alloc_base,
         |    100000 - sum(alloc_base) OVER () AS leftover,
         |    row_number() OVER (ORDER BY rem DESC, lang) AS rk
         |  FROM c)
         |SELECT lang, n_tokens, w, alloc_base,
         |  CAST(rk <= leftover AS BIGINT) AS topup,
         |  CAST(alloc_base + CAST(rk <= leftover AS BIGINT) AS BIGINT)
         |    AS alloc
         |FROM e ORDER BY lang""".stripMargin,

    "shards_manifest" -> {
      // md5-48 prefix of the text as a BIGINT: 12 nibbles, big-endian
      // (the slotSql idiom widened to 48 bits)
      val h = (0 until 12).map { i =>
        val mult = BigInt(16).pow(11 - i)
        s"(strpos('0123456789abcdef', substr(md5(text), ${i + 1}, 1)) - 1) * $mult"
      }.mkString(" + ")
      s"""WITH d AS (
         |  SELECT doc_id, n_chars, CAST($h AS BIGINT) AS h FROM documents)
         |SELECT (${slotSql("doc_id")}) % 16 AS shard,
         |  count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS n_chars,
         |  bit_xor(h) AS h_xor,
         |  CAST(sum(h % 1000000007) AS BIGINT) AS h_sum
         |FROM d GROUP BY 1 ORDER BY shard""".stripMargin
    },

    "pref_pairs" ->
      s"""WITH qd AS (${qualitySql(", lang")}),
         |r AS (
         |  SELECT doc_id, lang, q,
         |    row_number() OVER (PARTITION BY lang ORDER BY q DESC, doc_id)
         |      AS rk,
         |    count(*) OVER (PARTITION BY lang) AS n
         |  FROM qd),
         |c AS (SELECT lang, rk AS i, doc_id AS chosen_doc, q AS q_chosen
         |      FROM r WHERE rk <= n // 4),
         |x AS (SELECT lang, n - rk + 1 AS i, doc_id AS rejected_doc,
         |        q AS q_rejected
         |      FROM r WHERE rk > n - n // 4)
         |SELECT c.lang, c.i AS pair_id, chosen_doc, rejected_doc,
         |  q_chosen, q_rejected, round(q_chosen - q_rejected, 4) AS margin
         |FROM c JOIN x ON x.lang = c.lang AND x.i = c.i
         |ORDER BY c.lang, pair_id""".stripMargin,

    "pref_pairs_topk" ->
      s"""WITH qd AS (${qualitySql(", lang")}),
         |c AS (
         |  SELECT lang, rn AS i, doc_id AS chosen_doc, q AS q_chosen FROM (
         |    SELECT lang, doc_id, q, row_number() OVER (PARTITION BY lang
         |      ORDER BY q DESC, doc_id) AS rn
         |    FROM qd) WHERE rn <= 16),
         |x AS (
         |  SELECT lang, rn AS i, doc_id AS rejected_doc, q AS q_rejected
         |  FROM (
         |    SELECT lang, doc_id, q, row_number() OVER (PARTITION BY lang
         |      ORDER BY q ASC, doc_id DESC) AS rn
         |    FROM qd) WHERE rn <= 16)
         |SELECT c.lang, c.i AS pair_id, chosen_doc, rejected_doc,
         |  q_chosen, q_rejected, round(q_chosen - q_rejected, 4) AS margin
         |FROM c JOIN x ON x.lang = c.lang AND x.i = c.i
         |ORDER BY c.lang, pair_id""".stripMargin,

    "quality_ensemble" ->
      s"""WITH qd AS (${qualitySql(", lang")}),
         |sig AS (
         |  SELECT d.doc_id, d.lang, qd.q,
         |    round(len(list_distinct($ctoksSql)) * 1.0 /
         |      len($ctoksSql), 4) AS ttr,
         |    CAST(len($ctoksSql) AS BIGINT) AS n_words
         |  FROM documents d JOIN qd ON qd.doc_id = d.doc_id),
         |rr AS (
         |  SELECT doc_id, lang,
         |    row_number() OVER (PARTITION BY lang ORDER BY q DESC, doc_id)
         |      AS r_q,
         |    row_number() OVER (PARTITION BY lang ORDER BY ttr DESC, doc_id)
         |      AS r_ttr,
         |    row_number() OVER (PARTITION BY lang
         |      ORDER BY n_words DESC, doc_id) AS r_len
         |  FROM sig),
         |f AS (
         |  SELECT *, round(1.0 / (60 + r_q) + 1.0 / (60 + r_ttr)
         |    + 1.0 / (60 + r_len), 6) AS rrf
         |  FROM rr),
         |g AS (
         |  SELECT *, row_number() OVER (PARTITION BY lang
         |    ORDER BY rrf DESC, doc_id) AS final_rk
         |  FROM f)
         |SELECT lang, final_rk, doc_id, r_q, r_ttr, r_len, rrf
         |FROM g WHERE final_rk <= 10 ORDER BY lang, final_rk""".stripMargin,

    "eval_bt_leaderboard" -> {
      val iterCtes = (1 to 3).map { r =>
        val prev = s"s${r - 1}"
        s"""den$r AS (
           |  SELECT m.i, list_reduce(list_prepend(0.0::DOUBLE,
           |      list(CAST(m.n AS DOUBLE) / greatest(si.s + sj.s, 1e-12)
           |        ORDER BY m.j)),
           |    (a, x) -> a + x) AS den
           |  FROM m JOIN $prev si ON si.i = m.i JOIN $prev sj ON sj.i = m.j
           |  GROUP BY m.i),
           |raw$r AS (
           |  SELECT w.i, w.wi / d.den AS raw FROM wins w
           |  JOIN den$r d ON d.i = w.i),
           |s$r AS (
           |  SELECT i, round(raw / (SELECT max(raw) FROM raw$r), 6) AS s
           |  FROM raw$r)""".stripMargin
      }.mkString(",\n")
      s"""WITH qd AS (${qualitySql(", source")}),
         |b AS (SELECT doc_id, source, doc_id % 10 AS bucket, q FROM qd),
         |reps AS (
         |  SELECT bucket, source, q, doc_id FROM (
         |    SELECT *, row_number() OVER (PARTITION BY bucket, source
         |      ORDER BY doc_id) AS rk
         |    FROM b) WHERE rk = 1),
         |games AS (
         |  SELECT a.source AS sa, a2.source AS sb,
         |    CASE WHEN a.q > a2.q OR (a.q = a2.q AND a.doc_id < a2.doc_id)
         |      THEN 1 ELSE 0 END AS win_a
         |  FROM reps a JOIN reps a2
         |    ON a.bucket = a2.bucket AND a.source < a2.source),
         |dir AS (
         |  SELECT sa AS i, sb AS j, win_a AS w FROM games
         |  UNION ALL
         |  SELECT sb AS i, sa AS j, 1 - win_a AS w FROM games),
         |m AS (SELECT i, j, count(*) AS n, CAST(sum(w) AS BIGINT) AS w
         |      FROM dir GROUP BY 1, 2),
         |wins AS (
         |  SELECT i, CAST(sum(w) AS DOUBLE) AS wi,
         |    CAST(sum(n) AS BIGINT) AS n_matches,
         |    CAST(sum(w) AS BIGINT) AS wins
         |  FROM m GROUP BY i),
         |s0 AS (SELECT i, 1.0 AS s FROM wins),
         |$iterCtes
         |SELECT w.i AS source, w.n_matches, w.wins, s3.s AS strength,
         |  row_number() OVER (ORDER BY s3.s DESC, w.i) AS rank
         |FROM s3 JOIN wins w ON w.i = s3.i ORDER BY rank""".stripMargin
    })
}
