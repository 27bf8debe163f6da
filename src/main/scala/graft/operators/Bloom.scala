package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic Bloom filter for runtime join pruning — the
  * build-on-the-small-side, filter-the-big-side-before-the-shuffle
  * pattern (Spark's own `runtime.bloomFilter` rewrite, made explicit,
  * deterministic, and engine-portable).
  *
  * Hashing is the repo-standard md5-slice trick: position j of a key
  * is the j-th 4-hex-char (16-bit) slice of md5(key) mod `bits` — so
  * an external engine reproduces the bit positions exactly, and a
  * query that prunes with the filter then exact-verifies is provably
  * semantics-preserving under a plain-join oracle (Bloom filters have
  * no false negatives; the verify join removes false positives).
  *
  * Scale shape: the build is one shuffle of (word) keys on the SMALL
  * side only, densified and packed into a single row holding an
  * `Array[Long]` bitmask (bits/64 words — a few KB, broadcast once).
  * The probe is a map-side `crossJoin(broadcast(oneRow))` + an O(k)
  * filter per row with O(1) array indexing: ZERO added shuffle on the
  * big side, which is the entire point at 100 TB — rows that fail the
  * filter never reach the join exchange.
  */
object Bloom {

  /** 16-bit md5 slice j of `key`, reduced mod `bits`. Slices are
    * disjoint hex ranges of one digest — independent enough for the
    * standard FP bound, one md5 eval per row after subexpr elimination. */
  private def position(key: Column, j: Int, bits: Int): Column =
    conv(substring(md5(key.cast("string")), j * 4 + 1, 4), 16, 10)
      .cast("long") % bits

  /** A built filter: `packed` is ONE row with column `__graft_bloom_words`
    * (Array[Long], length bits/64). Carrying bits/hashes with the
    * table makes probing with mismatched hash parameters impossible. */
  case class Filter(packed: DataFrame, bits: Int, hashes: Int) {

    /** Predicate column: true iff all `hashes` positions of `key` are
      * set. Requires `__graft_bloom_words` in scope — see [[prune]]
      * (public since round 15 so StreamOps.decontaminateStream can
      * fold it over a doc's own shingle array row-locally). */
    def mayContain(key: Column): Column =
      (0 until hashes).map { j =>
        val pos = position(key, j, bits)
        val word = element_at(col("__graft_bloom_words"), (pos / 64).cast("int") + 1)
        (word.bitwiseAND(call_function("shiftleft", lit(1L), (pos % 64).cast("int"))) =!= 0L)
      }.reduce(_ && _)

    /** `df` rows whose `keyCol` may be in the filter — no false
      * negatives; false-positive rate ~ (1-e^(-kn/m))^k. Map-side
      * only: one broadcast of the packed row, no shuffle. */
    def prune(df: DataFrame, keyCol: String): DataFrame = {
      require(!df.columns.contains("__graft_bloom_words"),
        "probe DataFrame must not contain the reserved column __graft_bloom_words")
      df.crossJoin(broadcast(packed))
        .filter(mayContain(col(keyCol)))
        .drop("__graft_bloom_words")
    }
  }

  /** Build a filter over the (distinct) values of `keyCol`.
    *
    * bits must be a multiple of 64; hashes ≤ 8 (md5 has 32 hex chars).
    * Plan: positions → per-word bit_or (one small shuffle) → densify
    * against a literal word sequence → sort-pack into one array row.
    */
  def build(df: DataFrame, keyCol: String,
            bits: Int = 1 << 15, hashes: Int = 4): Filter = {
    require(bits % 64 == 0 && bits > 0, s"bits must be a positive multiple of 64, got $bits")
    require(hashes >= 1 && hashes * 4 <= 32, s"hashes must be in [1, 8], got $hashes")
    val nWords = bits / 64
    val pos = df.select(explode(array((0 until hashes).map(j =>
      position(col(keyCol), j, bits)): _*)).as("pos"))
    val words = pos
      .groupBy((col("pos") / 64).cast("int").as("w"))
      .agg(bit_or(call_function("shiftleft", lit(1L), (col("pos") % 64).cast("int"))).as("mask"))
    // Densify: every word index 0..nWords-1 present (missing = 0), so
    // the packed array is position-indexable by word.
    val dense = df.sparkSession.range(nWords)
      .select(col("id").cast("int").as("w"))
      .join(words, Seq("w"), "left")
      .select(col("w"), coalesce(col("mask"), lit(0L)).as("mask"))
    val packed = dense
      .agg(array_sort(collect_list(struct(col("w"), col("mask")))).as("wm"))
      .select(transform(col("wm"), x => x("mask")).as("__graft_bloom_words"))
    Filter(packed, bits, hashes)
  }
}
