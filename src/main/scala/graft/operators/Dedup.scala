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

  /** MinHash signature component i: the minimum md5 of `i:shingle`
    * over the document's shingle set (string-min minhash — portable,
    * no integer hash needed). */
  private def minhashComponent(sh: org.apache.spark.sql.Column, i: Int) =
    array_min(transform(sh, s => md5(concat(lit(i + ":"), s))))

  /** MinHash + LSH near-dup pairs.
    *
    * numHashes signature components, grouped into bands of `rowsPerBand`;
    * documents colliding on any band hash become candidates; candidates
    * are verified with true shingle-set Jaccard >= threshold. The only
    * wide shuffle is keyed on (band_index, band_hash).
    */
  def minhashLsh(df: DataFrame, idCol: String, textCol: String,
                 shingleK: Int = 3, numHashes: Int = 6, rowsPerBand: Int = 2,
                 threshold: Double = 0.5): DataFrame = {
    val sh = shingled(df, idCol, textCol, shingleK).filter(size(col("sh")) > 0)
    val sig = sh.select(col("id"), col("sh"),
      array((0 until numHashes).map(i => minhashComponent(col("sh"), i)): _*).as("sig"))
    val numBands = numHashes / rowsPerBand
    val banded = sig.select(col("id"), col("sh"),
      posexplode(array((0 until numBands).map(b =>
        md5(concat_ws("|", (0 until rowsPerBand).map(r =>
          col("sig").getItem(b * rowsPerBand + r)): _*))): _*)).as(Seq("band", "bh")))
    val a = banded.select(col("band"), col("bh"), col("id").as("id_a"), col("sh").as("sh_a"))
    val b = banded.select(col("band"), col("bh"), col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("band", "bh"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sh_a"), col("sh_b"))
      .distinct()
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** 16-bit SimHash signature: per-token md5 nibbles vote on each bit.
    * Output: (id, simhash). Pair-finding joins on the signature (or on
    * rotated bands for hamming > 0). */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol).as("id"),
      array_distinct(TextAnalysis.wsTokens(TextAnalysis.canonicalize(col(textCol)))).as("toks"))
      .filter(size(col("toks")) > 0)
    // per-token 16-bit value from the first 4 hex chars of md5
    val tok = toks.select(col("id"), explode(col("toks")).as("tok"))
      .withColumn("hv", conv(substring(md5(col("tok")), 1, 4), 16, 10).cast("int"))
    val bitVotes = (0 until 16).map { j =>
      sum(when((shiftright(col("hv"), j).bitwiseAND(lit(1))) === 1, 1).otherwise(-1)).as(s"v$j")
    }
    val voted = tok.groupBy(col("id")).agg(bitVotes.head, bitVotes.tail: _*)
    val sig = (0 until 16).map(j =>
      when(col(s"v$j") > 0, lit(1 << j)).otherwise(lit(0))).reduce(_ + _)
    voted.select(col("id"), sig.as("simhash"))
  }

  /** SimHash duplicate pairs at hamming distance 0 (signature
    * equality — the degenerate band). */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val s = simhash(df, idCol, textCol)
    val a = s.select(col("simhash"), col("id").as("id_a"))
    val b = s.select(col("simhash"), col("id").as("id_b"))
    a.join(b, Seq("simhash")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("simhash"))
  }

  /** Character n-gram Jaccard near-dup pairs via gram inverted index. */
  def ngramJaccard(df: DataFrame, idCol: String, textCol: String,
                   k: Int = 3, threshold: Double = 0.25): DataFrame = {
    val grams = df.select(col(idCol).as("id"),
      TextAnalysis.charGrams(col(textCol), k).as("g"))
      .filter(size(col("g")) > 0)
      .withColumn("n", size(col("g")))
    val a = grams.select(col("id").as("id_a"), col("n").as("n_a"), explode(col("g")).as("gram"))
    val b = grams.select(col("id").as("id_b"), col("n").as("n_b"), explode(col("g")).as("gram"))
    a.join(b, Seq("gram"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("n_a"), col("id_b"), col("n_b"))
      .agg(count(lit(1)).as("common"))
      .withColumn("jaccard",
        col("common").cast("double") / (col("n_a") + col("n_b") - col("common")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Embedding-cosine near-dup pairs. `blockCol` optionally restricts
    * comparison to equal-valued blocks (e.g. an LSH bucket or cluster
    * label) — without it this is brute force and the caller must keep
    * one side small. */
  def embeddingPairs(df: DataFrame, idCol: String, vecCol: String,
                     threshold: Double, blockCol: Option[String] = None): DataFrame = {
    val base = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      blockCol.map(col).getOrElse(lit(0)).as("blk"))
    val a = base.select(col("blk"), col("id").as("id_a"), col("v").as("v_a"))
    val b = base.select(col("blk"), col("id").as("id_b"), col("v").as("v_b"))
    a.join(b, Seq("blk"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", VectorFns.cosine(col("v_a"), col("v_b")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }
}
