package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Token-budget document chunking with overlap — the PRODUCE-side
  * sibling of [[Packing]]: where packing concatenates whole documents
  * into fixed training bins, chunking SPLITS each document into
  * overlapping windows of at most `budget` tokens for a retrieval /
  * RAG corpus build (every serving index ingests chunks, not
  * documents, so context fits the embedding model's window; the
  * overlap keeps a fact that straddles a boundary retrievable from at
  * least one chunk).
  *
  * Layout: chunk i covers token positions [i·stride, i·stride+budget)
  * with stride = budget − overlap; the final chunk is a runt (shorter
  * than budget) whenever the token count is not aligned — it is still
  * emitted, because dropping it would silently lose the document
  * tail. A document with at most `budget` tokens yields exactly one
  * chunk; an empty document yields none.
  *
  * Scale shape: entirely ROW-LOCAL — tokenize, compute the chunk
  * count, expand via one generator; no shuffle, no state, no vocab.
  * Chunk geometry is deterministic (positional arithmetic over the
  * whitespace tokens), so re-chunking a grown corpus reproduces every
  * old chunk id/hash bit-for-bit — the property an incremental index
  * rebuild relies on.
  */
object Chunker {

  /** One row per chunk: (id, chunk_id, first_pos, n_tokens,
    * chunk_hash) — all offsets 0-based BIGINT, hash = md5 of the
    * space-joined chunk tokens. `overlap` must be smaller than
    * `budget`: stride = budget − overlap would otherwise be ≤ 0 and
    * the chunk sequence could not advance (every retrieval build that
    * "overlaps a full window" is a config bug, so it fails loudly). */
  def tokenChunks(docs: DataFrame, idCol: String, textCol: String,
                  budget: Int, overlap: Int): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    require(overlap >= 0 && overlap < budget,
      s"overlap must be in [0, budget): got overlap=$overlap, budget=$budget")
    val stride = budget - overlap
    val toks = TextAnalysis.wsTokens(col(textCol))
    // ceil via double division — exact here (token counts are array
    // sizes, far below 2^53; the dedup_chunks precedent)
    val nChunks = lit(1) + greatest(lit(0),
      ceil((size(toks) - lit(budget)).cast("double") / stride).cast("int"))
    val chunks = transform(sequence(lit(0), nChunks - 1), i => {
      val sl = slice(toks, i * stride + 1, lit(budget))
      struct(i.cast("long").as("chunk_id"),
        (i * stride).cast("long").as("first_pos"),
        size(sl).cast("long").as("n_tokens"),
        md5(array_join(sl, " ")).as("chunk_hash"))
    })
    docs.filter(size(toks) > 0)
      .select(col(idCol), explode(chunks).as("c"))
      .select(col(idCol), col("c.chunk_id").as("chunk_id"),
        col("c.first_pos").as("first_pos"),
        col("c.n_tokens").as("n_tokens"),
        col("c.chunk_hash").as("chunk_hash"))
  }
}
