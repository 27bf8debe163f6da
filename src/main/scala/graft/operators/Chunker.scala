package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Rolling-hash window width for content-defined chunking. */
  val CdcWindow = 8

  /** Boundary divisor: a position is a cut when its window hash ≡ 0
    * (mod CdcMask) — expected chunk length ≈ CdcMask chars. */
  val CdcMask = 64

  /** CONTENT-DEFINED chunking (the Rabin/FastCDC family — LBFS,
    * Muthitacharoen et al. SOSP 2001): chunk boundaries are where a
    * rolling hash of the last [[CdcWindow]] chars hits 0 mod
    * [[CdcMask]], so boundaries depend only on LOCAL content — an
    * insertion early in a document shifts every fixed-width chunk
    * after it, but CDC boundaries re-synchronize within one window
    * and all later chunks hash identically again. That re-sync is
    * what makes chunk-level dedup robust to edits, the property
    * [[tokenChunks]]' positional grid lacks. (Real FastCDC adds
    * min/max chunk-size clamps to tighten the size distribution; they
    * are a sizing optimization, deliberately omitted so the boundary
    * set stays a pure per-position predicate — no sequential scan
    * state, which keeps both engines' computations identical and
    * order-free.)
    *
    * Entirely ROW-LOCAL and codegen'd: one pass builds the code-point
    * array (bound ONCE as a real column — the no-CSE discipline), the
    * candidate filter evaluates the 8-char Horner fold per position
    * (O(8n) integer ops, exact in BIGINT: max |h| < 31⁷·2¹⁶ < 2⁶¹),
    * and the chunk expansion is one generator. No shuffle, no state —
    * the 100 TB shape.
    *
    * One row per chunk: (id, chunk_idx, chunk, chunk_len, chunk_hash).
    * A document shorter than the window is one whole-document chunk. */
  /** Let-binding via a single-element transform (the TextNorm
    * bindOnce discipline): HOF lambdas have no CSE and projection
    * collapse INLINES a withColumn alias into every reference — the
    * first cut of this operator re-evaluated the O(n) code-point
    * array inside every fold step (O(n²)·8 per row, observed as a
    * stage that never finished at 500 rows). */
  private def bindOnce(value: Column, body: Column => Column): Column =
    element_at(transform(array(value), body), 1)

  def cdcChunks(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val n = length(t)
    // NATIVE boundary walk (r16; guide step 4 — no Scala closures /
    // interpreted HOFs in the hot path): the original Column formula
    // — a code-point array + per-position 8-char window refold via
    // nested HOFs — cost O(window·n) interpreted lambda evaluations
    // per row (~0.75 ms/KB, the whole dedup_cdc family's dominant
    // term). expr.CdcBounds computes the identical BIGINT Horner
    // arithmetic over the identical code-point positions in a plain
    // JVM loop (CdcBoundsSpec pins expression ≡ HOF formula, incl.
    // non-ASCII and astral inputs; the shared DuckDB oracle replays
    // it unchanged).
    val boundsExpr = {
      import org.apache.spark.sql.GraftBridge.{column, expression}
      column(graft.functions.expr.CdcBounds(expression(t), CdcWindow, CdcMask))
    }
    val chunksExpr = bindOnce(boundsExpr, bounds =>
      transform(sequence(lit(1), size(bounds)), j => {
        val st = when(j === 1, lit(0)).otherwise(element_at(bounds, j - 1))
        struct((j - 1).cast("long").as("chunk_idx"),
          t.substr(st + 1, element_at(bounds, j) - st).as("chunk"))
      }))
    // n == 0 would emit one empty chunk (bounds = [0], chunk = ''), so
    // every empty document would share md5('') and count as a cross-doc
    // duplicate; match tokenChunks — an empty document yields no chunks.
    docs.filter(n > 0)
      .select(col(idCol), explode(chunksExpr).as("c"))
      .select(col(idCol), col("c.chunk_idx").as("chunk_idx"),
        col("c.chunk").as("chunk"),
        length(col("c.chunk")).cast("long").as("chunk_len"),
        md5(col("c.chunk")).as("chunk_hash"))
  }
}
