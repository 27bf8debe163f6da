package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Chunker

/** The native CdcBounds expression must reproduce the original HOF
  * Column formula bit-for-bit (r16: cdcChunks swapped the interpreted
  * per-position window refold for the tight-loop expression — this
  * spec IS the equivalence proof the swap rides on). */
class CdcBoundsSpec extends SparkSpec {
  import spark.implicits._

  /** The pre-r16 Column formula, verbatim (ascii(substr) code points,
    * per-position 8-char Horner refold, candidates < n, append n). */
  private def hofBounds(t: Column): Column = {
    val n = length(t)
    val cps = transform(sequence(lit(1), greatest(n, lit(1))),
      p => ascii(t.substr(p, lit(1))).cast("long"))
    def winHash(i: Column): Column = aggregate(
      sequence(i - lit(Chunker.CdcWindow - 1), i), lit(0L),
      (acc, p) => acc * 31 + element_at(cps, p))
    val cands = when(n >= Chunker.CdcWindow,
      filter(sequence(lit(Chunker.CdcWindow), n),
        i => winHash(i) % Chunker.CdcMask === 0))
      .otherwise(array().cast("array<int>"))
    concat(filter(cands, b => b < n), array(n))
  }

  private def nativeBounds(t: Column): Column = {
    import org.apache.spark.sql.GraftBridge.{column, expression}
    column(graft.functions.expr.CdcBounds(
      expression(t), Chunker.CdcWindow, Chunker.CdcMask))
  }

  test("native bounds ≡ HOF formula on planted strings") {
    val texts = Seq(
      "",                                     // degenerate (callers filter, still equal)
      "short",                                // below the window
      "exactly8",                             // n == window
      "a" * 200,                              // repetitive — many boundary hits
      ("the quick brown fox jumps over the lazy dog. " * 20),
      "naïve中文tör résumé 𝄞clef𝄞 emoji✓ mixed ascii tail " * 8,
      (0 until 500).map(i => ('a' + (i * 7 + i * i) % 26).toChar).mkString,
      "Subscribe to our newsletter for weekly updates. All rights reserved."
    )
    val df = texts.toDF("t")
      .select(col("t"), hofBounds(col("t")).as("hof"),
        nativeBounds(col("t")).as("nat"))
    val rows = df.collect()
    rows.foreach { r =>
      assert(r.getSeq[Int](1) == r.getSeq[Int](2),
        s"bounds diverge for ${r.getString(0).take(40)}")
    }
    // at least one non-trivial interior boundary actually occurred,
    // or the test proves nothing about the candidate arithmetic
    assert(rows.exists(_.getSeq[Int](2).length > 1))
  }

  test("cdcChunks end-to-end matches the HOF-derived chunk set") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog. " * 10),
      (2L, "naïve中文tör résumé and a long enough ascii tail here " * 5),
      (3L, "")).toDF("doc_id", "text")
    val got = Chunker.cdcChunks(docs, "doc_id", "text")
      .orderBy(col("doc_id"), col("chunk_idx")).collect()
    // re-derive chunks from the HOF bounds directly
    val exp = docs.filter(length(col("text")) > 0)
      .select(col("doc_id"), col("text"), hofBounds(col("text")).as("b"))
      .select(col("doc_id"), explode(transform(sequence(lit(1), size(col("b"))),
        j => struct((j - 1).cast("long").as("chunk_idx"),
          col("text").substr(
            when(j === 1, lit(0)).otherwise(element_at(col("b"), j - 1)) + 1,
            element_at(col("b"), j) -
              when(j === 1, lit(0)).otherwise(element_at(col("b"), j - 1)))
            .as("chunk")))).as("c"))
      .select(col("doc_id"), col("c.chunk_idx"), col("c.chunk"),
        length(col("c.chunk")).cast("long").as("chunk_len"),
        md5(col("c.chunk")).as("chunk_hash"))
      .orderBy(col("doc_id"), col("chunk_idx")).collect()
    assert(got.toSeq == exp.toSeq)
  }
}
