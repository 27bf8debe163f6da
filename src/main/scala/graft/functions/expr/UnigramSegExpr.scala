package graft.functions.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Viterbi segmentation of one word against a sorted vocabulary — the
  * tight-loop twin of [[graft.operators.UnigramLm.segment]]'s original
  * shape (r17 optimization; the [[CdcBounds]] rationale): the old plan
  * exploded every (i, len≤MaxPiece) span (an interpreted HOF), joined
  * the vocabulary, re-assembled a per-word span-cost map with a
  * vocabulary-wide groupBy(w) SHUFFLE, then ran two O(n²) interpreted
  * `aggregate` folds per word. This expression computes the identical
  * BIGINT DP in one codegen'd JVM call per word against the broadcast
  * vocabulary — no explode, no join, no shuffle, no lambda evals.
  *
  * Inputs: `word` (string), `keys`/`costs` — the vocabulary as
  * parallel arrays, keys sorted ASCENDING IN UTF8 BINARY ORDER (the
  * `sort_array(collect_list(struct(piece, cost)))` output; pieces are
  * unique). Semantics pinned to the Column formula it replaces
  * (UnigramLmSpec + the stash-diff oracle prove equality):
  *
  *   spans     = { (i, l) : 1 ≤ i, 1 ≤ l ≤ maxPiece, i+l−1 ≤ n }
  *               (n = code-point length; substr counts code points)
  *   c(i, l)   = cost of piece word.substr(i, l), Inf on vocab miss
  *               (the original's coalesce(element_at(m, k), Inf))
  *   s[0]      = 0
  *   s[pos]    = min over l=1..maxPiece of
  *               (l ≤ pos ? s[pos−l] + c(pos−l+1, l) : Inf)
  *   backtrace = from p = n: longest l in maxPiece..2 with p ≥ l and
  *               s[p−l] + c(p−l+1, l) == s[p], else 1 (ties prefer
  *               longer — the original's chosenLen fold order)
  *
  * Returns struct<seg: array<string>, score: bigint> where score =
  * s[n]. Returns NULL when ZERO spans hit the vocabulary (the word
  * would have vanished in the original's INNER span→cost join) —
  * callers filter isNotNull, restoring the exact drop semantics; the
  * documented char-coverage precondition means trainer-produced
  * vocabularies never hit this. Empty words also return null (no
  * spans exist, so the inner join dropped them too).
  */
case class UnigramSeg(first: Expression, second: Expression,
    third: Expression, maxPiece: Int, inf: Long)
    extends TernaryExpression {

  override def dataType: DataType = UnigramSeg.OutType
  override def nullable: Boolean = true

  override protected def nullSafeEval(w: Any, k: Any, v: Any): Any =
    UnigramSeg.segWord(w.asInstanceOf[UTF8String],
      k.asInstanceOf[ArrayData], v.asInstanceOf[ArrayData], maxPiece, inf)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (w, k, v) =>
      s"""
         |${ev.value} = graft.functions.expr.UnigramSeg.segWord(
         |  $w, $k, $v, $maxPiece, ${inf}L);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin)

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

object UnigramSeg {

  val OutType: StructType = StructType(Seq(
    StructField("seg", ArrayType(StringType, containsNull = false)),
    StructField("score", LongType)))

  /** Binary search `piece` in the UTF8-binary-sorted `keys`; −1 on
    * miss. UTF8String.compareTo IS unsigned-byte order — the same
    * total order sort_array applies to StringType. */
  private def find(keys: ArrayData, nk: Int, piece: UTF8String): Int = {
    var lo = 0
    var hi = nk - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val cmp = keys.getUTF8String(mid).compareTo(piece)
      if (cmp == 0) return mid
      else if (cmp < 0) lo = mid + 1
      else hi = mid - 1
    }
    -1
  }

  /** The DP as a plain JVM function (shared by eval and codegen;
    * directly spec-testable against the HOF formula). */
  def segWord(w: UTF8String, keys: ArrayData, costs: ArrayData,
      maxPiece: Int, inf: Long): InternalRow = {
    val n = w.numChars()
    if (n == 0) return null
    val nk = keys.numElements()
    // span costs, flat [pos-1][l-1]; vocab miss = Inf (exactly the
    // original's coalesce(map lookup, Inf) — not a sentinel)
    val c = new Array[Long](n * maxPiece)
    var hits = 0
    var pos = 1
    while (pos <= n) {
      var l = 1
      while (l <= maxPiece && l <= pos) {
        val idx = find(keys, nk, w.substringSQL(pos - l + 1, l))
        if (idx >= 0) { c((pos - 1) * maxPiece + (l - 1)) = costs.getLong(idx); hits += 1 }
        else c((pos - 1) * maxPiece + (l - 1)) = inf
        l += 1
      }
      pos += 1
    }
    if (hits == 0) return null
    // forward scores: least over maxPiece candidates, position-invalid
    // candidates contribute the literal Inf (they participate in the
    // min exactly as the original's when(...).otherwise(lit(Inf)))
    val s = new Array[Long](n + 1)
    pos = 1
    while (pos <= n) {
      var best = Long.MaxValue
      var l = 1
      while (l <= maxPiece) {
        val cd = if (l <= pos) s(pos - l) + c((pos - 1) * maxPiece + (l - 1)) else inf
        if (cd < best) best = cd
        l += 1
      }
      s(pos) = best
      pos += 1
    }
    // backtrace, longest-tie-wins
    val segRev = new java.util.ArrayList[UTF8String]()
    var p = n
    while (p > 0) {
      var chosen = 1
      var l = maxPiece
      while (l >= 2 && chosen == 1) {
        if (p >= l && s(p - l) + c((p - 1) * maxPiece + (l - 1)) == s(p)) chosen = l
        l -= 1
      }
      segRev.add(w.substringSQL(p - chosen + 1, chosen))
      p -= chosen
    }
    val m = segRev.size()
    val seg = new Array[AnyRef](m)
    var j = 0
    while (j < m) { seg(j) = segRev.get(m - 1 - j); j += 1 }
    new GenericInternalRow(Array[Any](new GenericArrayData(seg), s(n)))
  }
}
