package graft.functions.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunk boundaries of a string — the tight-loop twin
  * of [[graft.operators.Chunker.cdcChunks]]'s original HOF formula
  * (r16 optimization; the [[WordShingles]]/[[RollingHash]] rationale:
  * the per-position 8-char window refold is O(window·n) interpreted
  * lambda evaluations per row, ~0.75 ms/KB — a plain JVM loop over
  * the code points computes the identical BIGINT arithmetic ~50×
  * faster and codegens).
  *
  * Semantics pinned to the Column formula it replaces (CdcBoundsSpec
  * proves equality on planted strings incl. non-ASCII and astral
  * code points):
  *
  *   cps(p)   = ascii(substr(t, p, 1))  — the full CODE POINT (Spark's
  *              ascii returns the first character's code point, and
  *              substr counts code points, so astral chars are ONE
  *              position; charAt iteration would split surrogates)
  *   h(i)     = Horner fold acc·31 + cps over positions i−7..i (LONG)
  *   cands    = { i in [8, n] : h(i) % 64 == 0 }
  *   bounds   = [ i in cands : i < n ] ++ [ n ]     (n = code-point length)
  *
  * Returns array<int>; null input stays null (UnaryExpression's
  * null-intolerant default). Empty input returns [0] — callers filter
  * length > 0 first, matching the original expression which also
  * produced [0] only behind that filter.
  */
case class CdcBounds(child: Expression, window: Int, mask: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    new GenericArrayData(CdcBounds.bounds(s, window, mask))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.expr.CdcBounds.bounds($c.toString(), $window, $mask));
       """.stripMargin)

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object CdcBounds {
  /** The boundary walk as a plain JVM function (shared by eval and
    * codegen; also directly spec-testable against the HOF formula). */
  def bounds(s: String, window: Int, mask: Int): Array[Int] = {
    // code points, one slot per CHARACTER (substr semantics)
    val n0 = s.codePointCount(0, s.length)
    val cps = new Array[Int](n0)
    var i = 0
    var k = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      cps(k) = cp
      k += 1
      i += Character.charCount(cp)
    }
    val out = new java.util.ArrayList[Integer]()
    if (n0 >= window) {
      var p = window // 1-based candidate end position
      while (p <= n0) {
        var h = 0L
        var j = p - window
        while (j < p) { h = h * 31 + cps(j); j += 1 }
        if (h % mask == 0 && p < n0) out.add(p)
        p += 1
      }
    }
    val r = new Array[Int](out.size() + 1)
    var m = 0
    while (m < out.size()) { r(m) = out.get(m); m += 1 }
    r(out.size()) = n0
    r
  }
}
