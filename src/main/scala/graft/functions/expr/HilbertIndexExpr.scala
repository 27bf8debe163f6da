package graft.functions.expr

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert-curve index of a 2-D cell — the clustering key with
  * strictly better locality than Morton/Z-order (consecutive indexes
  * are always Manhattan-adjacent cells; Z-order jumps at power-of-two
  * boundaries, so a z-range can span two far-apart rectangles).
  *
  * The per-level quadrant rotation makes the classic xy2d loop carry
  * MUTABLE (x, y) state across iterations — as a Column tree that
  * either re-evaluates the whole prefix per level or needs one
  * projection per level; as a native expression it is a 10-iteration
  * integer loop, codegen'd into whole-stage Java like any built-in.
  * Inputs are masked to the low `bits` bits (callers `pmod` negatives
  * first, as with [[graft.operators.ZOrder.zvalue2]]).
  *
  * The DuckDB oracle replays the same loop as a recursive CTE over
  * levels carrying (x, y, d) — see Layout.hilbertSql.
  */
case class HilbertIndex(left: Expression, right: Expression, bits: Int)
  extends BinaryExpression {

  require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val n = 1L << bits
    var x = a.asInstanceOf[Long] & (n - 1)
    var y = b.asInstanceOf[Long] & (n - 1)
    var d = 0L
    var s = n >> 1
    while (s > 0) {
      val rx = if ((x & s) != 0) 1L else 0L
      val ry = if ((y & s) != 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      // quadrant rotation reflects within the FULL n-grid (the
      // published xy2d form) — an s-sized reflection would go negative
      // for coordinates still carrying unconsumed high bits
      if (ry == 0) {
        if (rx == 1) { x = n - 1 - x; y = n - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val d = ctx.freshName("d")
      val s = ctx.freshName("s")
      val rx = ctx.freshName("rx")
      val ry = ctx.freshName("ry")
      val t = ctx.freshName("t")
      s"""
         |long $x = $a & ${(1L << bits) - 1}L;
         |long $y = $b & ${(1L << bits) - 1}L;
         |long $d = 0L;
         |for (long $s = ${1L << (bits - 1)}L; $s > 0; $s >>= 1) {
         |  long $rx = (($x & $s) != 0) ? 1L : 0L;
         |  long $ry = (($y & $s) != 0) ? 1L : 0L;
         |  $d += $s * $s * ((3 * $rx) ^ $ry);
         |  if ($ry == 0) {
         |    if ($rx == 1) {
         |      $x = ${(1L << bits) - 1}L - $x;
         |      $y = ${(1L << bits) - 1}L - $y;
         |    }
         |    long $t = $x; $x = $y; $y = $t;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
