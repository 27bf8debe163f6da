package graft.functions.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash of a string: h = fold(h·31 + codepoint)
  * mod (2³¹−1) — the classic Rabin-Karp document fingerprint, as a
  * codegen'd expression. The modulus keeps every intermediate inside
  * a signed 64-bit value (acc < 2³¹, acc·31 + c < 2³⁶), so the DuckDB
  * oracle reproduces it with plain BIGINT arithmetic
  * (`list_reduce([unicode(c) …], (acc, c) -> (acc*31+c) % 2147483647)`).
  *
  * Iterates UTF-16 code units, which equal code points for the BMP;
  * corpora with astral-plane characters would need codePointAt
  * iteration to match `unicode()`.
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  private val M = 2147483647L

  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    var h = 0L
    var i = 0
    while (i < s.length) { h = (h * 31 + s.charAt(i)) % M; i += 1 }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      s"""
         |String $s = $c.toString();
         |long $h = 0L;
         |for (int $i = 0; $i < $s.length(); $i++) {
         |  $h = ($h * 31 + $s.charAt($i)) % ${M}L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
