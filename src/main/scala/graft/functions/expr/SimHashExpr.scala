package graft.functions.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}

/** 16-bit SimHash of a token array in one pass — no explode, no
  * per-token rows, no vote-aggregation shuffle.
  *
  * Per token: hv = the first 16 bits of md5(token) (identical to
  * `conv(substring(md5(tok), 1, 4), 16, 10)`); each of hv's 16 bits
  * votes +1/-1; signature bit j is set where votes are positive.
  * Byte-identical to the declarative explode/groupBy form and to the
  * DuckDB oracle's nibble arithmetic.
  */
case class SimHash16(child: Expression) extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = IntegerType

  @transient private lazy val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](16)
    val md = digest.get()
    var i = 0
    while (i < n) {
      md.reset()
      val dig = md.digest(arr.getUTF8String(i).getBytes)
      val hv = ((dig(0) & 0xff) << 8) | (dig(1) & 0xff)
      var j = 0
      while (j < 16) {
        if (((hv >> j) & 1) == 1) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var sig = 0
    var j = 0
    while (j < 16) { if (votes(j) > 0) sig |= 1 << j; j += 1 }
    sig
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
