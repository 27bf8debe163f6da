package graft.functions.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** 48-bit SimHash of a token array in one pass — no explode, no
  * per-token rows, no vote-aggregation shuffle.
  *
  * Per token: hv = the first 48 bits of md5(token) (equivalently
  * `conv(substring(md5(tok), 1, 12), 16, 10)`); each of hv's 48 bits
  * votes +1/-1; signature bit j is set where votes are positive.
  *
  * 48 bits (not 64) so the value stays positive in a signed BIGINT:
  * the DuckDB oracle reproduces the bit votes with arithmetic `>>`,
  * which would disagree on a negative 64-bit value. 16 bits is far
  * too narrow for a shared-vocabulary corpus — similar vote vectors
  * collide (observed: 193k false pairs over 5.6k docs).
  */
case class SimHash48(child: Expression) extends UnaryExpression with CodegenFallback {

  private val Bits = 48

  override def dataType: DataType = LongType

  @transient private lazy val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](Bits)
    val md = digest.get()
    var i = 0
    while (i < n) {
      md.reset()
      val dig = md.digest(arr.getUTF8String(i).getBytes)
      var hv = 0L
      var b = 0
      while (b < 6) { hv = (hv << 8) | (dig(b) & 0xffL); b += 1 }
      var j = 0
      while (j < Bits) {
        if (((hv >> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < Bits) { if (votes(j) > 0) sig |= 1L << j; j += 1 }
    sig
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
