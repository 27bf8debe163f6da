package graft.functions.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature in one pass: md5 each shingle ONCE, slice the hex
  * digest into `numHashes` disjoint `sliceLen`-char components, track
  * the minimum of each slice across the shingle set.
  *
  * Equivalent to `array((0..k).map(i => array_min(transform(hs,
  * substring(_, i*len+1, len)))))` but with one digest per shingle
  * instead of k re-evaluations of the interpreted transform tree —
  * the digest dominates, so this is ~k× cheaper. Output order and
  * values are byte-identical to the declarative form (and to the
  * DuckDB oracle's `list_aggregate([substr(md5(x), i*5+1, 5) ...],
  * 'min')`).
  */
case class MinHashSignature(child: Expression, numHashes: Int, sliceLen: Int)
    extends UnaryExpression with CodegenFallback {

  require(numHashes * sliceLen <= 32, "md5 digest has 32 hex chars")

  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  @transient private lazy val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val hexChars = "0123456789abcdef".toCharArray

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(Array.fill[Any](numHashes)(null))
    val mins = Array.fill[String](numHashes)(null)
    val md = digest.get()
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      md.reset()
      val dig = md.digest(s.getBytes)
      val hex = new Array[Char](32)
      var b = 0
      while (b < 16) {
        hex(b * 2) = hexChars((dig(b) >> 4) & 0xf)
        hex(b * 2 + 1) = hexChars(dig(b) & 0xf)
        b += 1
      }
      var h = 0
      while (h < numHashes) {
        val slice = new String(hex, h * sliceLen, sliceLen)
        if (mins(h) == null || slice.compareTo(mins(h)) < 0) mins(h) = slice
        h += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(m => UTF8String.fromString(m): Any))
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
