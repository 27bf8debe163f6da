package graft.functions.expr

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic md5-register HyperLogLog distinct estimate as a
  * native `TypedImperativeAggregate` — the mergeable, no-Expand plan
  * for multi-column profiling. Each aggregate carries one 64-byte
  * register buffer that partial-aggregates map-side and merges by
  * element-wise max, so N approx-distinct columns cost N tiny buffers
  * over ONE scan, where N exact `countDistinct`s plan through Expand
  * (N× input replication + a distinct shuffle per column).
  *
  * The register math is EXACTLY `operators.Sketch.hllDistinct`'s
  * column formulation (m=64 registers keyed by the first md5 byte mod
  * 64, rank = leading-zero rank of the next 20 md5 bits, harmonic sum
  * of powers of two — exact in double in any summation order), so an
  * external engine replays registers AND estimate bit-for-bit; the
  * `table_profile_approx` oracle does. Below the standard 2.5·m raw
  * threshold the estimate switches to linear counting
  * m·ln(m/emptyRegisters) — ln over the 63 possible arguments is
  * bit-identical between the JDK and DuckDB libm (verified), and the
  * branch condition itself is exact-double, so the correction stays
  * inside the oracle gate.
  *
  * Input is the value cast to string BY SPARK (callers write
  * `col.cast("string")`), keeping date/timestamp renderings identical
  * to the engine's own cast — the same rendering the exact
  * `table_profile` min/max columns already hash-match through.
  * Nulls are skipped, matching `countDistinct`.
  */
case class HllEst(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]]
  with UnaryLike[Expression] {

  private val m = 64

  // AbstractDataType (ImplicitCastInputTypes' vocabulary) is
  // private[sql]; callers cast explicitly (`col.cast("string")`), and
  // the SQL path gets a clear analysis error instead of a silent cast.
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hll_est expects a STRING input (cast the value); got ${child.dataType.sql}")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def prettyName: String = "hll_est"

  @transient private lazy val digest = MessageDigest.getInstance("MD5")

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      digest.reset()
      val h = digest.digest(v.asInstanceOf[UTF8String].getBytes)
      val b = h(0) & 0x3f // first md5 byte mod 64
      // next 20 md5 bits (hex chars 3-7 of the digest string)
      val x = ((h(1) & 0xff) << 12) | ((h(2) & 0xff) << 4) | ((h(3) & 0xff) >>> 4)
      // leading-zero rank: 1 when the top bit is set … 21 when all clear
      val r = (if (x == 0) 21 else Integer.numberOfLeadingZeros(x) - 11).toByte
      if (r > buf(b)) buf(b) = r
    }
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (other(i) > buf(i)) buf(i) = other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Byte]): Any = {
    // Σ 2^-reg over used registers + 2^0 per never-touched register —
    // all powers of two, exact in double in any order (SURVEY §4 rule)
    var denom = 0.0
    var empty = 0
    var i = 0
    while (i < m) {
      if (buf(i) == 0) { denom += 1.0; empty += 1 }
      else denom += java.lang.Math.pow(2.0, -buf(i).toDouble)
      i += 1
    }
    val raw = 0.709 * m * m / denom
    // standard small-range correction: linear counting while raw is
    // below 2.5·m and some register is still empty
    if (raw <= 2.5 * m && empty > 0) m * java.lang.Math.log(m.toDouble / empty)
    else raw
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(storage: Array[Byte]): Array[Byte] = storage.clone()

  override def withNewMutableAggBufferOffset(newOffset: Int): HllEst =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllEst =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(c: Expression): HllEst = copy(child = c)
}
