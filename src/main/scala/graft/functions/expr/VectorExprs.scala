package graft.functions.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expressions for dense-vector math.
  *
  * The higher-order-function formulation (`zip_with` + `aggregate`)
  * is CodegenFallback — every element multiply walks an interpreted
  * expression tree. These expressions generate a tight primitive loop
  * inside WholeStageCodegen instead (~10× on the ANN/dedup paths).
  * Accumulation is double, sequential left-to-right — bit-identical
  * to the HOF form and to DuckDB's list arithmetic, which the
  * correctness oracle compares against.
  *
  * Elements must be non-null float or double; embeddings are stored
  * `array<float>` (TESTDATA.md).
  */
trait VectorLoop { self: Expression =>
  protected def elemGet(childType: DataType): (String, String) =
    childType.asInstanceOf[ArrayType].elementType match {
      case FloatType  => ("getFloat", "(double)")
      case DoubleType => ("getDouble", "")
      case t => throw new IllegalArgumentException(s"unsupported element type $t")
    }

  protected def elemAt(a: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  protected def isFloatArr(childType: DataType): Boolean =
    childType.asInstanceOf[ArrayType].elementType == FloatType
}

/** Σ aᵢ·bᵢ over two equal-length numeric arrays. */
case class ArrayDot(left: Expression, right: Expression)
    extends BinaryExpression with VectorLoop {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val fa = isFloatArr(left.dataType)
    val fb = isFloatArr(right.dataType)
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += elemAt(a, i, fa) * elemAt(b, i, fb); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (getA, castA) = elemGet(left.dataType)
    val (getB, castB) = elemGet(right.dataType)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ($castA $a.$getA($i)) * ($castB $b.$getB($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** √(Σ aᵢ²). */
case class ArrayNorm(child: Expression) extends UnaryExpression with VectorLoop {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val f = isFloatArr(child.dataType)
    var acc = 0.0
    var i = 0
    val n = a.numElements()
    while (i < n) { val x = elemAt(a, i, f); acc += x * x; i += 1 }
    math.sqrt(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (get, cast) = elemGet(child.dataType)
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val x = ctx.freshName("x")
      s"""
         |int $n = $a.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = ($cast $a.$get($i));
         |  $acc += $x * $x;
         |}
         |${ev.value} = java.lang.Math.sqrt($acc);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
