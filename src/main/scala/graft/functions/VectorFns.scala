package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>` embedding columns, written as
  * higher-order `functions._` expressions (zip_with / aggregate /
  * transform) so they stay codegen'd — no UDF serialization on the
  * 100 TB path.
  *
  * All arithmetic is promoted to double before accumulating
  * (sequential left fold, matching the reference engines' loop order)
  * so results are reproducible across engines to the last ulp.
  */
object VectorFns {

  import org.apache.spark.sql.GraftBridge.{column, expression}

  import graft.functions.expr.{ArrayDot, ArrayNorm}

  private def d(c: Column): Column = transform(c, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    column(ArrayDot(expression(a), expression(b)))

  def norm(a: Column): Column =
    column(ArrayNorm(expression(a)))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  def l2Dist(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(d(a), d(b), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x))
}
