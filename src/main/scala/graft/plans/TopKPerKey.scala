package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Cast, Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Whole-operator top-k-per-key: logical node + planner strategy +
  * physical plan, the (c)-tier extension path from SURVEY §4.
  *
  * Semantics: for each key group, keep the k rows with the largest
  * `order` value; ties broken by the smaller `tie` value — i.e. the
  * rows `row_number() OVER (PARTITION BY keys ORDER BY order DESC,
  * tie ASC) <= k` would keep.
  *
  * Scale shape vs the window formulation: a window sorts EVERY group
  * fully after shuffling EVERY row. Here the planner emits
  *   partial TopKExec (map-side, bounded heaps, no distribution req)
  *   → shuffle on keys → final TopKExec,
  * so at most k rows per (partition × key) cross the wire and nothing
  * is ever fully sorted. The same plan shape Spark uses for
  * partial/final aggregation, applied to top-k pruning.
  */
case class TopKPerKey(
    keys: Seq[Expression],
    order: Expression,
    tie: Expression,
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

/** Plans TopKPerKey as partial → (shuffle) → final. Registered via
  * `spark.experimental.extraStrategies` (see operators.TopK) or
  * GraftExtensions. */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, tie, k, child) =>
      TopKPerKeyExec(keys, order, tie, k, partial = false,
        TopKPerKeyExec(keys, order, tie, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Expression,
    tie: Expression,
    k: Int,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val ordExpr = Cast(order, DoubleType)
    val tieExpr = Cast(tie, LongType)
    val childOutput = child.output
    val kk = k
    child.execute().mapPartitions { rows =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ordProj = UnsafeProjection.create(Seq(ordExpr, tieExpr), childOutput)
      // per key: a min-heap whose head is the WEAKEST kept row —
      // weakest = smallest order value, then largest tie value.
      implicit val weakestFirst: Ordering[(Double, Long, UnsafeRow)] =
        Ordering.by[(Double, Long, UnsafeRow), (Double, Long)](t => (-t._1, t._2))
      val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[(Double, Long, UnsafeRow)]]
      rows.foreach { row =>
        val key = keyProj(row)
        val ov = ordProj(row)
        val o = ov.getDouble(0)
        val t = ov.getLong(1)
        val heap = heaps.getOrElseUpdate(key.copy(),
          mutable.PriorityQueue.empty[(Double, Long, UnsafeRow)])
        if (heap.size < kk) {
          heap.enqueue((o, t, row.asInstanceOf[UnsafeRow].copy()))
        } else {
          val (wo, wt, _) = heap.head
          // replace the weakest if this row is stronger
          if (o > wo || (o == wo && t < wt)) {
            heap.dequeue()
            heap.enqueue((o, t, row.asInstanceOf[UnsafeRow].copy()))
          }
        }
      }
      heaps.valuesIterator.flatMap(_.iterator.map(_._3: InternalRow))
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}
