package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BoundReference, Descending, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator top-k-per-key: logical node + planner strategy +
  * physical plan, the (c)-tier extension path from SURVEY §4.
  *
  * Semantics: for each key group, exactly the rows that
  * `row_number() OVER (PARTITION BY keys ORDER BY order DESC, tie ASC)
  * <= k` would keep, including Spark's default null ordering for those
  * directions (order: DESC NULLS LAST, tie: ASC NULLS FIRST). `order`
  * and `tie` may be any orderable types — the comparison is a real
  * SortOrder evaluation, not a numeric cast.
  *
  * Scale shape vs the window formulation: a window sorts EVERY group
  * fully after shuffling EVERY row. Here the planner emits
  *   partial TopKExec (map-side, bounded heaps, no distribution req)
  *   → shuffle on keys → final TopKExec,
  * so at most k rows per (partition × key) cross the wire and nothing
  * is ever fully sorted. The same plan shape Spark uses for
  * partial/final aggregation, applied to top-k pruning.
  *
  * Memory contract: each task holds k rows per distinct key seen in
  * its partition — O(k × |keys per partition|), the same bound as a
  * hash aggregate, but WITHOUT a spill path. With the grouping keys
  * this engine uses (segments, bands, entities) that is bounded and
  * small; a caller with unbounded-cardinality keys should use the
  * window formulation instead. A guard trips with a clear error well
  * before the heap map would OOM a sanely-sized executor.
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

object TopKPerKeyExec {
  /** Distinct-keys-per-task backstop: beyond this the operator's
    * no-spill heap map is the wrong tool and we fail fast instead of
    * OOMing the executor. */
  val MaxKeysPerPartition: Int = 4 << 20
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
    // empty keys = GLOBAL top-k: the partial execs prune each input
    // partition to k rows, the final exec merges them in one task
    // (ClusteredDistribution(Nil) is rejected by Spark)
    else if (keys.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val ordExpr = order
    val tieExpr = tie
    val childOutput = child.output
    val kk = k
    child.execute().mapPartitions { rows =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val rankProj = UnsafeProjection.create(Seq(ordExpr, tieExpr), childOutput)
      // Row strength = its sort position under (order DESC, tie ASC)
      // with those directions' default null ordering — the exact
      // ordering of the row_number window this operator replaces.
      val strength = RowOrdering.create(Seq(
        SortOrder(BoundReference(0, ordExpr.dataType, ordExpr.nullable), Descending),
        SortOrder(BoundReference(1, tieExpr.dataType, tieExpr.nullable), Ascending)),
        Seq.empty)
      // per key: a heap whose head is the WEAKEST kept row (largest
      // sort position).
      implicit val weakestFirst: Ordering[(UnsafeRow, UnsafeRow)] =
        strength.on[(UnsafeRow, UnsafeRow)](_._1)
      val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[(UnsafeRow, UnsafeRow)]]
      rows.foreach { row =>
        val key = keyProj(row)
        val heap = heaps.getOrElse(key, {
          if (heaps.size >= TopKPerKeyExec.MaxKeysPerPartition) {
            throw new IllegalStateException(
              s"TopKPerKeyExec: > ${TopKPerKeyExec.MaxKeysPerPartition} distinct keys " +
                "in one task; this no-spill operator is for bounded key domains — " +
                "use the window formulation (row_number) for unbounded keys")
          }
          val h = mutable.PriorityQueue.empty[(UnsafeRow, UnsafeRow)]
          heaps.update(key.copy(), h)
          h
        })
        if (heap.size < kk) {
          heap.enqueue((rankProj(row).copy(), row.asInstanceOf[UnsafeRow].copy()))
        } else if (strength.compare(rankProj(row), heap.head._1) < 0) {
          // strictly stronger than the weakest kept row → replace
          heap.dequeue()
          heap.enqueue((rankProj(row).copy(), row.asInstanceOf[UnsafeRow].copy()))
        }
      }
      heaps.valuesIterator.flatMap(_.iterator.map(_._2: InternalRow))
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}
