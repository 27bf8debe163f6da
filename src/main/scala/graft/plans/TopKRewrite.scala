package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, Descending, EqualTo, Expression, LessThan, LessThanOrEqual, Literal, NullsFirst, NullsLast, RowNumber, SortOrder, WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rewrite: a `row_number() OVER (PARTITION BY p ORDER BY o
  * DESC, t ASC) <= k` filter whose rank column is immediately
  * projected away becomes the bounded-heap [[TopKPerKey]] operator —
  * users keep writing the idiomatic window formulation and the
  * planner swaps in partial/final heap pruning (at most k rows per
  * partition×key cross the shuffle instead of every row, and no group
  * is ever fully sorted).
  *
  * Deliberately narrow so the rewrite is always semantics-preserving:
  *  - exactly one window expression, and it is ROW_NUMBER (rank /
  *    dense_rank admit >k rows on ties — not equivalent);
  *  - ordering is exactly (o DESC NULLS LAST, t ASC NULLS FIRST) —
  *    Spark's default null placement, which TopKPerKeyExec implements;
  *  - the filter is a bare `rn <= k` / `rn < k` / `rn = 1` against an
  *    integer literal, k >= 1;
  *  - the projection above drops the rank column (TopKPerKey emits
  *    child rows only, unranked).
  *
  * Registered via [[graft.GraftExtensions]] (injectOptimizerRule).
  */
object TopKRewrite extends Rule[LogicalPlan] {

  private def kFromCond(cond: Expression, rn: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, Literal(k: Int, IntegerType))
      if a.semanticEquals(rn) && k >= 1 => Some(k)
    case LessThan(a: Attribute, Literal(k: Int, IntegerType))
      if a.semanticEquals(rn) && k >= 2 => Some(k - 1)
    case EqualTo(a: Attribute, Literal(1, IntegerType))
      if a.semanticEquals(rn) => Some(1)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case Project(projList,
        Filter(cond,
          Window(Seq(alias @ Alias(WindowExpression(RowNumber(), _), _)),
            parts,
            Seq(SortOrder(o, Descending, NullsLast, _),
                SortOrder(t, Ascending, NullsFirst, _)),
            child, _)))
      if kFromCond(cond, alias.toAttribute).isDefined &&
        !projList.exists(_.references.contains(alias.toAttribute)) =>
      Project(projList,
        TopKPerKey(parts, o, t, kFromCond(cond, alias.toAttribute).get, child))
  }
}
