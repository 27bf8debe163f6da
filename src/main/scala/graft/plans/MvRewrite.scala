package graft.plans

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Cast, Divide, Expression, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.DoubleType

/** Materialized-view rewrite: an `Aggregate` over a bare scan of a
  * registered base table reroutes to the table's materialized summary
  * when the summary subsumes it — the warehouse acceleration staple.
  * At 100 TB the difference is the whole query: a daily rollup over
  * the fact table becomes a scan of a few thousand pre-aggregated
  * rows, and users keep writing the query against the BASE table (no
  * application rewrite, exactly how production MV systems deploy).
  *
  * Deliberately narrow so the rewrite is always semantics-preserving:
  *  - the aggregate's child must be the registered base scan itself —
  *    only pure column pruning (`Project` of attributes) and
  *    `SubqueryAlias` may sit between; ANY filter bails (the summary
  *    cannot serve filtered rows);
  *  - every grouping expression is a bare column the MV groups by
  *    (coarser regrouping than the MV is fine — partials re-combine);
  *  - every aggregate is an undistinct, unfiltered SUM / MIN / MAX /
  *    COUNT(literal) / AVG over a column the MV carries a partial
  *    for, and the re-aggregated type equals the original type
  *    (guards e.g. decimal precision growth under double summing);
  *    COUNT re-aggregates as SUM(cnt), AVG as SUM(sum)/SUM(cnt) —
  *    never AVG(avg), the classic wrong-answer trap.
  *
  * Output attributes keep the original names AND exprIds, so parent
  * operators (sorts, projects, joins) are untouched by the swap. The
  * MV scan is re-instanced per rewrite (fresh exprIds), so two
  * rewrites in one plan cannot collide. The rewrite is
  * fixed-point-stable: the MV's own path is not a registered base, so
  * a rewritten aggregate never re-matches.
  *
  * Registered via [[graft.GraftExtensions]] (injectOptimizerRule);
  * definitions live in [[MvRegistry]].
  */
object MvRewrite extends Rule[LogicalPlan] {

  /** Root path fingerprint of a bare file scan, if the plan is one
    * (modulo pruning projects / aliases). */
  private[plans] def basePathOf(p: LogicalPlan): Option[String] = p match {
    case l: LogicalRelation => l.relation match {
      case fs: HadoopFsRelation =>
        Some(fs.location.rootPaths.map(_.toString).sorted.mkString(","))
      case _ => None
    }
    case SubqueryAlias(_, child) => basePathOf(child)
    case Project(projList, child)
      if projList.forall(_.isInstanceOf[AttributeReference]) =>
      basePathOf(child)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg: Aggregate =>
      (for {
        path <- basePathOf(agg.child)
        mv <- MvRegistry.byBasePath(path)
        rewritten <- tryRewrite(agg, mv)
      } yield rewritten).getOrElse(agg)
  }

  private def tryRewrite(agg: Aggregate, mv: MvDef): Option[LogicalPlan] = {
    // fresh output exprIds per rewrite — two MV uses in one plan must
    // not share attribute ids
    val mvScan = mv.mvPlan.transformUp {
      case r: LogicalRelation => r.newInstance()
    }
    val mvAttr: Map[String, Attribute] = mvScan.output.map(a => a.name -> a).toMap

    val groupOk = agg.groupingExpressions.forall {
      case a: AttributeReference =>
        mv.groupKeys.contains(a.name) && mvAttr.contains(a.name)
      case _ => false
    }
    if (!groupOk) return None

    // partial-combine form of one supported aggregate function, or None
    def remap(ae: AggregateExpression): Option[Expression] =
      if (ae.isDistinct || ae.filter.isDefined) None
      else ae.aggregateFunction match {
        case s: Sum => s.child match {
          case a: AttributeReference => mv.measures.get(("sum", a.name))
            .flatMap(mvAttr.get).map(c => Sum(c).toAggregateExpression())
          case _ => None
        }
        case m: Min => m.child match {
          case a: AttributeReference => mv.measures.get(("min", a.name))
            .flatMap(mvAttr.get).map(c => Min(c).toAggregateExpression())
          case _ => None
        }
        case m: Max => m.child match {
          case a: AttributeReference => mv.measures.get(("max", a.name))
            .flatMap(mvAttr.get).map(c => Max(c).toAggregateExpression())
          case _ => None
        }
        case c: Count if c.children.forall(_.foldable) =>
          mv.measures.get(("count", "*")).flatMap(mvAttr.get)
            .map(cnt => Sum(cnt).toAggregateExpression())
        case av: Average => av.child match {
          // AVG(x) = SUM(sum_x) / SUM(cnt) — re-averaging averages
          // would weight every MV group equally (wrong)
          case a: AttributeReference if a.dataType == DoubleType =>
            for {
              sc <- mv.measures.get(("sum", a.name)).flatMap(mvAttr.get)
              cc <- mv.measures.get(("count", "*")).flatMap(mvAttr.get)
            } yield Divide(Sum(sc).toAggregateExpression(),
              Cast(Sum(cc).toAggregateExpression(), DoubleType))
          case _ => None
        }
        case _ => None
      }

    // Remap a whole output expression tree (CollapseProject may have
    // folded e.g. round() around the aggregate): every embedded
    // aggregate swaps to its partial-combine form — with the type
    // preserved exactly (a DECIMAL sum-of-sums widens precision —
    // bail, parents reference the original type) — and every bare
    // attribute must be a group key. Top-down on purpose: the
    // AggregateExpression case must intercept before its child
    // measure columns are seen as stray attributes.
    def mapTree(e: Expression): Option[Expression] = e match {
      case ae: AggregateExpression =>
        remap(ae).filter(_.dataType == ae.dataType)
      case a: AttributeReference =>
        if (mv.groupKeys.contains(a.name)) mvAttr.get(a.name) else None
      case other =>
        val kids = other.children.map(mapTree)
        if (kids.exists(_.isEmpty)) None
        else Some(other.withNewChildren(kids.map(_.get)))
    }

    val newAggExprs: Seq[Option[NamedExpression]] = agg.aggregateExpressions.map {
      case a: AttributeReference
        if mv.groupKeys.contains(a.name) && mvAttr.contains(a.name) =>
        Some(Alias(mvAttr(a.name), a.name)(exprId = a.exprId))
      case al @ Alias(child, name) =>
        mapTree(child).map(t => Alias(t, name)(exprId = al.exprId))
      case _ => None
    }
    if (newAggExprs.exists(_.isEmpty)) return None

    val newGroup = agg.groupingExpressions.map {
      case a: AttributeReference => mvAttr(a.name)
    }
    Some(Aggregate(newGroup, newAggExprs.map(_.get), mvScan))
  }
}

/** One registered summary: `mvPlan` (the analyzed scan of the
  * materialized parquet) answers aggregates over `basePath` grouped by
  * any subset of `groupKeys`, with `measures` mapping each supported
  * (function, base column) to the MV column carrying its partial —
  * `("sum","x") -> "sum_x"`, `("min","x") -> "min_x"`,
  * `("max","x") -> "max_x"`, `("count","*") -> "cnt"`. AVG over a
  * double column needs its `("sum", col)` entry plus `("count","*")`.
  */
case class MvDef(name: String, basePath: String, groupKeys: Seq[String],
    measures: Map[(String, String), String], mvPlan: LogicalPlan)

/** Session-wide MV definitions consulted by [[MvRewrite]]. JVM-global
  * (like a metastore); `register` overwrites by name. */
object MvRegistry {
  private val defs = TrieMap.empty[String, MvDef]

  /** Register `mv` (a scan of the materialized summary, e.g.
    * `spark.read.parquet(mvPath)`) as answering aggregates over
    * `base` (a bare scan of the big table). */
  def register(name: String, base: DataFrame, groupKeys: Seq[String],
      measures: Map[(String, String), String], mv: DataFrame): Unit = {
    val path = MvRewrite.basePathOf(base.queryExecution.analyzed).getOrElse(
      throw new IllegalArgumentException(
        "MV base must be a bare file scan (spark.read.parquet(...))"))
    defs.put(name, MvDef(name, path, groupKeys, measures,
      mv.queryExecution.analyzed))
  }

  def deregister(name: String): Unit = defs.remove(name)
  def clear(): Unit = defs.clear()

  def byBasePath(path: String): Option[MvDef] =
    defs.values.find(_.basePath == path)
}
