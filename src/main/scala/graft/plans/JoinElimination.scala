package graft.plans

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, EqualTo, IsNotNull}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** PK-FK join elimination: an inner equi-join against a DECLARED
  * dimension (unique key + referential integrity, the RELY-constraint
  * contract of warehouse SQL engines) disappears when the query uses
  * no dimension column — the join changes neither multiplicity (the
  * key is unique) nor membership (every non-null FK matches), so the
  * fact side alone answers it. At 100 TB this deletes a broadcast
  * build + probe per query that generated BI tools emit constantly
  * (star-schema views join every dimension; most dashboards read two).
  *
  * Deliberately narrow so elimination is always semantics-preserving:
  *  - Inner join, condition exactly `fk = pk` (single equality);
  *  - the dim side is the registered bare scan (only SubqueryAlias /
  *    pruning-Project between — ANY dim-side filter bails: a filtered
  *    dimension changes membership);
  *  - the parent Project references fact-side attributes only;
  *  - a NULLABLE fk keeps inner-join semantics via an explicit
  *    `Filter(IsNotNull(fk))` on the fact (inner join drops null-fk
  *    rows; RI says nothing about NULLs).
  *
  * Registered via [[graft.GraftExtensions]] (injectOptimizerRule);
  * declarations live in [[DimRegistry]] — registering a dimension IS
  * the integrity declaration, exactly like RELY on a constraint: the
  * engine does not re-verify it per query (that is
  * `integrity_check`'s audit job).
  */
object JoinElimination extends Rule[LogicalPlan] {

  /** The registered dim key attribute plus the declared FK column
    * names, if `p` is a registered dimension's bare scan (modulo
    * aliases / pruning projects). */
  private def dimKeyOf(p: LogicalPlan): Option[(Attribute, Set[String])] =
    MvRewrite.basePathOf(p).flatMap(DimRegistry.byPath).flatMap {
      case (pk, factCols) => p.output.find(_.name == pk).map((_, factCols))
    }

  /** True iff `a` is a PASSTHROUGH of a base-scan column: some leaf of
    * `plan` emits an attribute with the same exprId (and name). An
    * Alias — `expr.as("o_custkey")`, withColumn, withColumnRenamed —
    * mints a NEW exprId, so a derived expression that merely WEARS a
    * declared FK name fails this test (ADVICE r9: the name-only check
    * `factCols.contains(fk.name)` matched any attribute aliased to a
    * declared FK name, extending the RELY promise to values the caller
    * never declared). */
  private def isScanPassthrough(plan: LogicalPlan, a: Attribute): Boolean =
    plan.collectLeaves().exists(_.output.exists(o =>
      o.exprId == a.exprId && o.name == a.name))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case proj @ Project(projList,
        j @ Join(left, right, Inner, Some(EqualTo(a: AttributeReference,
          b: AttributeReference)), _))
      if projList.forall(_.references.subsetOf(left.outputSet)) =>
      val fkPk: Option[(Attribute, Attribute)] =
        if (left.outputSet.contains(a) && right.outputSet.contains(b)) Some((a, b))
        else if (left.outputSet.contains(b) && right.outputSet.contains(a)) Some((b, a))
        else None
      (for {
        (fk, pk) <- fkPk
        (dimKey, factCols) <- dimKeyOf(right)
        if dimKey.exprId == pk.exprId
        // RI is declared PER FK PAIR: a join on a fact column the
        // caller never declared (e.g. o_orderkey = c_custkey) has no
        // integrity promise and must keep its real inner-join
        // membership — bail instead of eliminating.
        if factCols.contains(fk.name)
        // ...and the fk must be the BASE-SCAN column of that name, not
        // an arbitrary expression aliased to it: the RELY declaration
        // covers the stored fact column's values only.
        if isScanPassthrough(left, fk)
      } yield {
        val fact = if (fk.nullable) Filter(IsNotNull(fk), left) else left
        Project(projList, fact)
      }).getOrElse(proj)
  }
}

/** Declared dimensions consulted by [[JoinElimination]]: path →
  * (pk column name, declared FK column names). Registering asserts,
  * for EACH named fact column, that (a) pk is unique in the dimension
  * and (b) every non-null value of that fact column has a match — the
  * caller's RELY declaration, not something the engine re-checks. The
  * declaration is per FK PAIR, not per dimension: a fact column you
  * did not name gets no elimination, because nothing promises its
  * values land in the dimension. The name binds to the STORED column:
  * the rule only fires when the join's fk attribute is a passthrough
  * of a base-scan column with the declared name (an expression merely
  * aliased to the name gets no elimination — its values carry no RELY
  * promise). */
object DimRegistry {
  private val dims = TrieMap.empty[String, (String, Set[String])]

  def register(name: String, dim: DataFrame, pk: String,
      factCols: Set[String]): Unit = {
    require(factCols.nonEmpty,
      "declare the fact FK column(s) the RELY constraint covers")
    val path = MvRewrite.basePathOf(dim.queryExecution.analyzed).getOrElse(
      throw new IllegalArgumentException(
        "dimension must be a bare file scan (spark.read.parquet(...))"))
    dims.put(path, (pk, factCols))
    names.put(name, path)
  }

  def deregister(name: String): Unit =
    names.remove(name).foreach(dims.remove)

  def clear(): Unit = { dims.clear(); names.clear() }

  private val names = TrieMap.empty[String, String]

  def byPath(path: String): Option[(String, Set[String])] = dims.get(path)
}
