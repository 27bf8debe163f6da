package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Cast, Literal, Round}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, StringType}

import graft.functions.expr.HllEst

/** Opt-in APPROX-DISTINCT mode: with `spark.graft.approxDistinct=true`
  * every single-column `count(DISTINCT c)` rewrites to the
  * deterministic-HLL aggregate (`functions.expr.HllEst`, rounded and
  * cast back to the count's LongType) — the BigQuery/Snowflake
  * "approx mode" dial, as a session conf instead of an application
  * rewrite.
  *
  * Why it matters at 100 TB: exact distinct counts force either an
  * Expand (one input replica per distinct aggregate — table_profile's
  * plan quintuples its scan) or a two-phase distinct shuffle of every
  * key. HllEst is a plain map-side-combinable aggregate with a
  * 64-byte buffer: no Expand, no distinct shuffle, one pass —
  * documented ~13% (1σ) relative error at m=64. The measured
  * contrast is the shipped profile pair: `table_profile` (5 exact
  * distincts, Expand-planned) benches 2.4 s at sf0.1 where
  * `table_profile_approx` (the same profile on HllEst, no Expand)
  * benches 0.64 s — this rule applies that trade to ANY query
  * without rewriting the application.
  *
  * Deliberately narrow, and OFF by default because the rewrite is
  * APPROXIMATING (unlike MvRewrite/JoinElimination, which are
  * semantics-preserving): only unfiltered single-argument COUNT
  * DISTINCT over a deterministic child rewrites; multi-column
  * count(DISTINCT a, b), FILTER clauses, and every other distinct
  * aggregate (sum/avg DISTINCT) bail untouched. Null semantics match
  * exactly (HllEst skips nulls like countDistinct; Cast preserves
  * them), and the empty-input linear-counting branch returns 0 like
  * COUNT. The rewrite happens INSIDE the existing named expression,
  * so output names, exprIds and types (LongType) are untouched —
  * parents never notice.
  *
  * Registered via [[graft.GraftExtensions]]; fixed-point-stable (the
  * rewritten tree contains no distinct Count to re-match).
  */
object ApproxDistinctRewrite extends Rule[LogicalPlan] {

  val ConfKey = "spark.graft.approxDistinct"

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(ConfKey, "false").toBoolean) plan
    else plan.transformUp {
      case agg: Aggregate =>
        agg.transformExpressions {
          case ae @ AggregateExpression(Count(Seq(child)), _, true, None, _)
              if child.deterministic =>
            // the string cast needs an explicit timeZoneId: analysis's
            // ResolveTimeZone already ran, so an optimizer-created
            // Cast of a timestamp with timeZoneId=None would stay
            // unresolved and crash at codegen
            Cast(
              Round(ae.copy(
                aggregateFunction = HllEst(
                  Cast(child, StringType, Some(conf.sessionLocalTimeZone))),
                isDistinct = false), Literal(0)),
              LongType)
        }
    }
}
