package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.expr.{ArrayDot, ArrayNorm, HllEst, MinHashSignature, RollingHash, SimHash48, WordShingles}

/** SparkSessionExtensions injection point: registers the engine's
  * native expressions as SQL functions, so `spark.sql(...)` users get
  * them too:
  *
  * {{{
  * val spark = SparkSession.builder()
  *   .withExtensions(new GraftExtensions)
  *   ...
  * spark.sql("SELECT vec_dot(a, b) / (vec_norm(a) * vec_norm(b)) ...")
  * }}}
  *
  * Or via config (cluster deployment):
  * `spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", "", name, usage, "", "", "", "", "", "", "built-in")

  override def apply(ext: SparkSessionExtensions): Unit = {
    // custom whole-operator planner path (plans.TopKPerKey)
    ext.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
    // row_number()<=k window filters rewrite to the bounded-heap
    // operator automatically (plans.TopKRewrite)
    ext.injectOptimizerRule(_ => graft.plans.TopKRewrite)
    // aggregates over a registered base table reroute to its
    // materialized summary (plans.MvRewrite; defs in plans.MvRegistry)
    ext.injectOptimizerRule(_ => graft.plans.MvRewrite)
    // inner joins against a declared dimension (unique key + RELY
    // integrity) drop when no dim column is used (plans.JoinElimination;
    // declarations in plans.DimRegistry)
    ext.injectOptimizerRule(_ => graft.plans.JoinElimination)
    // OPT-IN approx mode (spark.graft.approxDistinct=true): single-
    // column count(DISTINCT c) rewrites to the deterministic-HLL
    // aggregate — off by default, it is an approximating rewrite
    ext.injectOptimizerRule(_ => graft.plans.ApproxDistinctRewrite)
    ext.injectFunction((FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(a, b) - dot product of two numeric arrays"),
      (args: Seq[Expression]) => ArrayDot(args(0), args(1))))
    ext.injectFunction((FunctionIdentifier("vec_norm"),
      info("vec_norm", "vec_norm(a) - L2 norm of a numeric array"),
      (args: Seq[Expression]) => ArrayNorm(args(0))))
    ext.injectFunction((FunctionIdentifier("word_shingles"),
      info("word_shingles", "word_shingles(text, k) - distinct word k-shingles"),
      (args: Seq[Expression]) => WordShingles(args(0), intArg(args(1), "k"))))
    ext.injectFunction((FunctionIdentifier("minhash_sig"),
      info("minhash_sig", "minhash_sig(shingles, k, sliceLen) - minhash signature"),
      (args: Seq[Expression]) =>
        MinHashSignature(args(0), intArg(args(1), "k"), intArg(args(2), "sliceLen"))))
    ext.injectFunction((FunctionIdentifier("simhash48"),
      info("simhash48", "simhash48(tokens) - 48-bit tf-weighted simhash"),
      (args: Seq[Expression]) => SimHash48(args(0))))
    ext.injectFunction((FunctionIdentifier("rolling_hash"),
      info("rolling_hash", "rolling_hash(text) - Rabin-Karp polynomial fingerprint"),
      (args: Seq[Expression]) => RollingHash(args(0))))
    // aggregate: the analyzer wraps a bare AggregateFunction from the
    // registry into an AggregateExpression automatically
    ext.injectFunction((FunctionIdentifier("hll_est"),
      info("hll_est", "hll_est(v) - deterministic md5-register HLL distinct estimate"),
      (args: Seq[Expression]) => HllEst(args(0))))
  }

  private def intArg(e: Expression, name: String): Int = e match {
    case lit: org.apache.spark.sql.catalyst.expressions.Literal =>
      lit.value.toString.toInt
    case other =>
      throw new IllegalArgumentException(s"$name must be an integer literal, got $other")
  }
}
