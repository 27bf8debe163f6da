package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftExtensions

/** MvRewrite gates: the rewrite FIRES (the optimized query scans the
  * materialized summary, never the base), its partial-combine algebra
  * is exact (COUNT ≡ SUM(cnt), AVG ≡ SUM(sum)/SUM(cnt), coarser
  * regroup re-combines), and every bail-out guard holds (filters,
  * distinct aggregates, unsupported functions, deregistration). The
  * oracle row (`agg_mv_rewrite`) proves values; this spec proves the
  * PLAN — oracle equality alone cannot distinguish a fired rewrite
  * from a silent no-op.
  */
class MvRewriteSpec extends AnyFunSuite {

  // separate extensions-active session sharing the JVM's SparkContext
  // (the shared SparkSpec session has no extensions; rule injection
  // happens at session build)
  private def withExtSession[A](f: SparkSession => A): A = {
    val prev = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-mv-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try f(spark)
    finally {
      MvRegistry.clear()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prev.foreach(SparkSession.setDefaultSession)
    }
  }

  /** (base scan, mv scan, base dir name, mv dir name) over a small
    * synthetic table — int-valued doubles so every sum is exact. */
  private def fixture(spark: SparkSession): (DataFrame, DataFrame, String, String) = {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-mvrw").toString
    val baseDir = s"$root/mvrw_base"
    val mvDir = s"$root/mvrw_summary"
    (1 to 400).map(i => (s"k${i % 4}", s"g${i % 3}", (i % 7).toDouble, (i % 11).toDouble))
      .toDF("k1", "k2", "x", "y")
      .write.mode("overwrite").parquet(baseDir)
    val base = spark.read.parquet(baseDir)
    base.groupBy($"k1", $"k2")
      .agg(sum($"x").as("sum_x"), sum($"y").as("sum_y"),
        min($"x").as("min_x"), max($"x").as("max_x"),
        count(lit(1)).as("cnt"))
      .write.mode("overwrite").parquet(mvDir)
    (base, spark.read.parquet(mvDir), "mvrw_base", "mvrw_summary")
  }

  private def register(base: DataFrame, mv: DataFrame): Unit =
    MvRegistry.register("mvrw", base,
      groupKeys = Seq("k1", "k2"),
      measures = Map(("sum", "x") -> "sum_x", ("sum", "y") -> "sum_y",
        ("min", "x") -> "min_x", ("max", "x") -> "max_x",
        ("count", "*") -> "cnt"),
      mv = mv)

  test("coarser regroup reroutes to the summary with exact values") {
    withExtSession { spark =>
      val (base, mv, baseName, mvName) = fixture(spark)
      def q(d: DataFrame) = d.groupBy(col("k1"))
        .agg(sum(col("x")).as("sx"), count(lit(1)).as("n"),
          avg(col("y")).as("ay"), max(col("x")).as("mx"),
          min(col("x")).as("mn"))
        .orderBy(col("k1"))
      val expected = q(base).collect().toSeq // registry empty: plain path
      register(base, mv)
      val rewritten = q(base)
      val p = rewritten.queryExecution.executedPlan.toString
      assert(p.contains(mvName), s"rewrite did not fire:\n$p")
      assert(!p.contains(baseName), s"base still scanned:\n$p")
      assert(rewritten.collect().toSeq == expected)
    }
  }

  test("exact-granularity regroup and folded projections also fire") {
    withExtSession { spark =>
      val (base, mv, _, mvName) = fixture(spark)
      register(base, mv)
      // round() around the aggregate collapses INTO the Aggregate node
      // (CollapseProject) — the tree-remap path
      val d = base.groupBy(col("k1"), col("k2"))
        .agg(round(sum(col("x")), 2).as("sx"), count(lit(1)).as("n"))
      val p = d.queryExecution.executedPlan.toString
      assert(p.contains(mvName), s"\n$p")
      assert(d.agg(sum(col("n"))).head().getLong(0) == 400L)
    }
  }

  test("filters, distinct aggs, unsupported functions, stray columns bail") {
    withExtSession { spark =>
      val (base, mv, baseName, _) = fixture(spark)
      register(base, mv)
      val bails = Seq(
        base.filter(col("x") > 1).groupBy(col("k1")).agg(sum(col("x")).as("s")),
        base.groupBy(col("k1")).agg(countDistinct(col("x")).as("s")),
        base.groupBy(col("k1")).agg(expr("percentile(x, 0.5)").as("s")),
        base.groupBy(col("k1")).agg(sum(col("x") * 2).as("s")), // non-column input
        base.groupBy(col("x")).agg(count(lit(1)).as("s")))      // non-key group
      bails.foreach { d =>
        val p = d.queryExecution.executedPlan.toString
        assert(p.contains(baseName), s"should NOT have rewritten:\n$p")
      }
    }
  }

  test("deregistration restores the base path") {
    withExtSession { spark =>
      val (base, mv, baseName, mvName) = fixture(spark)
      register(base, mv)
      val q = () => base.groupBy(col("k1")).agg(sum(col("x")).as("s"))
      assert(q().queryExecution.executedPlan.toString.contains(mvName))
      MvRegistry.deregister("mvrw")
      assert(q().queryExecution.executedPlan.toString.contains(baseName))
    }
  }

  test("the shipped agg_mv_rewrite query runs on the summary scan") {
    withExtSession { spark =>
      val d = graft.SparkEntry.queries("agg_mv_rewrite")(spark, "/root/testdata/sf0.001")
      val p = d.queryExecution.executedPlan.toString
      assert(p.contains("lineitem_rfls"), s"rewrite did not fire:\n$p")
      assert(!p.contains("lineitem.parquet"), s"fact table still scanned:\n$p")
      assert(d.count() > 0)
    }
  }
}
