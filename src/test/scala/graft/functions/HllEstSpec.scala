package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.PRound

/** The native deterministic-HLL aggregate (functions.expr.HllEst):
  * register math ≡ the column formulation (operators.Sketch), merge
  * partition-independence, null skipping, and the linear-counting
  * small-range branch.
  */
class HllEstSpec extends SparkSpec {

  import org.apache.spark.sql.GraftBridge.{column, expression}

  private def hllEst(c: Column): Column =
    column(graft.functions.expr.HllEst(expression(c)).toAggregateExpression())

  test("estimate replays the Sketch.hllDistinct register math above the small range") {
    import spark.implicits._
    // 5000 distinct keys: raw estimate far above 2.5·m — no correction,
    // so the aggregate must equal the column-formulation raw_est exactly
    val keys = (1 to 5000).toDF("key")
    val agg = keys.agg(PRound.pround(hllEst(col("key").cast("string")), 2)
      .as("est")).head().getDouble(0)
    val sketch = graft.operators.Sketch
      .hllDistinct(keys.select(col("key")), "key")
      .head().getAs[Double]("raw_est")
    assert(agg == sketch, s"agg $agg != sketch $sketch")
    // and it is in the documented ~13% band at m=64
    assert(math.abs(agg - 5000) / 5000.0 < 0.3, s"est $agg for 5000 distinct")
  }

  test("small cardinalities take the linear-counting branch (near-exact)") {
    import spark.implicits._
    val df = Seq("a", "b", "c", "a", "b", "a").toDF("v")
    val est = df.agg(hllEst(col("v")).as("e")).head().getDouble(0)
    // 3 distinct → 3 used registers (no md5 bucket collision here):
    // 64·ln(64/61) ≈ 3.07
    assert(math.abs(est - 3.0) < 0.5, s"est $est for 3 distinct")
  }

  test("estimate is partition-independent (merge path ≡ single partition)") {
    import spark.implicits._
    val keys = (1 to 2000).map(i => s"k$i").toDF("v")
    val one = keys.repartition(1).agg(hllEst(col("v"))).head().getDouble(0)
    val many = keys.repartition(7).agg(hllEst(col("v"))).head().getDouble(0)
    assert(one == many)
  }

  test("nulls are skipped, matching countDistinct") {
    import spark.implicits._
    val withNulls = Seq(Some("x"), None, Some("y"), None, Some("x"))
      .toDF("v")
    val without = Seq("x", "y", "x").toDF("v")
    val a = withNulls.agg(hllEst(col("v"))).head().getDouble(0)
    val b = without.agg(hllEst(col("v"))).head().getDouble(0)
    assert(a == b)
  }

  test("non-string input is an analysis error, not a silent wrong hash") {
    import spark.implicits._
    val df = Seq(1, 2, 3).toDF("v")
    val e = intercept[Exception] { df.agg(hllEst(col("v"))).collect() }
    assert(e.getMessage.contains("hll_est") || e.getMessage.contains("STRING"),
      e.getMessage)
  }
}
