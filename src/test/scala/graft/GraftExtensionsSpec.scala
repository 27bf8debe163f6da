package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {

  test("extensions expose native expressions to SQL users") {
    // A separate session (sharing the JVM's SparkContext) so the
    // extension injection is exercised at session build; the shared
    // test session must NOT be stopped, so defaults are cleared and
    // restored instead.
    val prev = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val r = spark.sql(
        """SELECT
          |  vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
          |  vec_norm(array(3.0D, 4.0D)) AS n,
          |  size(word_shingles('a b c d', 3)) AS ns,
          |  size(minhash_sig(word_shingles('a b c d', 3), 6, 5)) AS sig_len,
          |  simhash48(array('a', 'b', 'a')) AS sh
          |""".stripMargin).head()
      assert(r.getAs[Double]("d") == 11.0)
      assert(r.getAs[Double]("n") == 5.0)
      assert(r.getAs[Int]("ns") == 2)
      assert(r.getAs[Int]("sig_len") == 6)
      assert(r.getAs[Long]("sh") != 0L)
      // the registered native aggregate: linear-counting range, 2
      // distinct values → 64·ln(64/62) ≈ 2.03
      val est = spark.sql(
        "SELECT hll_est(CAST(v AS STRING)) AS e FROM VALUES (1), (2), (1) t(v)")
        .head().getAs[Double]("e")
      assert(math.abs(est - 2.0) < 0.5, s"hll_est gave $est for 2 distinct")
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prev.foreach(SparkSession.setDefaultSession)
    }
  }

  test("row_number<=k window filters rewrite to the TopKPerKey operator") {
    val prev = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-topk-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      import spark.implicits._
      import org.apache.spark.sql.functions._
      val df = Seq(("a", 1L, 10.0), ("a", 2L, 30.0), ("a", 3L, 20.0),
        ("a", 4L, 30.0), ("b", 5L, 5.0)).toDF("k", "id", "v")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"k").orderBy($"v".desc, $"id")
      val q = df.withColumn("rn", row_number().over(w))
        .filter($"rn" <= 2).select("k", "id")
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("TopKPerKey") && !plan.contains("Window"), s"\n$plan")
      assert(q.as[(String, Long)].collect().toSet ==
        Set(("a", 2L), ("a", 4L), ("b", 5L)))
      // a rank/dense_rank or rank-referencing projection must NOT rewrite
      val keepRn = df.withColumn("rn", row_number().over(w))
        .filter($"rn" <= 2).select("k", "id", "rn")
      assert(keepRn.queryExecution.executedPlan.toString.contains("Window"))
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prev.foreach(SparkSession.setDefaultSession)
    }
  }
}
