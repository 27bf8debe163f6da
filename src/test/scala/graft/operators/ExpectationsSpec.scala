package graft.operators

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Expectations._

class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    (Some(1L), "A", Some(10.0), "OK"),
    (Some(2L), "B", Some(99.0), "OK"),
    (Some(2L), "C", Some(-5.0), "BAD"), // dup id, below range, bad enum
    (None,     "D", None,        "OK")  // null id, null value
  ).toDF("id", "name", "value", "status")

  private def suite = Seq(
    notNull("id"),
    unique("id"),
    inRange("value", lit(0.0), lit(100.0)),
    inSet("status", Seq("OK")))

  test("report counts each check's violations over one batch") {
    val got = report(rows, suite)
      .select("check_name", "n_rows", "violations", "passed")
      .as[(String, Long, Long, Boolean)].collect().toSeq
    assert(got == Seq(
      ("not_null_id", 4L, 1L, false),
      ("unique_id", 4L, 1L, false),   // one dup beyond the first '2'
      ("range_value", 4L, 1L, false), // -5 only: NULL is not a range violation
      ("set_status", 4L, 1L, false)))
  }

  test("a clean batch passes every check, including all-null-free sums") {
    val clean = Seq((1L, 5.0, "OK"), (2L, 7.0, "OK")).toDF("id", "value", "status")
    val got = report(clean, Seq(notNull("id"), unique("id"),
        inRange("value", lit(0.0), lit(10.0)), inSet("status", Seq("OK"))))
      .select("violations", "passed").as[(Long, Boolean)].collect()
    assert(got.forall { case (v, p) => v == 0L && p })
  }

  test("an empty batch reports zero violations, not nulls") {
    val got = report(rows.filter(lit(false)), suite)
      .select("n_rows", "violations").as[(Long, Long)].collect()
    assert(got.length == 4 && got.forall { case (n, v) => n == 0L && v == 0L })
  }

  test("the whole suite costs ONE scan of the source") {
    val dir = java.nio.file.Files.createTempDirectory("graft-exp").toString
    rows.write.mode("overwrite").parquet(dir)
    val plan = report(spark.read.parquet(dir), suite)
      .queryExecution.executedPlan
    def scans(p: org.apache.spark.sql.execution.SparkPlan): Int = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case s: FileSourceScanExec => 1
      case other => other.children.map(scans).sum +
        other.subqueries.map(scans).sum
    }
    assert(scans(plan) == 1)
  }
}
