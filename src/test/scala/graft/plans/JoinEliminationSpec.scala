package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftExtensions

/** JoinElimination gates: the rule FIRES (the optimized plan scans
  * the fact alone — no join, no dim scan), its nullable-fk guard
  * keeps inner-join semantics, and every bail-out holds (dim column
  * used, filtered dim, non-inner join, undeclared dim). The oracle
  * row (`join_eliminated`) proves values; this spec proves the PLAN —
  * oracle equality cannot distinguish a fired elimination from a
  * silent no-op.
  */
class JoinEliminationSpec extends AnyFunSuite {

  private def withExtSession[A](f: SparkSession => A): A = {
    val prev = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-je-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try f(spark)
    finally {
      DimRegistry.clear()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prev.foreach(SparkSession.setDefaultSession)
    }
  }

  /** (fact scan, dim scan) — fact.fk is NULLABLE and row 9's fk IS
    * null, so elimination must reproduce the inner join's null-drop. */
  private def fixture(spark: SparkSession): (DataFrame, DataFrame) = {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-je").toString
    (1 to 9).map(i => (i.toLong, if (i == 9) None else Some((i % 3).toLong),
        i * 10L))
      .toDF("fact_id", "fk", "amount")
      .write.mode("overwrite").parquet(s"$root/fact")
    (0L to 2L).map(k => (k, s"dim$k")).toDF("pk", "dim_name")
      .write.mode("overwrite").parquet(s"$root/dim")
    (spark.read.parquet(s"$root/fact"), spark.read.parquet(s"$root/dim"))
  }

  private def scans(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation => r
    }.size

  private def joins(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }.size

  test("declared dim + unused dim columns: join and dim scan vanish") {
    withExtSession { spark =>
      val (fact, dim) = fixture(spark)
      DimRegistry.register("d", dim, "pk", Set("fk"))
      val q = fact.join(dim, col("fk") === col("pk"))
        .groupBy(col("amount") % 20).agg(count(lit(1)).as("n"), sum(col("amount")))
      assert(joins(q) == 0, q.queryExecution.optimizedPlan.toString)
      assert(scans(q) == 1, q.queryExecution.optimizedPlan.toString)
      // values equal the executed join (null fk row dropped)
      DimRegistry.clear()
      val want = fact.join(dim, col("fk") === col("pk"))
        .groupBy(col("amount") % 20).agg(count(lit(1)).as("n"), sum(col("amount")))
        .collect().map(_.toSeq).toSet
      assert(q.collect().map(_.toSeq).toSet == want)
    }
  }

  test("nullable fk: the eliminated plan drops null-fk rows like the join") {
    withExtSession { spark =>
      val (fact, dim) = fixture(spark)
      DimRegistry.register("d", dim, "pk", Set("fk"))
      val q = fact.join(dim, col("fk") === col("pk")).select(col("fact_id"))
      assert(joins(q) == 0)
      assert(q.collect().map(_.getLong(0)).sorted.toSeq == (1L to 8L))
    }
  }

  test("a used dim column bails") {
    withExtSession { spark =>
      val (fact, dim) = fixture(spark)
      DimRegistry.register("d", dim, "pk", Set("fk"))
      val q = fact.join(dim, col("fk") === col("pk"))
        .select(col("fact_id"), col("dim_name"))
      assert(joins(q) == 1)
    }
  }

  test("a filtered dimension bails (membership changes)") {
    withExtSession { spark =>
      val (fact, dim) = fixture(spark)
      DimRegistry.register("d", dim, "pk", Set("fk"))
      val q = fact.join(dim.filter(col("pk") =!= 0), col("fk") === col("pk"))
        .select(col("fact_id"))
      assert(joins(q) == 1)
      assert(q.count() == 6) // fk in {1,2}: rows 1,2,4,5,7,8 (fk=0 and null drop)
    }
  }

  test("the shipped join_eliminated query fires: orders scanned alone") {
    withExtSession { spark =>
      val q = graft.SparkEntry.queries("join_eliminated")(
        spark, "/root/testdata/sf0.001")
      assert(joins(q) == 0, q.queryExecution.optimizedPlan.toString)
      assert(scans(q) == 1, q.queryExecution.optimizedPlan.toString)
      assert(q.count() > 0)
    }
  }

  test("a join on an UNDECLARED fact column bails — RI is per FK pair") {
    withExtSession { spark =>
      val (fact, dim) = fixture(spark)
      DimRegistry.register("d", dim, "pk", Set("fk"))
      // fact_id equi-joined to the pk: same dim, same pk, but nothing
      // promises fact_id values land in the dimension — rows 4..9
      // would be dropped by the real join, so elimination must bail.
      val q = fact.join(dim, col("fact_id") === col("pk"))
        .select(col("amount"))
      assert(joins(q) == 1, q.queryExecution.optimizedPlan.toString)
    }
  }

  test("an expression ALIASED to the declared FK name bails (ADVICE r9)") {
    withExtSession { spark =>
      val (fact, dim) = fixture(spark)
      DimRegistry.register("d", dim, "pk", Set("fk"))
      // (amount % 3) wears the declared name "fk" but is NOT the
      // stored fact column — its values carry no RELY promise (here
      // they do land in the dim, but the rule cannot know that), so
      // elimination must bail and the real join must run.
      val forged = fact.select(col("fact_id"), (col("amount") % 3).as("fk"))
      val q = forged.join(dim, col("fk") === col("pk")).select(col("fact_id"))
      assert(joins(q) == 1, q.queryExecution.optimizedPlan.toString)
      // the true passthrough column still eliminates under the same
      // registration — the bail keys on provenance, not the query shape
      val ok = fact.join(dim, col("fk") === col("pk")).select(col("fact_id"))
      assert(joins(ok) == 0, ok.queryExecution.optimizedPlan.toString)
    }
  }

  test("left joins and undeclared dims bail") {
    withExtSession { spark =>
      val (fact, dim) = fixture(spark)
      DimRegistry.register("d", dim, "pk", Set("fk"))
      val lj = fact.join(dim, col("fk") === col("pk"), "left").select(col("fact_id"))
      assert(joins(lj) == 1)
      DimRegistry.clear()
      val q = fact.join(dim, col("fk") === col("pk")).select(col("fact_id"))
      assert(joins(q) == 1)
    }
  }
}
