package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftExtensions

/** ApproxDistinctRewrite gates: OFF by default (exact plans
  * untouched), fires under the session flag (hll_est replaces the
  * distinct Count — no Expand, no distinct shuffle), multi-distinct
  * profiles lose their Expand entirely, estimates stay inside the
  * documented m=64 error band with COUNT's null/empty semantics and
  * LongType output, and every bail-out (multi-column distinct,
  * FILTER clause, sum DISTINCT) leaves the exact plan alone.
  */
class ApproxDistinctSpec extends AnyFunSuite {

  private def withExtSession[A](f: SparkSession => A): A = {
    val prev = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-approxdistinct-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try f(spark)
    finally {
      spark.conf.unset(ApproxDistinctRewrite.ConfKey)
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prev.foreach(SparkSession.setDefaultSession)
    }
  }

  test("off by default: the exact distinct plan is untouched") {
    withExtSession { spark =>
      import spark.implicits._
      val df = (1 to 500).map(i => (i % 7, s"u${i % 61}")).toDF("g", "u")
      val p = df.groupBy($"g").agg(countDistinct($"u").as("d"))
        .queryExecution.optimizedPlan.toString
      assert(!p.contains("hll_est"), s"\n$p")
      assert(p.contains("count(distinct") || p.contains("count("), s"\n$p")
    }
  }

  test("flag on: count(DISTINCT c) becomes hll_est; estimate in band; type/name kept") {
    withExtSession { spark =>
      import spark.implicits._
      spark.conf.set(ApproxDistinctRewrite.ConfKey, "true")
      val df = (1 to 3000).map(i => (i % 7, s"u${i % 611}")).toDF("g", "u")
      val q = df.groupBy($"g").agg(countDistinct($"u").as("d"))
      val p = q.queryExecution.optimizedPlan.toString
      assert(p.contains("hll_est"), s"\n$p")
      assert(q.schema("d").dataType.typeName == "long")
      val got = q.as[(Int, Long)].collect().toMap
      // every group sees all 611 distinct users. The band here only
      // proves the WIRING (an unrewritten exact count would be 611
      // dead-on; a broken rewrite is wildly off) — m=64's ~13% is a
      // 1σ figure and this fixed corpus sits at 2.2σ, so the gate is
      // 3σ; the estimator's statistics are HllEstPropertySpec's job
      (0 until 7).foreach { g =>
        assert(math.abs(got(g) - 611.0) / 611.0 < 0.40, s"g=$g got ${got(g)}")
        assert(got(g) != 611L, s"g=$g exactly 611 — did the rewrite fire?")
      }
    }
  }

  test("multi-distinct profile loses its Expand under the flag") {
    withExtSession { spark =>
      import spark.implicits._
      spark.conf.set(ApproxDistinctRewrite.ConfKey, "true")
      val df = (1 to 2000).map(i => (s"a${i % 101}", s"b${i % 37}", i % 11))
        .toDF("a", "b", "c")
      val q = df.agg(countDistinct($"a").as("da"), countDistinct($"b").as("db"),
        countDistinct($"c").as("dc"))
      val p = q.queryExecution.executedPlan.toString
      assert(!p.contains("Expand"), s"three distincts must fuse\n$p")
      val (da, db, dc) = q.as[(Long, Long, Long)].head()
      assert(math.abs(da - 101.0) / 101.0 < 0.25)
      assert(math.abs(db - 37.0) / 37.0 < 0.3)
      assert(math.abs(dc - 11.0) / 11.0 < 0.35) // small-range linear counting
    }
  }

  test("COUNT semantics: nulls skipped, empty input counts 0") {
    withExtSession { spark =>
      import spark.implicits._
      spark.conf.set(ApproxDistinctRewrite.ConfKey, "true")
      val df = Seq(Some("x"), None, Some("y"), Some("x"), None).toDF("u")
      val d = df.agg(countDistinct($"u").as("d")).as[Long].head()
      assert(d == 2L) // linear counting is exact this small
      val empty = df.filter(lit(false)).agg(countDistinct($"u").as("d"))
        .as[Long].head()
      assert(empty == 0L)
    }
  }

  test("bail-outs: multi-column distinct, FILTER clause, sum DISTINCT stay exact") {
    withExtSession { spark =>
      import spark.implicits._
      spark.conf.set(ApproxDistinctRewrite.ConfKey, "true")
      val df = (1 to 200).map(i => (s"a$i", i % 5, i % 3)).toDF("a", "b", "c")
      df.createOrReplaceTempView("t")
      val multi = spark.sql("SELECT count(DISTINCT a, b) AS d FROM t")
      assert(!multi.queryExecution.optimizedPlan.toString.contains("hll_est"))
      assert(multi.as[Long].head() == 200L) // still exact
      val filtered = spark.sql(
        "SELECT count(DISTINCT a) FILTER (WHERE b = 1) AS d FROM t")
      assert(!filtered.queryExecution.optimizedPlan.toString.contains("hll_est"))
      assert(filtered.as[Long].head() == 40L)
      val sumd = spark.sql("SELECT sum(DISTINCT b) AS s FROM t")
      assert(!sumd.queryExecution.optimizedPlan.toString.contains("hll_est"))
      assert(sumd.as[Long].head() == 10L)
    }
  }

  test("timestamp columns rewrite without an unresolved-cast crash") {
    withExtSession { spark =>
      import spark.implicits._
      spark.conf.set(ApproxDistinctRewrite.ConfKey, "true")
      val df = (1 to 100)
        .map(i => new java.sql.Timestamp(1000000000000L + (i % 17) * 86400000L))
        .toDF("ts")
      val q = df.agg(countDistinct($"ts").as("d"))
      assert(q.queryExecution.optimizedPlan.toString.contains("hll_est"))
      // the point is NO unresolved-cast crash; linear counting puts
      // the estimate within a couple of the true 17
      val d = q.as[Long].head()
      assert(math.abs(d - 17L) <= 3L, s"got $d")
    }
  }
}
