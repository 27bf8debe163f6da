package graft

import org.apache.spark.sql.functions._

/** Behavioral pins for the mixture / adaptive-threshold / sharding
  * trio (mix_temperature, quality_adaptive, shuffle_shards) against
  * naive recomputations on the sf0.001 tables.
  */
class CurationQueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("mix_temperature: smallest language keeps everything; rates are sqrt-scaled") {
    val rows = run("mix_temperature").collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val totals = Tables.documents(spark, dir)
      .select(col("lang"), graft.functions.TextAnalysis.tokenCount(col("text")).as("t"))
      .groupBy(col("lang")).agg(sum(col("t")).as("ts"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val tmin = totals.values.min
    totals.foreach { case (lang, ts) =>
      val expected = math.floor(math.sqrt(tmin.toDouble / ts) * 10000.0).toLong
      assert(rows(lang) == expected, s"$lang: pm ${rows(lang)} != $expected")
    }
    // the smallest language is never downsampled
    val smallest = totals.minBy(_._2)._1
    assert(rows(smallest) == 10000L)
    // temperature flattens less than full balancing: every sqrt rate
    // >= the mix_resample (tau=1) rate for the same language
    totals.foreach { case (lang, ts) =>
      val tau1 = math.floor(tmin.toDouble / ts * 10000.0).toLong
      assert(rows(lang) >= tau1)
    }
  }

  test("quality_adaptive: p25 cutoff keeps roughly three quarters per language") {
    run("quality_adaptive").collect().foreach { r =>
      val (n, kept) = (r.getLong(2), r.getLong(3))
      // quantile_cont p25 with >= keeps at least 75% (ties only add)
      assert(kept >= (n * 3) / 4, s"${r.getString(0)}: kept $kept of $n")
      assert(kept < n, s"${r.getString(0)}: cutoff filtered nothing")
    }
  }

  test("shuffle_shards: exhaustive, stable, and balanced") {
    val rows = run("shuffle_shards").collect()
    assert(rows.length == 16)
    val total = Tables.documents(spark, dir).count()
    assert(rows.map(_.getLong(1)).sum == total)
    // md5 mixes: no shard is empty or pathologically loaded at 500 docs
    val counts = rows.map(_.getLong(1))
    assert(counts.min > 0)
    assert(counts.max < 3 * total / 16)
    // assignment is a pure key function: rerun bit-identical
    val again = run("shuffle_shards").collect()
    assert(rows.map(_.toString).sameElements(again.map(_.toString)))
  }
}
