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

  test("mix_token_budget: allocations sum to EXACTLY the budget") {
    val rows = run("mix_token_budget").collect()
    // the whole point of largest-remainder apportionment: no drift
    assert(rows.map(_.getLong(5)).sum == 100000L)
    // alloc decomposes as base + topup with topup ∈ {0, 1}
    rows.foreach { r =>
      val (base, topup, alloc) = (r.getLong(3), r.getLong(4), r.getLong(5))
      assert(topup == 0L || topup == 1L)
      assert(alloc == base + topup)
    }
    // monotone in weight: a strictly larger w never gets a smaller alloc
    val byW = rows.map(r => (r.getLong(2), r.getLong(5))).sortBy(_._1)
    byW.sliding(2).foreach { case Array((w1, a1), (w2, a2)) =>
      if (w1 < w2) assert(a1 <= a2)
    }
  }

  test("shards_manifest: totals reconcile and the xor checksum sees a flip") {
    val rows = run("shards_manifest").collect()
    assert(rows.length == 16)
    assert(rows.map(_.getLong(1)).sum ==
      Tables.documents(spark, dir).count())
    // independent recompute of one shard's xor (driver-side fold over
    // the member docs, any order) matches the distributed aggregate
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"),
        conv(substring(md5(col("text")), 1, 12), 16, 10).cast("long").as("h"),
        graft.operators.Sampling.shardOf(col("doc_id"), 16).as("shard"))
      .filter(col("shard") === 3).collect()
    val expectXor = docs.map(_.getLong(1)).foldLeft(0L)(_ ^ _)
    val got = rows.find(_.getLong(0) == 3L).get
    assert(got.getLong(3) == expectXor)
    // and the checksum is content-sensitive: any one h flipped flips it
    assert(docs.nonEmpty && (expectXor ^ docs.head.getLong(1)) != expectXor)
  }

  test("unigram_stored: store-served segmentation ≡ fresh build, bit for bit") {
    val fresh = run("unigram_apply").collect().map(_.toString)
    val served = run("unigram_stored").collect().map(_.toString)
    assert(served.sameElements(fresh))
  }
}
