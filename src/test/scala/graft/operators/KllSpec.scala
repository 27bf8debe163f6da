package graft.operators

import org.apache.spark.sql.functions._

/** The KLL-style mergeable rank sketch (VERDICT r13 #3): exact
  * homomorphism (merge ≡ full build, bit-exact), exactness below
  * capacity, the floor-over-the-full-level-spine rule, the rank-error
  * guarantee on a heavy-tailed fixture, and the census→sketch
  * derivation the streaming twin relies on. */
class KllSpec extends graft.SparkSpec {
  import spark.implicits._

  // heavy-tailed deterministic fixture: x = id² stretches 5 orders of
  // magnitude — exactly the distribution an equi-width histogram fails
  private def rows(ids: Range) =
    ids.map(i => (s"r$i", i.toLong * i)).toDF("rid", "x")

  private def itemSet(sk: Kll.KllSketch) =
    sk.items.as[(Int, Long, Long)].collect().toSet

  private def floorVal(sk: Kll.KllSketch) =
    Kll.floorOf(sk.levelCounts, sk.k).as[Int].collect().head

  test("merge of two halves is BIT-IDENTICAL to the full build") {
    val all = rows(1 to 4000)
    val a = Kll.build(all.filter($"x" % 2 === 0), "rid", "x", k = 64)
    val b = Kll.build(all.filter($"x" % 2 =!= 0), "rid", "x", k = 64)
    val merged = Kll.merge(a, b)
    val full = Kll.build(all, "rid", "x", k = 64)
    assert(floorVal(merged) == floorVal(full))
    assert(itemSet(merged) == itemSet(full))
    assert(merged.levelCounts.as[(Int, Long)].collect().toSet
      == full.levelCounts.as[(Int, Long)].collect().toSet)
    val qs = Seq(0.25, 0.5, 0.9)
    assert(Kll.quantiles(merged, qs).as[(Double, Long, Int, Long, Long)]
      .collect().toSet
      == Kll.quantiles(full, qs).as[(Double, Long, Int, Long, Long)]
        .collect().toSet)
  }

  test("n <= k keeps everything: floor 0 and EXACT quantiles") {
    val sk = Kll.build(rows(1 to 50), "rid", "x", k = 64)
    assert(floorVal(sk) == 0)
    val got = Kll.quantiles(sk, Seq(0.5, 1.0))
      .select($"q", $"est").as[(Double, Long)].collect().toMap
    // exact order stats of {1, 4, ..., 2500}: q=0.5 → 25th value (625),
    // q=1.0 → the max
    assert(got(0.5) == 25L * 25L)
    assert(got(1.0) == 50L * 50L)
  }

  test("floor considers EMPTY levels (weight would double otherwise)") {
    // counts with a level gap: 100 rows at level 0, 10 at level 3 —
    // the min level with suffix <= 16 is 1 (empty), NOT 3
    val counts = Seq((0, 100L), (3, 10L)).toDF("level", "n_rows")
    assert(Kll.floorOf(counts, 16).as[Int].collect().head == 1)
    // and when even the deepest level overflows, the floor caps
    val fat = Seq((20, 999L)).toDF("level", "n_rows")
    assert(Kll.floorOf(fat, 16).as[Int].collect().head == 20)
  }

  test("rank error stays within the sampling bound on a heavy tail") {
    val n = 20000
    val all = rows(1 to n)
    val sk = Kll.build(all, "rid", "x", k = 256)
    assert(floorVal(sk) > 0, "fixture must actually compact")
    val ests = Kll.quantiles(sk, Seq(0.25, 0.5, 0.75, 0.9, 0.99))
      .select($"q", $"est").as[(Double, Long)].collect()
    // true rank of est is exact on this fixture: |{i : i² <= est}|
    for ((q, est) <- ests) {
      val trueRank = math.floor(math.sqrt(est.toDouble)).toLong
      val err = math.abs(trueRank - q * n)
      // Bernoulli sampling bound ~ 2·n/√k ≈ 2500 at k=256; the
      // deterministic md5 draw lands well inside it
      assert(err <= 2.0 * n / math.sqrt(256.0),
        s"q=$q est=$est trueRank=$trueRank err=$err")
    }
  }

  test("fromCensus derives the sketch the batch build produces") {
    val all = rows(1 to 3000)
    val census = all
      .select(Kll.level($"rid").as("level"), $"x")
      .groupBy($"level", $"x").agg(count(lit(1)).as("cnt"))
    val viaCensus = Kll.fromCensus(census, k = 64)
    val direct = Kll.build(all, "rid", "x", k = 64)
    assert(floorVal(viaCensus) == floorVal(direct))
    assert(itemSet(viaCensus) == itemSet(direct))
  }

  test("quantilesGrouped equals a solo build per group; small strata stay exact") {
    val df = ((1 to 3000).map(i => ("big", s"b$i", i.toLong * i)) ++
      (1 to 30).map(i => ("small", s"s$i", i.toLong * 10)))
      .toDF("grp", "rid", "x")
    val got = Kll.quantilesGrouped(df, Seq("grp"), "rid", "x",
        k = 64, qs = Seq(0.5, 0.9))
      .as[(String, Double, Long, Int, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap
    for (grp <- Seq("big", "small")) {
      val solo = Kll.build(df.filter($"grp" === grp), "rid", "x", k = 64)
      val want = Kll.quantiles(solo, Seq(0.5, 0.9))
        .as[(Double, Long, Int, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
      for (q <- Seq(0.5, 0.9))
        assert(got((grp, q)) == want(q), s"$grp q=$q")
    }
    // the 30-row stratum kept everything: floor 0, exact median
    assert(got(("small", 0.5)) == ((150L, 0, 30L, 30L)))
    // the big stratum genuinely compacted
    assert(got(("big", 0.5))._2 > 0)
  }

  test("contract violations fail loudly") {
    intercept[IllegalArgumentException](
      Kll.build(rows(1 to 5), "rid", "x", k = 1))
    intercept[IllegalArgumentException](
      Kll.build(Seq(("a", 1.5)).toDF("rid", "x"), "rid", "x", k = 8))
    val a = Kll.build(rows(1 to 5), "rid", "x", k = 8)
    val b = Kll.build(rows(1 to 5), "rid", "x", k = 16)
    intercept[IllegalArgumentException](Kll.merge(a, b))
    intercept[IllegalArgumentException](
      Kll.quantiles(a, Seq(0.0)))
  }
}
