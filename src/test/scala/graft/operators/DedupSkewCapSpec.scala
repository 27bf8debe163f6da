package graft.operators

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** Hostile-skew caps for the pair-expanding dedup operators: a planted
  * single-signature flood (one viral boilerplate string dominating the
  * corpus) must NOT reach the O(group²) pair expansion when the group
  * cap is set, while organic duplicate groups under the cap still
  * pair. The cap is the ngramJaccard df-cap pattern (windowed count →
  * filter), so it sorts-and-spills rather than materializing groups.
  */
class DedupSkewCapSpec extends SparkSpec {
  import spark.implicits._

  private val cap = 50

  private def corpus(floodN: Int): org.apache.spark.sql.DataFrame = {
    val flood = (1 to floodN).map(i =>
      (1000L + i, "viral boilerplate string repeated verbatim across the entire scraped web"))
    val organic = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "the quick brown fox jumps over the lazy dog tonight"),
      (3L, "an entirely unrelated document about spark physical plans"))
    (flood ++ organic).toDF("id", "text")
  }

  test("simhashPairs: flooded signature group is dropped, organic pair survives (property)") {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(8),
      Prop.forAll(Gen.choose(cap + 1, 150)) { floodN =>
        val got = Dedup.simhashPairs(corpus(floodN), "id", "text", maxGroup = Some(cap))
          .select("id_a", "id_b").as[(Long, Long)].collect().toSet
        got == Set((1L, 2L))
      })
    assert(res.passed, res.status.toString)
  }

  test("simhashPairs: uncapped flood is quadratic (the guarded failure mode)") {
    val n = Dedup.simhashPairs(corpus(80), "id", "text").count()
    assert(n == 80L * 79 / 2 + 1, s"expected flood pair explosion, got $n")
  }

  test("minhashLsh: flooded band groups are dropped, organic near-dup survives") {
    val got = Dedup.minhashLsh(corpus(120), "id", "text", maxBandGroup = Some(cap))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L)), got.toString)
    val uncapped = Dedup.minhashLsh(corpus(120), "id", "text").count()
    assert(uncapped == 120L * 119 / 2 + 1, s"uncapped gave $uncapped")
  }

  test("simhashNear: flooded band-slice groups are dropped, organic pair survives") {
    val got = Dedup.simhashNear(corpus(120), "id", "text", maxBandGroup = Some(cap))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L)), got.toString)
  }

  test("a non-binding cap changes nothing (CORRECTNESS-row safety)") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "alpha beta gamma delta epsilon zeta eta theta"),
      (4L, "completely different text about distributed query engines"),
      (5L, "yet another unrelated document mentioning parquet footers")).toDF("id", "text")
    def pairs(d: org.apache.spark.sql.DataFrame) =
      d.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs(Dedup.minhashLsh(docs, "id", "text", maxBandGroup = Some(cap))) ==
      pairs(Dedup.minhashLsh(docs, "id", "text")))
    assert(pairs(Dedup.simhashPairs(docs, "id", "text", maxGroup = Some(cap))) ==
      pairs(Dedup.simhashPairs(docs, "id", "text")))
    assert(pairs(Dedup.simhashNear(docs, "id", "text", maxBandGroup = Some(cap))) ==
      pairs(Dedup.simhashNear(docs, "id", "text")))
  }
}
