package graft.operators

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** Ed-Join prefix-filtered Levenshtein self-join: hand cases for the
  * three edit kinds plus a ScalaCheck property that the q·d+1 rarest-
  * gram prefix scheme is LOSSLESS versus the naive all-pairs DP — the
  * completeness claim the operator's pigeonhole doc makes. */
class EditJoinSpec extends SparkSpec {
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
      if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("selfJoin: deletion, substitution, insertion and exact pairs; far pairs dropped") {
    val rows = Seq(
      (1L, "sparkle engine"),
      (2L, "sparke engine"),   // deletion of 'l'   → dist 1 vs 1
      (3L, "sparkle enginx"),  // substitution      → dist 1 vs 1
      (4L, "sparkles engine"), // insertion         → dist 1 vs 1
      (5L, "sparkle engine"),  // exact             → dist 0 vs 1
      (6L, "completely other text")
    ).toDF("id", "s")
    val out = EditJoin.selfJoin(rows, "id", "s", d = 1)
      .select($"k_a", $"k_b", $"dist").as[(Long, Long, Long)]
      .collect().toSet
    // 5 duplicates 1, so every dist-1 neighbor of 1 also pairs with 5
    assert(out == Set((1L, 2L, 1L), (1L, 3L, 1L), (1L, 4L, 1L),
      (1L, 5L, 0L), (2L, 5L, 1L), (3L, 5L, 1L), (4L, 5L, 1L)))
  }

  test("property: prefix scheme is lossless vs naive all-pairs DP at q=3 and q=4") {
    // tiny alphabet so distance-1 pairs arise organically, and lengths
    // straddle both q's short-channel boundaries
    val strGen = Gen.choose(4, 9).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    val corpusGen = Gen.choose(3, 8).flatMap(n => Gen.listOfN(n, strGen))
    def prop(q: Int) = Prop.forAll(corpusGen) { ss =>
      val rows = ss.zipWithIndex.map { case (s, i) => ((i + 1).toLong, s) }
      val expected = (for {
        (a, ka) <- rows; (b, kb) <- rows if a < b
        d = lev(ka, kb) if d <= 1
      } yield (a, b, d.toLong)).toSet
      val got = EditJoin.selfJoin(rows.toDF("id", "s"), "id", "s",
          d = 1, q = q)
        .select($"k_a", $"k_b", $"dist").as[(Long, Long, Long)]
        .collect().toSet
      got == expected
    }
    for (q <- Seq(3, 4)) {
      val res = SCTest.check(
        SCTest.Parameters.default.withMinSuccessfulTests(12), prop(q))
      assert(res.passed, s"q=$q: ${res.status}")
    }
  }
}
