package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** The histogram quantile sketch's accuracy CONTRACT, proven on
  * random data: every estimate lies within one bin width of the true
  * rank-target element for interior bins, widening to
  * max(w, hi − (lo + (bins−1)·w)) when the target rank falls in the
  * clamped last bin (whose value range is wider than w by
  * construction). Also pins the degenerate single-value input.
  */
class SketchQuantileSpec extends SparkSpec {

  import spark.implicits._

  private val qs = Seq(0.25, 0.5, 0.75, 0.9, 0.99)

  test("estimates stay within the documented bin-width bound") {
    val gen = for {
      n <- Gen.choose(50, 3000)
      span <- Gen.oneOf(10L, 1000L, 5000000L) // < , ≈ , >> bins
      base <- Gen.choose(-1000000L, 1000000L)
      seed <- Gen.choose(0L, Long.MaxValue)
    } yield (n, span, base, seed)
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(8)
        .withInitialSeed(org.scalacheck.rng.Seed(20260813L)),
      Prop.forAll(gen) { case (n, span, base, seed) =>
        val rnd = new scala.util.Random(seed)
        val xs = Vector.fill(n.max(2))(base + math.abs(rnd.nextLong() % span))
        val bins = 128
        val est = Sketch.histogramQuantiles(xs.toDF("x"), "x", bins, qs)
          .select(col("q"), col("est")).as[(Double, Double)].collect().toMap
        val sorted = xs.sorted
        val lo = sorted.head; val hi = sorted.last
        val w = math.max((hi - lo) / bins, 1L)
        val bound = math.max(w.toDouble, (hi - (lo + (bins - 1) * w)).toDouble)
        qs.forall { q =>
          val rank = math.ceil(q * xs.size).toInt.max(1)
          val truth = sorted(rank - 1).toDouble
          math.abs(est(q) - truth) <= bound
        }
      })
    assert(res.passed, res.status.toString)
  }

  test("single-value input: every quantile is that value") {
    val est = Sketch.histogramQuantiles(
      Seq.fill(40)(7L).toDF("x"), "x", 128, qs)
      .select(col("q"), col("est")).as[(Double, Double)].collect().toMap
    // one bin, cnt=n: est = 7 + (q·n − 0)/n · 1 ∈ (7, 8] — within the
    // one-bin-width contract of the true value 7
    assert(qs.forall(q => est(q) >= 7.0 && est(q) <= 8.0))
  }
}
