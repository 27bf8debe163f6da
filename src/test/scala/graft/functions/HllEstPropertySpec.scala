package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** Accuracy property for the native HLL aggregate: across random
  * cardinalities the estimate stays inside the documented bands —
  * near-exact under linear counting (small range), ~13% relative
  * error at m=64 above it (bounded loosely at 3× the nominal
  * 1.04/√64 standard error). Catches register-math regressions that
  * bit-exact oracle replay alone would not (both sides would drift
  * together only if the oracle were regenerated).
  */
class HllEstPropertySpec extends SparkSpec {

  import org.apache.spark.sql.GraftBridge.{column, expression}

  private def hllEst(c: Column): Column =
    column(graft.functions.expr.HllEst(expression(c)).toAggregateExpression())

  test("estimate tracks true cardinality across the small/raw ranges") {
    import spark.implicits._
    val gen = for {
      n <- Gen.oneOf(Gen.choose(1, 120), Gen.choose(200, 4000))
      salt <- Gen.choose(0, 1000000)
    } yield (n, salt)
    // fixed seed: the accuracy band is statistical (3x nominal std
    // err), so an unseeded run can draw a legitimate >3-sigma outlier
    // (~tail-percent odds per run) and flake CI on untouched code
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12)
        .withInitialSeed(org.scalacheck.rng.Seed(20260813L)),
      Prop.forAll(gen) { case (n0, salt) =>
        val n = n0.max(1) // ScalaCheck shrinking ignores Gen bounds
        val est = (1 to n).map(i => s"key-$salt-$i").toDF("v")
          .agg(hllEst(col("v"))).head().getDouble(0)
        // loose bands: a register-math bug lands orders of magnitude
        // off; legitimate draws occasionally exceed 3x the nominal
        // std err (bit-exactness is the oracle's job, not this spec's)
        val tol = if (n <= 120) math.max(6.0, 0.2 * n) // linear counting
                  else 0.5 * n                         // raw HLL

        math.abs(est - n) <= tol
      })
    assert(res.passed, res.status.toString)
  }
}
