package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins PRound's C-style rounding contract, in particular the
  * large-magnitude regime: Spark's floor(double) returns a LONG, so a
  * naive sign·floor(|x|·10^n + 0.5)/10^n saturates at 2^63 — observed
  * as stats_kruskal's ~5e13 rank-sum terms all collapsing to
  * Long.MaxValue/1e6 at sf0.1 while DuckDB (double-domain std::round)
  * returned them untouched. At |x|·10^n ≥ 2^52 every double is an
  * integer, so the portable behavior is (x·10^n)/10^n — identity up
  * to the multiply/divide round-trip. */
class PRoundSpec extends SparkSpec {

  private def pr(x: Double, n: Int): Double = {
    import spark.implicits._
    Seq(x).toDF("x").select(PRound.pround(col("x"), n).as("r"))
      .head().getDouble(0)
  }

  test("normal range rounds half away from zero (the C way)") {
    assert(pr(0.42225, 4) == 0.4223) // the Spark-BigDecimal divergence case
    assert(pr(-0.42225, 4) == -0.4223)
    // 1.005 is 1.00499999… in binary: the C way (multiply first) sees
    // 100.49999… and rounds DOWN — this is exactly where BigDecimal
    // string-rounding would disagree
    assert(pr(1.005, 2) == 1.0)
    assert(pr(2.5, 0) == 3.0)
    assert(pr(-2.5, 0) == -3.0)
  }

  test("above 2^52 / 10^n the long-floor path is bypassed — no Long.MaxValue clamp") {
    // 5e13 at 6 dp: y = 5e19 > 2^63 — the old formula returned
    // Long.MaxValue/1e6 = 9.223372036854775e12 for EVERY such input
    val x = 5.0000004e13
    val got = pr(x, 6)
    assert(got != 9.223372036854775e12, s"long-saturated: $got")
    // double-domain replay: (x·1e6)/1e6, exactly what DuckDB computes
    assert(got == (x * 1e6) / 1e6, s"$got")
  }

  test("just below the guard the floor path still rounds") {
    // y = x·100 ≈ 4.39e15 < 2^52: floor path applies and is exact
    val x = 43960465923875.13
    assert(pr(x, 2) == math.floor(x * 100 + 0.5) / 100)
  }
}
