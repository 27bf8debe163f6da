package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable decimal rounding.
  *
  * Spark's `round` goes through Java BigDecimal on the *exact* binary
  * expansion of the double, while DuckDB (and C/C++ engines
  * generally) compute `std::round(x * 10^n) / 10^n` in binary. The
  * two disagree on values whose product lands on a .5 boundary after
  * the multiply (observed: quality score 0.42225 → Spark 0.4222,
  * DuckDB 0.4223). Since the correctness gate hash-compares against
  * DuckDB, round the C way: sign(x) * floor(|x|·10^n + 0.5) / 10^n —
  * bit-identical to DuckDB's round on 500k fuzzed doubles.
  */
object PRound {
  /** 2^52 — at and above this every double IS an integer, so C round
    * is the identity. The guard also keeps the floor path honest:
    * Spark's floor(double) returns a LONG, which saturates at 2^63
    * (observed: stats_kruskal's ~5e13 rank-sum terms at 6 dp all
    * collapsed to Long.MaxValue/1e6) — DuckDB never leaves the double
    * domain, so without the guard the two engines diverge exactly
    * where the long clamps. */
  private val IntegralAt = 4503599627370496.0

  def pround(c: Column, n: Int): Column = {
    val p = math.pow(10, n)
    // DuckDB's double round guards a non-finite SCALED intermediate
    // and returns the input unchanged (checked: round(1e308, 2) =
    // 1e308, not inf); mirror it (ADVICE r11). The scaled value is
    // LET-BOUND via a single-element transform: pround often sits
    // inside fold lambdas where Catalyst does no CSE, so each extra
    // reference to |c|·10^n would re-evaluate the caller's whole
    // input subtree (measured ~0.05 s on the fold-heaviest query).
    element_at(transform(array(abs(c) * p), y =>
      when(isnan(y) || y === Double.PositiveInfinity, c)
        .otherwise(signum(c) * when(y < IntegralAt,
          floor(y + 0.5).cast("double")).otherwise(y) / p)), 1)
  }
}
