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
  def pround(c: Column, n: Int): Column = {
    val p = math.pow(10, n)
    signum(c) * floor(abs(c) * p + 0.5) / p
  }
}
