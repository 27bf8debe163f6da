package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations compiled into ONE scan.
  *
  * The operational shape of a load gate at 100 TB: a batch is admitted
  * or quarantined based on a SUITE of checks (null rates, key
  * uniqueness, value ranges, enum membership, freshness), and the
  * suite must cost ONE pass over the batch, not one pass per check —
  * ten sequential `df.filter(bad).count()` calls read the batch ten
  * times. Here every check contributes an aggregate expression to a
  * single `agg` (map-side combined; uniqueness rides the same pass as
  * a distinct-count), and the 1-row wide result is unpivoted with
  * `stack` into one report row per check. Nothing shuffles more than
  * the |checks|-column single row.
  *
  * Reference anchor: scraper_v2.py:703-757 validates scraped rows
  * field-by-field before save (non-null DBD id, 13-digit format,
  * year in range); this generalizes that per-row gate into a suite
  * report with per-check violation counts.
  *
  * Row-level semantics: a NULL never violates range/set/freshness
  * checks (it violates `notNull`, which is its own check) — the
  * three-valued `cast(null AS long)` rows are skipped by `sum`, and
  * the final coalesce keeps an all-null column's count at 0.
  */
object Expectations {

  /** One expectation: `violations` must be an AGGREGATE expression
    * counting offending rows (it is evaluated inside a single
    * `df.agg`). Names appear as string literals in a stack() call —
    * keep them quote-free identifiers. */
  final case class Check(name: String, violations: Column) {
    require(!name.contains("'"), s"check name must be quote-free: $name")
  }

  def notNull(c: String): Check =
    Check(s"not_null_$c", sum(col(c).isNull.cast("long")))

  /** Violations = duplicate rows beyond the first per NON-NULL key
    * value (count(col) and countDistinct both skip NULLs, so a NULL
    * key is notNull's violation, not a phantom duplicate here). */
  def unique(c: String): Check =
    Check(s"unique_$c", count(col(c)) - countDistinct(col(c)))

  def inRange(c: String, lo: Column, hi: Column): Check =
    Check(s"range_$c", sum((col(c) < lo || col(c) > hi).cast("long")))

  def inSet(c: String, allowed: Seq[String]): Check =
    Check(s"set_$c", sum((!col(c).isInCollection(allowed)).cast("long")))

  /** Freshness/sanity bound: no value past `bound` (e.g. no dates in
    * the future of the load window). */
  def atMost(c: String, bound: Column): Check =
    Check(s"at_most_$c", sum((col(c) > bound).cast("long")))

  /** Row-level twin of a [[Check]]: a per-row `bad` predicate, so a
    * suite can ROUTE offending rows instead of only counting them.
    * `unique` has no row-local predicate (it needs a key census) —
    * uniqueness stays report-side; duplicate routing is the dedup
    * operators' territory. */
  final case class RowCheck(name: String, bad: Column) {
    require(!name.contains("'"), s"check name must be quote-free: $name")
  }

  def notNullRow(c: String): RowCheck =
    RowCheck(s"not_null_$c", col(c).isNull)

  def inRangeRow(c: String, lo: Column, hi: Column): RowCheck =
    RowCheck(s"range_$c", col(c) < lo || col(c) > hi)

  def inSetRow(c: String, allowed: Seq[String]): RowCheck =
    RowCheck(s"set_$c", !col(c).isInCollection(allowed))

  def atMostRow(c: String, bound: Column): RowCheck =
    RowCheck(s"at_most_$c", col(c) > bound)

  /** The quarantine SPLIT — the other half of the load gate: the
    * input plus a `reason` column carrying the FIRST failing check's
    * name, null for admitted rows. One map-side projection (zero
    * exchanges); callers route `reason.isNotNull` to the quarantine
    * sink and the rest onward — the batch is still read once, the
    * split is a predicate not a second pass. NULL values fail only
    * their `notNullRow` check (a NULL range/set/bound predicate
    * coalesces to not-bad), mirroring [[report]]'s three-valued
    * semantics. */
  def quarantine(df: DataFrame, checks: Seq[RowCheck]): DataFrame = {
    require(checks.nonEmpty, "empty expectation suite")
    df.withColumn("reason",
      coalesce(checks.map(c =>
        when(coalesce(c.bad, lit(false)), lit(c.name))) :+
        lit(null).cast("string"): _*))
  }

  /** Run the suite in one scan. Returns one row per check:
    * (check_name, n_rows, violations, passed), in suite order. */
  def report(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "empty expectation suite")
    val aggs = checks.zipWithIndex.map { case (c, i) =>
      coalesce(c.violations.cast("long"), lit(0L)).as(s"v$i")
    }
    val wide = df.agg(count(lit(1)).as("n_rows"), aggs: _*)
    val stackArgs = checks.zipWithIndex
      .map { case (c, i) => s"'${c.name}', v$i" }.mkString(", ")
    wide
      .selectExpr("n_rows",
        s"stack(${checks.size}, $stackArgs) AS (check_name, violations)")
      .select(col("check_name"), col("n_rows"), col("violations"),
        (col("violations") === 0L).as("passed"))
  }
}
