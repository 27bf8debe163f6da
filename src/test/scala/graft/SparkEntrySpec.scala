package graft

class SparkEntrySpec extends SparkSpec {

  test("entry flagship query returns rows (driver smoke parity)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has an oracle or is an explicitly known rows-only op") {
    val rowsOnly = Set("agg_approx") // sketches: engine-specific, no SQL twin
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- rowsOnly
    assert(missing.isEmpty, s"queries without oracle: $missing")
    val orphaned = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphaned.isEmpty, s"oracles without query: $orphaned")
  }
}
