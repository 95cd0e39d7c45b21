package graft

/** Contract checks for the driver surface: every query runs on sf0.001,
  * entry() smoke, and queries/oracleSql key alignment.
  */
class QueriesSpec extends SparkSpec {

  test("entry returns rows (driver t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("every query has an oracle (or is documented rows-only)") {
    // approx sketches (HLL / KLL) are engine-specific by construction; the
    // exact twins q_distinct_users / q_percentile carry the oracle check.
    val rowsOnly = Set("q_approx_sketch")
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- rowsOnly
    assert(missing.isEmpty, s"queries without oracles: $missing")
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs on sf0.001 with a non-degenerate result") {
      val df = fn(spark, sf0001)
      assert(df.columns.nonEmpty)
      assert(df.count() >= 0)
    }
  }
}
