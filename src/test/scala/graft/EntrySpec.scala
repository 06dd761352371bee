package graft

/** Driver-contract smoke: entry returns rows on sf0.001; every declared
  * query runs and has an oracle (or is explicitly oracle-free).
  */
class EntrySpec extends SparkTestBase {

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query runs non-empty on sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf0001).count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("oracle coverage: every oracle key has a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("rows-only set is exactly the documented one (w06, estimate-valued)") {
    // a typo'd oracle key would silently demote a query to rows-only —
    // pin the intentional set so any drift fails loudly. m02/m04 gained
    // DuckDB oracles in r4; w06's HLL estimate legitimately has none.
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly == Set("w06_approx_distinct"),
      s"unexpected rows-only set: $rowsOnly")
  }
}
