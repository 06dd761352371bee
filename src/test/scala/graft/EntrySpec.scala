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

  test("rows-only set is empty: every registered query is oracle-checked") {
    // a typo'd oracle key would silently demote a query to rows-only —
    // pin the intentional set so any drift fails loudly. m02/m04 gained
    // DuckDB oracles in r4; w06 gained its in-band-flag oracle in r12
    // (the estimate enters only through a check the oracle can state).
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly == Set.empty[String],
      s"unexpected rows-only set: $rowsOnly")
  }
}
