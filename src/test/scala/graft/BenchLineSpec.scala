package graft

import org.scalatest.funsuite.AnyFunSuite

/** The round-7 driver gate crashed because the bench summary line grew past
  * a defensive `require` at 147 queries. The line now carries no per-query
  * data, so its length must be growth-proof — pin that here, for good.
  */
class BenchLineSpec extends AnyFunSuite {

  test("summary line stays under 1500 chars at 500 queries, zero errors") {
    // The line does not enumerate queries at all, so 500 vs 5 is identical;
    // assert on the healthy shape the driver actually sees.
    val line = Bench.summaryLine(12345.678, Some(9876.543), Nil,
      "/root/testdata/sf0.1")
    assert(line.length < 1500, s"line ${line.length} chars: $line")
    assert(line.startsWith("""{"metric":"total","value":12345.678"""))
    assert(line.contains(""""warm_total":9876.543"""))
    assert(line.endsWith(""""sf":"/root/testdata/sf0.1"}"""))
    assert(!line.contains("queries"), "per-query map must never return")
  }

  test("summary line truncates (never throws) with 500 failing queries") {
    val keys = (1 to 500).map(i => f"q$i%03d_some_long_query_name")
    val line = Bench.summaryLine(1.0, Some(1.0), keys, "/root/testdata/sf0.1")
    assert(line.length < 1500, s"line ${line.length} chars")
    assert(line.contains(""""errors_truncated":480"""))
  }

  test("no-warm-pass line omits warm_total") {
    val line = Bench.summaryLine(1.5, None, Nil, "sf")
    assert(!line.contains("warm_total"))
    assert(line == """{"metric":"total","value":1.500,"unit":"sec","sf":"sf"}""")
  }

  test("parseHistory reads config + warm_norm per query from a BENCH_FULL " +
      "body") {
    // shape is exactly what Bench.main writes: flat one-level query objects
    val body =
      """{"sf":"/root/testdata/sf0.1","cpus":32,"shuffle_partitions":32,""" +
      """"queries":{""" +
      """"q01_latest":{"cold":1.2,"warm":0.4,"cal":0.3,"warm_norm":1.333},""" +
      """"d22_family":{"cold":3.0,"warm":2.0,"cal":0.3,"warm_norm":6.667,""" +
      """"contaminated":true,"warm_rerun":1.9},""" +
      """"t01_tokens":{"cold":0.5,"warm":0.1}}""" +  // no cal -> no warm_norm
      ""","cold_total":4.7,"warm_total":2.5,"calibration_drift":1.51,""" +
      """"history_eligible":true,"errors":[]}"""
    val h = Bench.parseHistory(body)
    assert(h.norms == Map("q01_latest" -> 1.333, "d22_family" -> 6.667))
    assert(h.cpus == Some(32) && h.drift == Some(1.51) && h.outlierRows == 0)
  }

  test("parseHistory survives field reordering, brace-laden error strings " +
      "and embedded warm_norm fragments (the r13 regex failure modes)") {
    // warm_norm BEFORE cold, an error value that embeds a fake
    // '"name":{"warm_norm":...' fragment, and trailing config fields —
    // the exact shapes ADVICE r13 showed could fabricate/drop entries
    // under the whole-body regex
    val body =
      """{"queries":{""" +
      """"w01_agg":{"warm_norm":2.5,"cold":1.0,"warm":0.8},""" +
      """"x02_bad":{"cold":-1.0,"warm":-1.0,""" +
      """"error":"Boom: {\"fake\":{\"warm_norm\":99.9} } brace } soup"},""" +
      """"y03_out":{"cold":2.0,"warm":1.5,"warm_norm":5.0,""" +
      """"hist_outlier":true,"hist_norm":1.0,"warm_rerun":0.7}},""" +
      """"calibration_drift":6.12,"cpus":4,"sf":"/x"}"""
    val h = Bench.parseHistory(body)
    assert(h.norms == Map("w01_agg" -> 2.5, "y03_out" -> 5.0),
      s"fabricated or dropped norms: ${h.norms}")
    assert(h.cpus == Some(4) && h.drift == Some(6.12) && h.outlierRows == 1)
  }

  test("parseHistory is total on garbage input") {
    assert(Bench.parseHistory("") == Bench.BenchHistory(None, None, 0, Map.empty))
    assert(Bench.parseHistory("not json at all { } [").norms.isEmpty)
    assert(Bench.parseHistory("""{"queries":[1,2]}""").norms.isEmpty)
  }

  test("historyUsable: quiet same-config history adjudicates; mismatched " +
      "cores, noise, outlier rows or an empty parse each disable it") {
    val quiet32 = Bench.BenchHistory(Some(32), Some(1.51), 0,
      Map("q01_x" -> 1.0))
    assert(Bench.historyUsable(quiet32, 32).isRight)
    assert(Bench.historyUsable(quiet32, 4) ==
      Left("cpus-mismatch hist=32 run=4"),
      "a cpus-4 history must never judge a cpus-32 sweep (r13 item 1)")
    assert(Bench.historyUsable(quiet32.copy(cpus = None), 32).isLeft,
      "pre-r14 artifact without a recorded config: disabled")
    assert(Bench.historyUsable(quiet32.copy(drift = Some(6.12)), 32) ==
      Left("noisy-history drift=6.12"),
      "the r13 driver sweep (drift 6.12) must not become a baseline")
    assert(Bench.historyUsable(quiet32.copy(drift = None), 32).isLeft)
    assert(Bench.historyUsable(quiet32.copy(outlierRows = 5), 32) ==
      Left("history-has-outliers n=5"))
    assert(Bench.historyUsable(quiet32.copy(norms = Map.empty), 32) ==
      Left("no-norms"))
  }

  test("history outlier policy: 3x committed norm AND the absolute floor") {
    // committed norm 2.0 -> threshold 6.0
    assert(Bench.isHistOutlier(sweepNorm = 70.0, warmSec = 9.75,
      committedNorm = Some(2.0)), "the r12 d22 shape must flag")
    assert(!Bench.isHistOutlier(5.9, 2.0, Some(2.0)), "below 3x: quiet")
    assert(!Bench.isHistOutlier(70.0, 0.05, Some(2.0)),
      "sub-100ms rows are timer noise, never re-run")
    assert(!Bench.isHistOutlier(70.0, 9.75, None),
      "no committed history (new query): policy disabled for the row")
    assert(!Bench.isHistOutlier(70.0, 9.75, Some(-1.0)),
      "non-positive committed norm: disabled")
  }
}
