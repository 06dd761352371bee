package graft

import org.scalatest.funsuite.AnyFunSuite

/** CI gate over the committed BENCH_FULL.json (VERDICT r13 item 5):
  * the artifact in the tree is the next sweep's adjudication baseline,
  * so it must (a) parse structurally with its config recorded, and
  * (b) never be able to FUNCTION as a baseline while noisy — the
  * `historyUsable` policy must refuse any artifact with sweep drift
  * >= 2 or unresolved outlier rows, at every core count.
  *
  * Deliberately conditional rather than "committed artifact must be
  * quiet": the round driver overwrites BENCH_FULL.json with its own
  * sweep at round end (r13: drift 6.12, 5 outlier rows landed in the
  * round commit), so an absolute quietness assert would turn driver
  * noise into a red test no code change caused. The enforced property
  * is the one that matters: a noisy artifact is structurally incapable
  * of steering the 3x hist_norm gate — Bench refuses it at load and
  * says so on the `# bench-history` line.
  */
class BenchHistoryGateSpec extends AnyFunSuite {

  private val path = java.nio.file.Paths.get("BENCH_FULL.json")

  test("committed BENCH_FULL.json parses with config + norms recorded") {
    assume(java.nio.file.Files.exists(path), "no committed artifact")
    val h = Bench.parseHistory(
      new String(java.nio.file.Files.readAllBytes(path), "UTF-8"))
    assert(h.norms.nonEmpty, "artifact must carry per-query warm_norm rows")
    assert(h.cpus.isDefined,
      "artifact must record its core count (r13 item 1) — " +
        "a config-less history can never adjudicate")
    assert(h.drift.isDefined, "artifact must record calibration_drift")
  }

  test("a noisy committed artifact can never adjudicate a sweep") {
    assume(java.nio.file.Files.exists(path), "no committed artifact")
    val h = Bench.parseHistory(
      new String(java.nio.file.Files.readAllBytes(path), "UTF-8"))
    val noisy = h.drift.exists(_ >= Bench.QuietDrift) || h.outlierRows > 0
    for (cores <- Seq(4, 32, h.cpus.getOrElse(32))) {
      val usable = Bench.historyUsable(h, cores).isRight
      if (noisy) assert(!usable,
        s"drift=${h.drift} outliers=${h.outlierRows} yet usable at $cores " +
          "cores — a noisy artifact is steering the hist_norm gate")
      if (usable) assert(h.cpus.contains(cores) &&
        h.drift.exists(_ < Bench.QuietDrift) && h.outlierRows == 0,
        "usable must imply same-config AND quiet AND outlier-free")
    }
  }
}
