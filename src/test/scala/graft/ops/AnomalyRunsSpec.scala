package graft.ops

import graft.SparkTestBase
import java.sql.Timestamp

/** w38_anomaly_runs: consecutive flagged hours collapse to one
  * incident; separated spikes stay separate runs. Fixture extends the
  * w36 spec's hand-computed diurnal corpus.
  */
class AnomalyRunsSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("w38: adjacent spike hours merge into one run; gaps split") {
    // type a: hod 13 counts 9,1,1,1 (day-1 spike: 36 > 24) and hod 14
    // counts 2,0,0,1 (day-1 spike: 8 > 6) -> day-1 13:00+14:00 are
    // CONSECUTIVE flagged hours = ONE 2-hour run peaking at 9.
    val a = (
      (1 to 9).map(i => ("a", ts(f"2025-03-01 13:${i}%02d:00"))) ++
        Seq(("a", ts("2025-03-02 13:30:00")),
          ("a", ts("2025-03-03 13:30:00")),
          ("a", ts("2025-03-04 13:30:00")),
          ("a", ts("2025-03-01 14:10:00")), ("a", ts("2025-03-01 14:20:00")),
          ("a", ts("2025-03-04 14:45:00")))
      )
    // type b: spikes at day-1 10:00 (9 vs 1,1,1) and day-1 12:00
    // (8 vs 1,1,1) with a CALM 11:00 between -> two 1-hour runs.
    val b = (
      (1 to 9).map(i => ("b", ts(f"2025-03-01 10:${i}%02d:00"))) ++
        (1 to 3).map(d => ("b", ts(f"2025-03-0${d + 1} 10:30:00"))) ++
        (1 to 4).map(d => ("b", ts(f"2025-03-0$d 11:30:00"))) ++
        (1 to 8).map(i => ("b", ts(f"2025-03-01 12:${i}%02d:00"))) ++
        (1 to 3).map(d => ("b", ts(f"2025-03-0${d + 1} 12:30:00")))
      )
    val raw = (a ++ b).toDF("event_type", "ts")
    val runs = RelOps.anomalyRunsOf(raw).collect()
      .map(r => (r.getAs[String]("event_type"),
        r.getAs[Timestamp]("run_start"), r.getAs[Timestamp]("run_end"),
        r.getAs[Long]("n_hours"), r.getAs[Long]("peak_n"))).toSeq
    assert(runs == Seq(
      ("a", ts("2025-03-01 13:00:00"), ts("2025-03-01 14:00:00"), 2L, 9L),
      ("b", ts("2025-03-01 10:00:00"), ts("2025-03-01 10:00:00"), 1L, 9L),
      ("b", ts("2025-03-01 12:00:00"), ts("2025-03-01 12:00:00"), 1L, 8L)),
      s"got ${runs.mkString("; ")}")
  }
}
