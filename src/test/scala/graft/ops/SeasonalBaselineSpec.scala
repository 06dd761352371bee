package graft.ops

import graft.SparkTestBase
import java.sql.Timestamp

/** w36_seasonal_baseline: hour-of-day baselines, the integer spike
  * rule, and the real-zero spine discipline.
  */
class SeasonalBaselineSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("w36: spike judged against its own hour-of-day; zeros honest") {
    // type "a", hour-of-day 13 across 4 days: counts 9,1,1,1 ->
    // baseline 3.0, and 9*4 > 2*12 flags day 1 only. Day 2's hod-14
    // hour has NO events: the spine materializes it with n=0, baseline
    // for hod 14 = (2+0+0+0)/4 = 0.5, never flagged.
    val raw = (
      (1 to 9).map(i => ("a", ts(f"2025-03-01 13:${i}%02d:00"))) ++
        Seq(("a", ts("2025-03-02 13:30:00")),
          ("a", ts("2025-03-03 13:30:00")),
          ("a", ts("2025-03-04 13:30:00")),
          // hod 14 exists only on day 1 (2 events); days 2-4 zero-fill
          ("a", ts("2025-03-01 14:10:00")), ("a", ts("2025-03-01 14:20:00")),
          // close the span at day 4 hod 14 so all 4 days are in-span
          ("a", ts("2025-03-04 14:45:00")))
      ).toDF("event_type", "ts")
    val rows = RelOps.seasonalBaseline(raw).collect()
    val at = rows.map(r => r.getAs[Timestamp]("hour") -> r).toMap
    val d1h13 = at(ts("2025-03-01 13:00:00"))
    assert(d1h13.getAs[Long]("n") == 9L)
    assert(d1h13.getAs[Double]("baseline") == 3.0)
    assert(d1h13.getAs[Long]("is_spike") == 1L)
    // the other hod-13 slots share the baseline and are calm
    assert(at(ts("2025-03-02 13:00:00")).getAs[Long]("is_spike") == 0L)
    // hod 14: day-2 cell exists with n=0 (real zero), baseline 0.75
    val d2h14 = at(ts("2025-03-02 14:00:00"))
    assert(d2h14.getAs[Long]("n") == 0L)
    assert(d2h14.getAs[Double]("baseline") == 0.75)
    assert(d2h14.getAs[Long]("is_spike") == 0L)
    // day-1 hod 14 (n=2): 2*4 > 2*3 -> spike (diurnal-aware: 2 events
    // IS a surge for an hour whose mean is 0.75)
    assert(at(ts("2025-03-01 14:00:00")).getAs[Long]("is_spike") == 1L)
  }
}
