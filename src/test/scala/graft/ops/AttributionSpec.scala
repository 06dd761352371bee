package graft.ops

import graft.SparkTestBase
import java.sql.Timestamp

/** w44_attribution: first/last-touch credit under the 7-day lookback.
  * Plants the five boundary cases the window bounds exist for: a clean
  * funnel, a stale touch (outside lookback), a touch AFTER the
  * purchase, a same-microsecond touch (must not attribute), a
  * same-microsecond view/click pair (event-id tiebreak shows in the
  * channels), and an exactly-7-days touch (inclusive lower bound).
  */
class AttributionSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("w44: hand-computed attribution across the boundary cases") {
    val ev = Seq(
      // u1: view -> click -> purchase (first view, last click)
      (1L, ts("2025-03-10 10:00:00"), 1L, "view"),
      (2L, ts("2025-03-10 11:00:00"), 1L, "click"),
      (3L, ts("2025-03-10 12:00:00"), 1L, "purchase"),
      // u2: click 9 days before the purchase — stale, none/none
      (4L, ts("2025-03-01 10:00:00"), 2L, "click"),
      (5L, ts("2025-03-10 10:00:00"), 2L, "purchase"),
      // u3: the only view comes AFTER the purchase — none/none
      (6L, ts("2025-03-10 10:00:00"), 3L, "purchase"),
      (7L, ts("2025-03-10 13:00:00"), 3L, "view"),
      // u4: view at the purchase's exact microsecond — excluded
      (8L, ts("2025-03-10 10:00:00"), 4L, "view"),
      (9L, ts("2025-03-10 10:00:00"), 4L, "purchase"),
      // u5: same-microsecond view(12)/click(13): first = lower id
      (12L, ts("2025-03-10 09:00:00"), 5L, "view"),
      (13L, ts("2025-03-10 09:00:00"), 5L, "click"),
      (14L, ts("2025-03-10 10:00:00"), 5L, "purchase"),
      // u6: touch exactly 7 days before — inclusive, attributes
      (15L, ts("2025-03-03 10:00:00"), 6L, "view"),
      (16L, ts("2025-03-10 10:00:00"), 6L, "purchase")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val rows = RelOps.w44AttributionOf(spark, ev).collect()
    val m = rows.map(r =>
      (r.getAs[String]("model"), r.getAs[String]("channel")) ->
        ((r.getAs[Long]("n_conversions"), r.getAs[Double]("share")))).toMap
    assert(m.size == 6)
    // 6 purchases: first-touch view {u1,u5,u6}, none {u2,u3,u4}
    assert(m(("first_touch", "view")) == ((3L, 3.0 / 6.0)))
    assert(m(("first_touch", "click")) == ((0L, 0.0)))
    assert(m(("first_touch", "none")) == ((3L, 3.0 / 6.0)))
    // last-touch: click {u1,u5}, view {u6}, none {u2,u3,u4}
    assert(m(("last_touch", "click")) == ((2L, 2.0 / 6.0)))
    assert(m(("last_touch", "view")) == ((1L, 1.0 / 6.0)))
    assert(m(("last_touch", "none")) == ((3L, 3.0 / 6.0)))
    graft.Caches.unpersistAll()
  }

  test("w44: sf fixture — both models conserve the purchase total") {
    val rows = RelOps.w44Attribution(spark, sf0001).collect()
    assert(rows.length == 6)
    val purchases = graft.Tables.events(spark, sf0001)
      .filter(org.apache.spark.sql.functions.col("event_type") === "purchase")
      .count()
    rows.groupBy(_.getAs[String]("model")).foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Long]("n_conversions")).sum == purchases)
      assert(math.abs(rs.map(_.getAs[Double]("share")).sum - 1.0) < 1e-9)
    }
    graft.Caches.unpersistAll()
  }
}
