package graft.ops

import graft.SparkTestBase
import java.sql.Timestamp

/** w34_session_funnel: the in-session funnel. Pins the case that
  * separates it from w26 — a purchase in a LATER session must not
  * convert the earlier session's view.
  */
class SessionFunnelSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("w34: stages per session; cross-session purchase does not convert") {
    val e = Seq(
      // session 1: view -> click, NO purchase inside (stage 2)
      (7L, ts("2025-01-01 10:00:00"), 1L, "view"),
      (7L, ts("2025-01-01 10:05:00"), 2L, "click"),
      // > 30 min gap -> session 2: purchase first (no view: stage 0),
      // then a view with nothing after it
      (7L, ts("2025-01-01 11:00:00"), 3L, "purchase"),
      (7L, ts("2025-01-01 11:10:00"), 4L, "view"),
      // another user, one full funnel in one session (stage 3)
      (8L, ts("2025-01-01 09:00:00"), 5L, "view"),
      (8L, ts("2025-01-01 09:01:00"), 6L, "click"),
      (8L, ts("2025-01-01 09:02:00"), 7L, "purchase")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val rows = RelOps.sessionFunnel(e).collect()
      .map(r => ((r.getAs[Long]("user_id"), r.getAs[Long]("sess_id")),
        r.getAs[Long]("stage_reached"))).toMap
    assert(rows == Map(
      (7L, 1L) -> 2L, // w26 would say 3 for user 7 — the session firewall
      (7L, 2L) -> 1L, // purchase BEFORE the view doesn't count; view alone
      (8L, 1L) -> 3L))
  }

  test("w34: full-funnel latency is the exact microsecond span") {
    val e = Seq(
      (1L, ts("2025-01-01 09:00:00"), 1L, "view"),
      (1L, ts("2025-01-01 09:01:00"), 2L, "click"),
      (1L, ts("2025-01-01 09:02:30"), 3L, "purchase")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val r = RelOps.sessionFunnel(e).collect().head
    assert(r.getAs[Long]("stage_reached") == 3L)
    assert(r.getAs[Long]("funnel_us") == 150L * 1000000L)
  }
}
