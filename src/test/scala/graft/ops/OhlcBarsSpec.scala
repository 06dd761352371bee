package graft.ops

import graft.SparkTestBase
import java.sql.Timestamp
import org.apache.spark.sql.functions._

/** w33_ohlc_bars: open/high/low/close per (type, hour) by the
  * (ts, event_id) total order, NULL readings faithful, exact volume.
  */
class OhlcBarsSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("w33: boundary picks, NULL open, and the event_id tie rule") {
    val e = Seq(
      // hour 10: NULL first reading -> open_v is genuinely NULL
      ("a", ts("2025-01-01 10:00:05"), 1L, Option.empty[Double]),
      ("a", ts("2025-01-01 10:20:00"), 2L, Some(5.0)),
      ("a", ts("2025-01-01 10:40:00"), 3L, Some(1.0)),
      // hour 11: two readings at the SAME ts -> event_id breaks the tie
      // (open from id 4, close from id 5)
      ("a", ts("2025-01-01 11:00:00"), 4L, Some(2.0)),
      ("a", ts("2025-01-01 11:00:00"), 5L, Some(7.0)),
      // another type in hour 10 must not mix in
      ("b", ts("2025-01-01 10:30:00"), 6L, Some(9.0))
    ).toDF("event_type", "ts", "event_id", "value")
    val rows = RelOps.ohlcBars(e).collect()
    assert(rows.length == 3)
    val a10 = rows(0)
    assert(a10.getAs[String]("event_type") == "a")
    assert(a10.getAs[Long]("n_events") == 3L)
    assert(a10.isNullAt(a10.fieldIndex("open_v"))) // NULL first reading
    assert(a10.getAs[Double]("high_v") == 5.0)
    assert(a10.getAs[Double]("low_v") == 1.0)
    assert(a10.getAs[Double]("close_v") == 1.0)
    assert(a10.getAs[Double]("sum_value") == 6.0)
    val a11 = rows(1)
    assert(a11.getAs[Double]("open_v") == 2.0)
    assert(a11.getAs[Double]("close_v") == 7.0)
    assert(a11.getAs[Double]("high_v") == 7.0)
    assert(a11.getAs[Double]("low_v") == 2.0)
    val b10 = rows(2)
    assert(b10.getAs[String]("event_type") == "b")
    assert(b10.getAs[Long]("n_events") == 1L)
    assert(b10.getAs[Double]("open_v") == 9.0)
    assert(b10.getAs[Double]("close_v") == 9.0)
  }
}
