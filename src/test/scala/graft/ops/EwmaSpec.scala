package graft.ops

import graft.SparkTestBase
import java.sql.Timestamp

/** w42_ewma: hand-computed dyadic-weight smoothing on a planted spike. */
class EwmaSpec extends SparkTestBase {
  import spark.implicits._

  test("w42: expanding start, spike decay by halves, exact ratios") {
    // type a, hours 0..3 with counts 8, 0, 0, 4 (hour-1/2 cells are
    // real zeros from the spine).
    val raw = ((1 to 8).map(i =>
      ("a", Timestamp.valueOf(f"2025-03-01 00:${i}%02d:00"))) ++
      (1 to 4).map(i =>
        ("a", Timestamp.valueOf(f"2025-03-01 03:${i}%02d:00")))).toDF("event_type", "ts")
    val out = RelOps.w42EwmaOf(raw).collect()
      .map(r => r.getAs[Timestamp]("hour").toString.take(13) ->
        ((r.getAs[Long]("n"), r.getAs[Double]("ewma"),
          Option(r.getAs[Any]("surge_ratio"))))).toMap
    // hour0: window {h0}: num = 8*2^23, den = 2^23 -> ewma 8, surge 1
    assert(out("2025-03-01 00") == ((8L, 8.0, Some(1.0))))
    // hour1: num = 0*2^23 + 8*2^22, den = 2^23 + 2^22 -> 8/3
    assert(out("2025-03-01 01") == ((0L, 8.0 / 3.0, Some(0.0))))
    // hour2: num = 8*2^21, den = 2^23+2^22+2^21 -> 8/7
    assert(out("2025-03-01 02") == ((0L, 8.0 / 7.0, Some(0.0))))
    // hour3: num = 4*2^23 + 8*2^20, den = 2^23+...+2^20 = 15*2^20
    // -> (32+8)/15 = 8/3; surge = 4 / (8/3) = 1.5
    assert(out("2025-03-01 03") == ((4L, 8.0 / 3.0, Some(1.5))))
    graft.Caches.unpersistAll()
  }

  test("w42: a constant-rate stream smooths to EXACTLY the rate at " +
      "every hour (dyadic weights cancel, no float residue)") {
    // 3 events every hour for 40 hours: num = 3 * den at every cell
    // (expanding start included), so ewma == 3.0 and surge == 1.0
    // BIT-EXACTLY — the property float EWMA weights cannot deliver.
    val raw = (0 until 40).flatMap { h =>
      (1 to 3).map(i => ("a",
        Timestamp.valueOf(f"2025-03-01 ${h % 24}%02d:0$i:00")))
    }.zipWithIndex.map { case ((ty, ts0), i) =>
      (ty, new Timestamp(ts0.getTime + (i / 72) * 86400000L))
    }.toDF("event_type", "ts")
    val rows = RelOps.w42EwmaOf(raw).collect()
    assert(rows.length == 40)
    rows.foreach { r =>
      assert(r.getAs[Double]("ewma") == 3.0, s"residue at $r")
      assert(r.getAs[Double]("surge_ratio") == 1.0)
    }
    graft.Caches.unpersistAll()
  }
}
