package graft.ops

import graft.SparkTestBase

/** w45_winsorized_stats: rank-based p05/p95 cuts, winsorized and
  * trimmed means, hand-computed on a planted outlier group.
  */
class WinsorizedSpec extends SparkTestBase {
  import spark.implicits._

  test("w45: one outlier — clamp pulls it to the cut, trim drops it") {
    // values 1..19 + 1000 (n=20): lo rank ceil(1)=1 -> 1.0,
    // hi rank ceil(19)=19 -> 19.0
    val ev = ((1 to 19).map(_.toDouble) :+ 1000.0)
      .map(("click", _)).toDF("event_type", "value")
    val r = RelOps.winsorizedOf(ev).head()
    assert(r.getAs[Long]("n") == 20L)
    assert(r.getAs[Double]("lo_cut") == 1.0)
    assert(r.getAs[Double]("hi_cut") == 19.0)
    assert(r.getAs[Double]("mean") == 1190.0 / 20)
    assert(r.getAs[Double]("winsorized_mean") == 209.0 / 20)
    assert(r.getAs[Double]("trimmed_mean") == 190.0 / 19)
    assert(r.getAs[Long]("n_trimmed") == 1L)
  }

  test("w45: ties at the cut are kept by trim") {
    // 1..18 + 19 + 19: hi rank 19 -> 19.0, both 19s inside the cuts
    val ev = ((1 to 18).map(_.toDouble) ++ Seq(19.0, 19.0))
      .map(("buy", _)).toDF("event_type", "value")
    val r = RelOps.winsorizedOf(ev).head()
    assert(r.getAs[Double]("hi_cut") == 19.0)
    assert(r.getAs[Long]("n_trimmed") == 0L)
    assert(r.getAs[Double]("winsorized_mean") ==
      r.getAs[Double]("trimmed_mean"))
  }

  test("w45: singleton group — all three means collapse to the value") {
    val r = RelOps.winsorizedOf(
      Seq(("view", 7.5)).toDF("event_type", "value")).head()
    assert(r.getAs[Double]("mean") == 7.5)
    assert(r.getAs[Double]("winsorized_mean") == 7.5)
    assert(r.getAs[Double]("trimmed_mean") == 7.5)
    assert(r.getAs[Long]("n_trimmed") == 0L)
  }

  test("w45: sf fixture — winsorized/trimmed bounded by the cuts, " +
      "raw mean unbounded") {
    val rows = RelOps.w45WinsorizedStats(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val lo = r.getAs[Double]("lo_cut"); val hi = r.getAs[Double]("hi_cut")
      assert(lo <= hi)
      val wm = r.getAs[Double]("winsorized_mean")
      assert(wm >= lo && wm <= hi)
      val tm = r.getAs[Double]("trimmed_mean")
      assert(tm >= lo && tm <= hi)
      assert(r.getAs[Long]("n_trimmed") >= 0L)
    }
  }
}
