package graft.ops

import graft.SparkTestBase

/** w35_rolling_active: hand-computed DAU/WAU on the sf0.001 fixture is
  * impractical, so the invariants are pinned on the real output plus a
  * reconciliation against independently-computed day sets.
  */
class RollingActiveSpec extends SparkTestBase {
  import spark.implicits._

  test("w35: invariants and an independent WAU reconciliation") {
    val rows = RelOps.w35RollingActive(spark, sf0001).collect()
    assert(rows.nonEmpty)
    // dau <= wau7 always (today's actives are inside the trailing week)
    rows.foreach { r =>
      val dau = r.getAs[Long]("dau"); val wau = r.getAs[Long]("wau7")
      assert(dau <= wau, s"${r.getAs[java.sql.Date]("day")}: $dau > $wau")
      val s = r.getAs[Any]("stickiness")
      if (wau == 0L) assert(s == null)
      else assert(s == dau.toDouble / wau)
    }
    // independent reconciliation: WAU on one mid-span day == distinct
    // users with any activity in [day-6, day]
    val ud = graft.Tables.events(spark, sf0001)
      .selectExpr("user_id", "to_date(ts) AS day").distinct().collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    val mid = rows(rows.length / 2)
    val midDay = mid.getAs[java.sql.Date]("day").toLocalDate
    val expect = ud.filter { case (_, d) =>
      !d.isAfter(midDay) && !d.isBefore(midDay.minusDays(6))
    }.map(_._1).distinct.length.toLong
    assert(mid.getAs[Long]("wau7") == expect)
  }

  test("w35: day spine is contiguous from first to last active day") {
    val days = RelOps.w35RollingActive(spark, sf0001).collect()
      .map(_.getAs[java.sql.Date]("day").toLocalDate)
    days.sliding(2).foreach { w =>
      assert(w(1) == w(0).plusDays(1), s"spine gap between ${w(0)} and ${w(1)}")
    }
  }
}
