package graft.ops

import graft.SparkTestBase

/** w46_weekly_profile: dow × hour heatmap with the full zero-cell
  * spine and epoch-arithmetic day-of-week.
  */
class WeeklyProfileSpec extends SparkTestBase {

  test("w46: sf fixture — full 7x24 spine per type, shares sum to 1, " +
      "dow anchored to the epoch Thursday") {
    val rows = RelOps.w46WeeklyProfile(spark, sf0001).collect()
    val types = rows.map(_.getAs[String]("event_type")).distinct
    assert(rows.length == types.length * 7 * 24)
    types.foreach { t =>
      val cells = rows.filter(_.getAs[String]("event_type") == t)
      assert(math.abs(
        cells.map(_.getAs[Double]("share_of_type")).sum - 1.0) < 1e-9)
    }
    // independent dow check: recompute one non-empty cell's dow from
    // the raw timestamps via java.time (Sunday=0 convention)
    val ev = graft.Tables.events(spark, sf0001)
      .select("event_type", "ts").limit(1).collect()(0)
    val ts = ev.getAs[java.sql.Timestamp]("ts")
    val utcDate = ts.toInstant.atZone(java.time.ZoneOffset.UTC).toLocalDate
    val expectedDow = utcDate.getDayOfWeek.getValue % 7 // Mon=1..Sun=7 -> Sun=0
    val hour = ts.toInstant.atZone(java.time.ZoneOffset.UTC).getHour
    val cell = rows.find(r =>
      r.getAs[String]("event_type") == ev.getAs[String]("event_type") &&
        r.getAs[Long]("dow") == expectedDow &&
        r.getAs[Long]("hour") == hour).get
    assert(cell.getAs[Long]("n") >= 1L)
  }

  test("w46: zero cells are real rows with share 0") {
    val rows = RelOps.w46WeeklyProfile(spark, sf0001).collect()
    val zeros = rows.filter(_.getAs[Long]("n") == 0L)
    zeros.foreach(r => assert(r.getAs[Double]("share_of_type") == 0.0))
    // counts reconcile: per-type sums equal the raw event counts
    val raw = graft.Tables.events(spark, sf0001)
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    raw.foreach { case (t, n) =>
      assert(rows.filter(_.getAs[String]("event_type") == t)
        .map(_.getAs[Long]("n")).sum == n)
    }
  }
}
