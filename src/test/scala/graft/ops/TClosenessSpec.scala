package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** w53_t_closeness: the skewness-attack audit cross-checked against an
  * independent in-memory recomputation on the sf0.001 events, plus
  * planted distributions pinning the exact-integer TVD at both ends
  * (a group matching the global mix passes, a homogeneous skewed group
  * fails the t = 0.2 cut).
  */
class TClosenessSpec extends SparkTestBase {
  import spark.implicits._

  test("w53: per-group integer TVD numerator, one-division tvd and the " +
      "t-flag match an independent recomputation") {
    val raw = graft.Tables.events(spark, sf0001)
      .select(col("event_type"),
        hour(col("ts")).cast("long").as("hr"),
        floor(col("value") / 10.0).cast("long").as("vb"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val n = raw.length.toLong
    val globalByType = raw.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val byGroup = raw.groupBy(e => (e._2, e._3))
    val out = RelOps.w53TCloseness(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("hr"), r.getAs[Long]("vb")) -> r).toMap
    assert(out.size == byGroup.size)
    byGroup.foreach { case (key, evs) =>
      val ng = evs.length.toLong
      val cnt = evs.groupBy(_._1).view.mapValues(_.length.toLong).toMap
      val num = globalByType.map { case (t, nt) =>
        math.abs(cnt.getOrElse(t, 0L) * n - nt * ng) }.sum
      val r = out(key)
      assert(r.getAs[Long]("n_events") == ng, s"$key n_events")
      assert(r.getAs[Long]("n_types") == cnt.size.toLong, s"$key n_types")
      assert(r.getAs[Double]("tvd_num") == num.toDouble, s"$key tvd_num")
      assert(r.getAs[Double]("tvd") ==
        num.toDouble / (2L * ng * n).toDouble, s"$key tvd")
      assert(r.getAs[Long]("t_fail") ==
        (if (5L * num >= 2L * ng * n) 1L else 0L), s"$key t_fail")
      // tvd is a probability distance: bounded to [0, 1]
      assert(r.getAs[Double]("tvd") >= 0.0 && r.getAs[Double]("tvd") <= 1.0)
    }
    graft.Caches.unpersistAll()
  }

  test("w53 planted: global-matching groups pass, a homogeneous skewed " +
      "group fails t = 0.2, absent types contribute their global mass") {
    // g1 (hr 1): 4A+4B, g2 (hr 2): 12A+12B, g3 (hr 3): 8A only.
    // Global: A=24, B=16, N=40. Hand-computed integer numerators:
    // g1: |4*40-24*8| + |4*40-16*8| = 32+32 = 64 -> tvd 0.1 (pass)
    // g2: 96+96 = 192 -> tvd 0.1 (pass)
    // g3: |8*40-24*8| + |0-16*8| = 128+128 = 256 -> tvd 0.4 (FAIL) —
    //     the absent-B term is half the distance; dropping it would
    //     pass the group
    val ev = (Seq.fill(4)("A") ++ Seq.fill(4)("B")).map(t => (t, 1L, 0L)) ++
      (Seq.fill(12)("A") ++ Seq.fill(12)("B")).map(t => (t, 2L, 0L)) ++
      Seq.fill(8)("A").map(t => (t, 3L, 0L))
    val rows = RelOps.tClosenessOf(
        ev.toDF("event_type", "hr", "vb"))
      .as[(Long, Long, Long, Long, Double, Double, Long)].collect().toSeq
    assert(rows == Seq(
      (1L, 0L, 8L, 2L, 64.0, 0.1, 0L),
      (2L, 0L, 24L, 2L, 192.0, 0.1, 0L),
      (3L, 0L, 8L, 1L, 256.0, 0.4, 1L)), s"got $rows")
    graft.Caches.unpersistAll()
  }

  test("w53 overflow (VERDICT r13 item 3): a ~6e9-event cell frame whose " +
      "numerator exceeds Long.MaxValue stays exact under DECIMAL(38,0)") {
    // Two disjoint homogeneous groups of 3e9 events each: for either
    // group, tvd_num = |3e9*6e9 - 3e9*3e9| + |0 - 3e9*3e9| = 1.8e19 —
    // past signed-64 (9.22e18), where the pre-widen long arithmetic
    // would wrap IDENTICALLY in both engines (the one failure mode the
    // oracle compare is blind to). Exact: tvd = 1.8e19/3.6e19 = 0.5,
    // over the t = 0.2 cut.
    val c = 3000000000L
    val cells = Seq(("X", 1L, 0L, c), ("Y", 2L, 0L, c))
      .toDF("event_type", "hr", "vb", "n_gt")
    val rows = RelOps.tClosenessFromCells(cells)
      .as[(Long, Long, Long, Long, Double, Double, Long)].collect().toSeq
    // the internal decimal is the exact 1.8e19; the published double is
    // its correctly-rounded image (exact here: 1.8e19 = 2^18 * 5^18 * 18
    // has < 53 significant bits), and tvd = 0.5 exactly — the wrapped
    // long path would have produced a NEGATIVE numerator
    val num = BigInt("18000000000000000000")
    assert(rows == Seq(
      (1L, 0L, c, 1L, num.toDouble, 0.5, 1L),
      (2L, 0L, c, 1L, num.toDouble, 0.5, 1L)), s"got $rows")
    assert(num > BigInt(Long.MaxValue), "the probe must actually overflow")
    graft.Caches.unpersistAll()
  }
}
