package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** w52_l_diversity: the homogeneity-attack audit cross-checked against
  * an independent in-memory recomputation of sensitive-value diversity
  * per quasi-group on the sf0.001 events.
  */
class LDiversitySpec extends SparkTestBase {

  test("w52: group, homogeneous/weak and exposure counts match an " +
      "independent recomputation at l=3") {
    val raw = graft.Tables.events(spark, sf0001)
      .select(col("event_type"), col("user_id"),
        hour(col("ts")).cast("long").as("hr"),
        floor(col("value") / 10.0).cast("long").as("vb"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byGroup = raw.groupBy(e => (e._3, e._4)) // (hr, vb) QI tuple
    val out = RelOps.w52LDiversity(spark, sf0001).collect()
      .map(r => r.getAs[Long]("hr") -> r).toMap
    assert(out.nonEmpty)
    raw.map(_._3).distinct.foreach { hr =>
      val groups = byGroup.filter(_._1._1 == hr)
      val weak = groups.filter(_._2.map(_._1).distinct.size < 3)
      val homogeneous = groups.filter(_._2.map(_._1).distinct.size == 1)
      val r = out(hr)
      assert(r.getAs[Long]("n_groups") == groups.size.toLong, s"$hr groups")
      assert(r.getAs[Long]("n_homogeneous") == homogeneous.size.toLong,
        s"$hr homogeneous")
      assert(r.getAs[Long]("n_weak_groups") == weak.size.toLong, s"$hr weak")
      val nEvents = groups.values.map(_.length).sum.toLong
      val nWeakEvents = weak.values.map(_.length).sum.toLong
      assert(r.getAs[Long]("n_events") == nEvents)
      assert(r.getAs[Long]("n_events_weak") == nWeakEvents)
      assert(r.getAs[Long]("n_users_weak") ==
        weak.values.flatten.map(_._2).toSet.size.toLong, s"$hr users")
      assert(math.abs(r.getAs[Double]("weak_share") -
        nWeakEvents.toDouble / nEvents) < 1e-15)
    }
    // the l=3 cut subsumes the homogeneity count: every homogeneous
    // group is weak, on every hour row
    out.values.foreach { r =>
      assert(r.getAs[Long]("n_homogeneous") <=
        r.getAs[Long]("n_weak_groups"))
    }
    graft.Caches.unpersistAll()
  }
}
