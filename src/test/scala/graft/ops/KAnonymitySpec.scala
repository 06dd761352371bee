package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** w51_k_anonymity: the audit cross-checked against an independent
  * in-memory recomputation of quasi-groups on the sf0.001 events.
  */
class KAnonymitySpec extends SparkTestBase {

  test("w51: group counts, risk cut at k=5, and exposed-user counts " +
      "match an independent recomputation") {
    val raw = graft.Tables.events(spark, sf0001)
      .select(col("event_type"), col("user_id"),
        hour(col("ts")).cast("long").as("hr"),
        floor(col("value") / 10.0).cast("long").as("vb"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byGroup = raw.groupBy(e => (e._1, e._3, e._4))
    val out = RelOps.w51KAnonymity(spark, sf0001).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.nonEmpty)
    raw.map(_._1).distinct.foreach { et =>
      val groups = byGroup.filter(_._1._1 == et)
      val risky = groups.filter(_._2.map(_._2).distinct.size < 5)
      val r = out(et)
      assert(r.getAs[Long]("n_groups") == groups.size.toLong, s"$et groups")
      assert(r.getAs[Long]("n_risky_groups") == risky.size.toLong,
        s"$et risky")
      assert(r.getAs[Long]("n_events") ==
        groups.values.map(_.length).sum.toLong)
      val exposedEvents = risky.values.map(_.length).sum.toLong
      assert(r.getAs[Long]("n_events_exposed") == exposedEvents)
      val exposedUsers =
        risky.values.flatten.map(_._2).toSet.size.toLong
      assert(r.getAs[Long]("n_users_exposed") == exposedUsers, s"$et users")
      assert(math.abs(r.getAs[Double]("exposed_share") -
        exposedEvents.toDouble / groups.values.map(_.length).sum) < 1e-15)
    }
    graft.Caches.unpersistAll()
  }
}
