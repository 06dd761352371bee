package graft.ops

import graft.SparkTestBase

/** s36_prototypicality: the D4 head-cut on a planted geometry — the
  * exact member of each cluster sitting ON the centroid ranks first
  * and is dropped; the 10% cut is exact-integer.
  */
class PrototypicalitySpec extends SparkTestBase {
  import spark.implicits._

  test("s36: within each label the centroid-nearest member ranks 1 " +
      "and the 10% cut drops exactly floor(n/10) heads") {
    // 10 clusters x 20 members, label = cluster — cut drops rank 1-2
    val vecs = graft.PlantedVectors.corpus(200, 10)
    val emb = vecs.map { case (id, e) => (id, e, id / 20) }
      .toDF("vec_id", "embedding", "label")
    val out = SimOps.prototypicalityOf(spark, emb).collect()
    assert(out.length == 200)
    val byLabel = out.groupBy(_.getAs[Long]("label"))
    assert(byLabel.keySet == (0L until 10L).toSet)
    byLabel.foreach { case (l, rows) =>
      assert(rows.length == 20)
      assert(rows.forall(_.getAs[Long]("n_label") == 20L))
      // ranks are a 1..20 bijection ordered by (ccos desc, vec_id)
      val byRank = rows.sortBy(_.getAs[Long]("proto_rank"))
      assert(byRank.map(_.getAs[Long]("proto_rank")).toSeq ==
        (1L to 20L))
      val cs = byRank.map(_.getAs[Double]("ccos"))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b }, s"label $l")
      // exactly 2 dropped (20/10), and they are ranks 1 and 2
      val dropped = rows.filter(_.getAs[Long]("dropped") == 1L)
      assert(dropped.length == 2, s"label $l dropped ${dropped.length}")
      assert(dropped.map(_.getAs[Long]("proto_rank")).toSet == Set(1L, 2L))
    }
    graft.Caches.unpersistAll()
  }
}
