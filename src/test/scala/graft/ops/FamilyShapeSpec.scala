package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** d22_family_shape: the family-granularity template-farm vs edit-chain
  * classifier. Hand-checks the three canonical shapes and cross-checks
  * real-fixture labels against d17.
  */
class FamilyShapeSpec extends SparkTestBase {
  import spark.implicits._

  test("d22: clique, chain-with-core, and pair classify correctly") {
    // component 1: triangle {1,2,3} + tail 3-4-5 (n=5, m=5, not clique)
    // component 10: 4-clique (n=4, m=6, clique)
    // component 20: bare pair (n=2, m=1, trivially a clique)
    val pairs = Seq(
      1L -> 2L, 2L -> 3L, 1L -> 3L, 3L -> 4L, 4L -> 5L,
      10L -> 11L, 10L -> 12L, 10L -> 13L, 11L -> 12L, 11L -> 13L,
      12L -> 13L,
      20L -> 21L
    ).toDF("doc_a", "doc_b")
    val labels = Seq(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L,
      20L -> 20L, 21L -> 20L
    ).toDF("doc_id", "component")
    val m = DedupOps.familyShapeOf(labels, pairs).collect()
      .map(r => r.getAs[Long]("component") ->
        ((r.getAs[Long]("n_members"), r.getAs[Long]("n_edges"),
          r.getAs[Long]("is_clique"), r.getAs[Double]("density")))).toMap
    assert(m(1L) == ((5L, 5L, 0L, 0.5)))
    assert(m(10L) == ((4L, 6L, 1L, 1.0)))
    assert(m(20L) == ((2L, 1L, 1L, 1.0)))
  }

  test("d22: fixture families account for every pair-graph node and edge") {
    val rows = DedupOps.d22FamilyShape(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val pairs = DedupOps.pairGraph(spark, sf0001)
    assert(rows.map(_.getAs[Long]("n_edges")).sum == pairs.count())
    val nNodes = pairs.select(explode(array(col("doc_a"), col("doc_b"))))
      .distinct().count()
    assert(rows.map(_.getAs[Long]("n_members")).sum == nNodes)
    rows.foreach { r =>
      val d = r.getAs[Double]("density")
      assert(d > 0.0 && d <= 1.0)
      assert((r.getAs[Long]("is_clique") == 1L) == (d == 1.0))
    }
  }
}
