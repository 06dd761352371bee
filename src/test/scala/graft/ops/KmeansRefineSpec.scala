package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** s22_kmeans_refine: one Lloyd iteration. Plants two tight clusters
  * with one mislabeled vector and hand-computes the move and the
  * integer centroid shifts.
  */
class KmeansRefineSpec extends SparkTestBase {
  import spark.implicits._

  private def planted = {
    graft.functions.GraftFunctions.register(spark)
    // label 0: [10,0,0,0], [8,0,0,0]; label 1: [0,10,0,0] x2 plus the
    // MISLABELED [7,3,0,0] (geometrically cluster 0).
    Seq(
      (1L, Seq(10L, 0L, 0L, 0L), 0),
      (2L, Seq(8L, 0L, 0L, 0L), 0),
      (3L, Seq(0L, 10L, 0L, 0L), 1),
      (4L, Seq(0L, 10L, 0L, 0L), 1),
      (5L, Seq(7L, 3L, 0L, 0L), 1)
    ).toDF("vec_id", "qv", "label")
      .withColumn("vnorm", expr("graft_long_dot(qv, qv)"))
  }

  test("s22: mislabeled vector moves; shifts hand-computed") {
    // Seed centroids: cell0 = [9,0,0,0]; cell1 = round-mean of three =
    // [2,8,0,0]. Assignment: vec5 cos(cell0)=63/(sqrt(58)*9)=0.92 >
    // cos(cell1)=38/(sqrt(58)*sqrt(68))=0.60 -> moves to 0; others stay.
    // New centroids: cell0 = round-mean([10,0],[8,0],[7,3]) = [8,1,0,0]
    // -> l1 |8-9|+|1-0| = 2; cell1 = [0,10,0,0] -> l1 |0-2|+|10-8| = 4.
    val rows = SimOps.kmeansRefine(planted).collect()
    assert(rows.length == 2)
    val byCell = rows.map(r => r.getAs[Long]("cell") -> r).toMap
    val c0 = byCell(0L)
    assert(c0.getAs[Long]("n_before") == 2L)
    assert(c0.getAs[Long]("n_after") == 3L)
    assert(c0.getAs[Long]("n_moved_in") == 1L)
    assert(c0.getAs[Long]("l1_shift") == 2L)
    val c1 = byCell(1L)
    assert(c1.getAs[Long]("n_before") == 3L)
    assert(c1.getAs[Long]("n_after") == 2L)
    assert(c1.getAs[Long]("n_moved_in") == 0L)
    assert(c1.getAs[Long]("l1_shift") == 4L)
  }

  test("s22: a fixpoint corpus reports zero movement and zero shift") {
    // Well-separated, correctly labeled: the iteration is a no-op and
    // the report says so (the convergence signal a Lloyd loop reads).
    graft.functions.GraftFunctions.register(spark)
    val v = Seq(
      (1L, Seq(10L, 0L), 0), (2L, Seq(10L, 0L), 0),
      (3L, Seq(0L, 10L), 1), (4L, Seq(0L, 10L), 1)
    ).toDF("vec_id", "qv", "label")
      .withColumn("vnorm", expr("graft_long_dot(qv, qv)"))
    val rows = SimOps.kmeansRefine(v).collect()
    assert(rows.forall(_.getAs[Long]("n_moved_in") == 0L))
    assert(rows.forall(_.getAs[Long]("l1_shift") == 0L))
    assert(rows.forall(r =>
      r.getAs[Long]("n_before") == r.getAs[Long]("n_after")))
  }
}
