package graft.ops

import graft.SparkTestBase

/** s32_label_outliers: own-centroid cosine bottom-k per label, with a
  * planted flipped vector surfacing as the rank-1 outlier.
  */
class LabelOutliersSpec extends SparkTestBase {
  import spark.implicits._

  test("s32: planted flipped vector is the rank-1 outlier of its label") {
    // label 1: two e1-aligned members + one FLIPPED (id 99); label 2:
    // two identical members (both cosine exactly 1 to their centroid)
    val emb = Seq(
      (1L, Seq(1.0f, 0.0f), 1),
      (2L, Seq(1.0f, 0.1f), 1),
      (99L, Seq(-1.0f, 0.0f), 1),
      (10L, Seq(0.0f, 2.0f), 2),
      (11L, Seq(0.0f, 2.0f), 2)
    ).toDF("vec_id", "embedding", "label")
    val rows = SimOps.labelOutliersOf(spark, emb).collect()
    val l1 = rows.filter(_.getAs[Long]("label") == 1L)
    assert(l1.length == 3)
    val worst = l1.find(_.getAs[Long]("rank") == 1L).get
    assert(worst.getAs[Long]("vec_id") == 99L)
    assert(worst.getAs[Double]("ccos") < 0.0)
    // ranks ascend with cosine within the label
    val cs = l1.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("ccos"))
    assert(cs.zip(cs.tail).forall { case (a, b) => a <= b })
    // identical members: cosine exactly 1, tie broken by vec_id
    val l2 = rows.filter(_.getAs[Long]("label") == 2L)
      .sortBy(_.getAs[Long]("rank"))
    assert(l2.map(_.getAs[Double]("ccos")).forall(_ == 1.0))
    assert(l2.map(_.getAs[Long]("vec_id")).toSeq == Seq(10L, 11L))
  }

  test("s32: sf fixture — 3 rows per label, ccos in [-1, 1], ranks 1..3") {
    val rows = SimOps.s32LabelOutliers(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("label")).foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Long]("rank")).sorted.toSeq == Seq(1L, 2L, 3L))
      rs.foreach { r =>
        val c = r.getAs[Double]("ccos")
        assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9)
      }
    }
  }
}
