package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** s23_coverage_gaps: the planted uncovered outlier surfaces first. */
class CoverageGapsSpec extends SparkTestBase {
  import spark.implicits._

  test("s23: the orthogonal outlier is the top coverage gap") {
    graft.functions.GraftFunctions.register(spark)
    // Two clean cells on axes 0/1; vec 9 sits on axis 2 — far from
    // BOTH centroids (cos ~0 to each), so it must rank first; cluster
    // members (cos ~1) fill the rest.
    val v = Seq(
      (1L, Seq(10L, 0L, 0L), 0), (2L, Seq(10L, 1L, 0L), 0),
      (3L, Seq(0L, 10L, 0L), 1), (4L, Seq(1L, 10L, 0L), 1),
      (9L, Seq(0L, 0L, 10L), 0) // mis-covered outlier (label irrelevant)
    ).toDF("vec_id", "qv", "label")
      .withColumn("vnorm", expr("graft_long_dot(qv, qv)"))
    val rows = SimOps.coverageGaps(v, 3).collect()
    assert(rows.length == 3)
    assert(rows.head.getAs[Long]("vec_id") == 9L)
    // the outlier drags its own seed centroid toward itself (cell0 ~
    // [7,0,3]), so its best cosine is ~0.39, not 0 — still far below
    // every genuine member (>= 0.91)
    val topCos = rows.head.getAs[Double]("best_cos")
    assert(topCos < 0.5, s"outlier best_cos $topCos not a gap")
    assert(rows.tail.forall(_.getAs[Double]("best_cos") > 0.9))
  }
}
