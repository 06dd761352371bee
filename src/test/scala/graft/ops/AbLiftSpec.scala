package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** w37_ab_lift: arm counts reconcile with independent funnel tallies. */
class AbLiftSpec extends SparkTestBase {

  test("w37: arm splits reconcile with w26 and rates are consistent") {
    val r = RelOps.w37AbLift(spark, sf0001).collect().head
    val f = RelOps.w26Funnel(spark, sf0001)
      .select(col("user_id"), col("t_view"), col("stage_reached"))
      .collect()
    def arm(p: Long) = f.filter(_.getAs[Long]("user_id") % 2 == p)
    val expA = arm(0).count(!_.isNullAt(1)).toLong
    val cvA = arm(0).count(_.getAs[Long]("stage_reached") == 3L).toLong
    val expB = arm(1).count(!_.isNullAt(1)).toLong
    val cvB = arm(1).count(_.getAs[Long]("stage_reached") == 3L).toLong
    assert(r.getAs[Long]("exposed_a") == expA)
    assert(r.getAs[Long]("converted_a") == cvA)
    assert(r.getAs[Long]("exposed_b") == expB)
    assert(r.getAs[Long]("converted_b") == cvB)
    assert(cvA <= expA && cvB <= expB)
    if (expA > 0) assert(r.getAs[Double]("cvr_a") == cvA.toDouble / expA)
    if (r.getAs[Any]("cvr_a") != null && r.getAs[Double]("cvr_a") > 0)
      assert(r.getAs[Double]("lift") ==
        r.getAs[Double]("cvr_b") / r.getAs[Double]("cvr_a"))
  }
}
