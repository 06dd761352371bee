package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** s27_pq_train: one per-subspace Lloyd step, hand-computed on vectors
  * that are constant within every 8-dim subspace (so each subspace's
  * arithmetic reduces to one scalar).
  */
class PqTrainSpec extends SparkTestBase {
  import spark.implicits._

  // 64-dim vector holding value `x` in every dim
  private def flat(x: Long): Seq[Long] = Seq.fill(64)(x)

  private def planted = {
    graft.functions.GraftFunctions.register(spark)
    // label 0: values 10, 8 -> seed sub-centroid 9 per dim.
    // label 1: values 0, 2 and the MISPLACED 7 -> seed 3 per dim.
    Seq(
      (1L, flat(10L), 0), (2L, flat(8L), 0),
      (3L, flat(0L), 1), (4L, flat(2L), 1), (5L, flat(7L), 1)
    ).toDF("vec_id", "qv", "label")
  }

  test("s27: misplaced vector re-assigns in every subspace; " +
    "shifts hand-computed") {
    // Per subspace (distances are 8x the scalar squares):
    //   vec5 (7): d(code0=9) = 8*4, d(code1=3) = 8*16 -> joins code 0.
    //   vecs 1,2 stay (1 < 49, 1 < 25); vecs 3,4 stay (81 > 9, 49 > 1).
    // New code0 = round(25/3) = 8 per dim -> l1 = 8*|8-9| = 8.
    // New code1 = (0+2)/2 = 1 per dim -> l1 = 8*|1-3| = 16.
    val rows = SimOps.pqTrainStep(spark, planted).collect()
    assert(rows.length == 16) // 8 subspaces x 2 codes
    rows.foreach { r =>
      val (code, nSeed, nAsg, nMoved, l1) =
        (r.getAs[Long]("code"), r.getAs[Long]("n_seed"),
          r.getAs[Long]("n_assigned"), r.getAs[Long]("n_moved"),
          r.getAs[Long]("l1_shift"))
      if (code == 0L)
        assert((nSeed, nAsg, nMoved, l1) == ((2L, 3L, 1L, 8L)))
      else
        assert((nSeed, nAsg, nMoved, l1) == ((3L, 2L, 0L, 16L)))
    }
    // every (subspace, code) cell present exactly once
    assert(rows.map(r => (r.getAs[Long]("subspace"), r.getAs[Long]("code")))
      .toSet.size == 16)
  }

  test("s27: a fixpoint codebook reports zero movement and zero shift") {
    graft.functions.GraftFunctions.register(spark)
    val v = Seq(
      (1L, flat(10L), 0), (2L, flat(10L), 0),
      (3L, flat(0L), 1), (4L, flat(0L), 1)
    ).toDF("vec_id", "qv", "label")
    val rows = SimOps.pqTrainStep(spark, v).collect()
    assert(rows.length == 16)
    assert(rows.forall(_.getAs[Long]("n_moved") == 0L))
    assert(rows.forall(_.getAs[Long]("l1_shift") == 0L))
    assert(rows.forall(r =>
      r.getAs[Long]("n_assigned") == r.getAs[Long]("n_seed")))
  }
}
