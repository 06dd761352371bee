package graft.ops

import graft.SparkTestBase

/** p20_training_order: the composed p19 x p15 manifest — positions are
  * a bijection, copies hash independently, and the order is stable.
  */
class TrainingOrderSpec extends SparkTestBase {

  test("p20: positions are a bijection over the upsampled rows") {
    val rows = PipelineOps.p20TrainingOrder(spark, sf0001).collect()
    val n = PipelineOps.p19UpsampleAssign(spark, sf0001).count()
    assert(rows.length.toLong == n)
    val pos = rows.map(_.getAs[Long]("pos")).sorted
    assert(pos.toSeq == (0L until n).toSeq, "positions not 0..N-1")
  }

  test("p20: a doc's copies land at independent positions (scatter)") {
    val rows = PipelineOps.p20TrainingOrder(spark, sf0001).collect()
    val n = rows.length.toLong
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
      .filter(_._2.length >= 3) // capped languages: 3-4 copies
    assert(byDoc.nonEmpty, "fixture has no upsampled docs")
    // copies clumping adjacently for EVERY multi-copy doc would mean
    // the hash ignored copy_id; with independent hashes the expected
    // spread is ~N/k, so require at least one doc whose copies span
    // more than a quarter of the epoch
    val spread = byDoc.values.map { copies =>
      val ps = copies.map(_.getAs[Long]("pos"))
      ps.max - ps.min
    }
    assert(spread.exists(_ > n / 4), s"all copy spreads tiny: $spread")
  }

  test("p20: deterministic across runs") {
    val a = PipelineOps.p20TrainingOrder(spark, sf0001).collect().toSeq
    val b = PipelineOps.p20TrainingOrder(spark, sf0001).collect().toSeq
    assert(a == b)
  }
}
