package graft.ops

import graft.SparkTestBase

/** s31_rank_quality: MRR + linear-discount nDCG against a planted
  * exact/approximate ranking pair.
  */
class RankQualitySpec extends SparkTestBase {
  import spark.implicits._

  test("s31: hand-computed rr and ndcg on planted placements") {
    // query 0: exact top-3 = a,b,c; ann returns b@1 (hit), x@2 (miss),
    // a@3 (hit). first_hit=1 -> rr=1; dcg = 27720/2 + 27720/4 = 20790;
    // idcg (n_exact=3, all ranks<=5) = 13860+9240+6930 = 30030
    val exact = Seq(
      (0L, 100L, 1L), (0L, 101L, 2L), (0L, 102L, 3L))
      .toDF("qid", "neighbor_id", "exact_rank")
    val ann = Seq(
      (0L, 101L, 1L), (0L, 999L, 2L), (0L, 100L, 3L))
      .toDF("qid", "neighbor_id", "ann_rank")
    val r = SimOps.rankQualityOf(exact, ann).head()
    assert(r.getAs[Long]("n_exact") == 3L)
    assert(r.getAs[Long]("n_hits") == 2L)
    assert(r.getAs[Long]("first_hit_rank") == 1L)
    assert(r.getAs[Double]("rr") == 1.0)
    assert(r.getAs[Double]("ndcg_lin") == 20790.0 / 30030.0)
  }

  test("s31: a query the ann misses entirely keeps a zero row") {
    val exact = Seq((7L, 50L, 1L), (7L, 51L, 2L))
      .toDF("qid", "neighbor_id", "exact_rank")
    val ann = Seq((7L, 999L, 1L)).toDF("qid", "neighbor_id", "ann_rank")
    val r = SimOps.rankQualityOf(exact, ann).head()
    assert(r.getAs[Long]("n_hits") == 0L)
    assert(r.getAs[Any]("first_hit_rank") == null)
    assert(r.getAs[Double]("rr") == 0.0)
    assert(r.getAs[Double]("ndcg_lin") == 0.0)
  }

  test("s31: perfect agreement scores 1.0 on both metrics") {
    val exact = Seq((1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L),
      (1L, 13L, 4L), (1L, 14L, 5L))
      .toDF("qid", "neighbor_id", "exact_rank")
    val ann = exact.withColumnRenamed("exact_rank", "ann_rank")
    val r = SimOps.rankQualityOf(exact, ann).head()
    assert(r.getAs[Double]("rr") == 1.0)
    assert(r.getAs[Double]("ndcg_lin") == 1.0)
  }

  test("s31: sf fixture — metrics bounded, spine is the exact query " +
      "set, rr consistent with first_hit_rank") {
    val rows = SimOps.s31RankQuality(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val rr = r.getAs[Double]("rr")
      val nd = r.getAs[Double]("ndcg_lin")
      assert(rr >= 0.0 && rr <= 1.0)
      assert(nd >= 0.0 && nd <= 1.0)
      val fh = r.getAs[Any]("first_hit_rank")
      if (fh == null) assert(rr == 0.0)
      else assert(rr == 1.0 / fh.asInstanceOf[Long])
    }
  }
}
