package graft.ops

import graft.SparkTestBase

/** w47_market_basket: canonical pair counts, support/confidence/lift,
  * hand-computed on a four-basket fixture.
  */
class MarketBasketSpec extends SparkTestBase {
  import spark.implicits._

  private def fixture = Seq(
    // order 1: {10, 20, 30}; order 2: {10, 20}; order 3: {10, 40} with
    // part 10 listed TWICE (must count once); order 4: {20}
    (1L, 10L), (1L, 20L), (1L, 30L),
    (2L, 10L), (2L, 20L),
    (3L, 10L), (3L, 10L), (3L, 40L),
    (4L, 20L)
  ).toDF("l_orderkey", "l_partkey")

  test("w47: hand-computed pair counts, duplicate line counted once") {
    val rows = RelOps.marketBasketOf(fixture).collect()
    // pairs: (10,20)x2, then ties at 1 ordered (10,30), (10,40), (20,30)
    assert(rows.map(r => (r.getAs[Long]("part_a"), r.getAs[Long]("part_b")))
      .toSeq == Seq((10L, 20L), (10L, 30L), (10L, 40L), (20L, 30L)))
    val top = rows.head
    assert(top.getAs[Long]("n_co") == 2L)
    assert(top.getAs[Long]("n_a") == 3L)     // dup line in order 3 deduped
    assert(top.getAs[Long]("n_b") == 3L)
    assert(top.getAs[Long]("n_orders") == 4L)
    assert(top.getAs[Double]("support") == 2.0 / 4)
    assert(top.getAs[Double]("confidence") == 2.0 / 3)
    assert(top.getAs[Double]("lift") == 8.0 / 9)
  }

  test("w47: sf fixture — canonical pairs, bounded ratios, sorted") {
    val rows = RelOps.w47MarketBasket(spark, sf0001).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      assert(r.getAs[Long]("part_a") < r.getAs[Long]("part_b"))
      val co = r.getAs[Long]("n_co")
      assert(co <= r.getAs[Long]("n_a") && co <= r.getAs[Long]("n_b"))
      val s = r.getAs[Double]("support")
      assert(s > 0.0 && s <= 1.0)
      val c = r.getAs[Double]("confidence")
      assert(c > 0.0 && c <= 1.0)
      assert(r.getAs[Double]("lift") > 0.0)
    }
    val counts = rows.map(_.getAs[Long]("n_co"))
    assert(counts.sameElements(counts.sortBy(-_)))
  }
}
