package graft.ops

import java.sql.Timestamp

import graft.SparkTestBase

/** w49_rfm_segments: quintile-cut RFM scores, hand-computed on a
  * 5-customer ladder fixture.
  */
class RfmSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")

  test("w49: clean 5-customer ladder fills the diagonal cells") {
    // cust k has k orders of 100 each, latest order k-1 months before
    // the global max -> every dimension ranks 5,4,3,2,1 for custs
    // 5,4,3,2,1 and the cube is the exact diagonal
    val months = Seq("2024-05", "2024-04", "2024-03", "2024-02",
      "2024-01")
    val orders = (1 to 5).flatMap { k =>
      (1 to k).map(i =>
        (k.toLong, ts(s"${months(5 - k)}-0$i"), 100.0))
    }.toDF("o_custkey", "o_orderdate", "o_totalprice")
    val rows = RelOps.rfmOf(orders).collect()
    assert(rows.length == 5)
    val cells = rows.map(r => (r.getAs[Long]("r_score"),
      r.getAs[Long]("f_score"), r.getAs[Long]("m_score"),
      r.getAs[Long]("n_customers"), r.getAs[Double]("share"))).toSeq
    assert(cells == (1L to 5L).map(s => (s, s, s, 1L, 0.2)))
  }

  test("w49: all-tied dimension scores 1 everywhere (ties never beat " +
      "their own cut)") {
    val orders = (1 to 5).map(k =>
      (k.toLong, ts("2024-05-01"), 100.0))
      .toDF("o_custkey", "o_orderdate", "o_totalprice")
    val rows = RelOps.rfmOf(orders).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert((r.getAs[Long]("r_score"), r.getAs[Long]("f_score"),
      r.getAs[Long]("m_score")) == ((1L, 1L, 1L)))
    assert(r.getAs[Long]("n_customers") == 5L)
    assert(r.getAs[Double]("share") == 1.0)
  }

  test("w49: sf fixture — scores in 1..5, shares sum to 1, counts " +
      "reconcile with the customer population") {
    val rows = RelOps.w49RfmSegments(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      Seq("r_score", "f_score", "m_score").foreach { c =>
        val s = r.getAs[Long](c)
        assert(s >= 1L && s <= 5L)
      }
    }
    assert(math.abs(rows.map(_.getAs[Double]("share")).sum - 1.0) < 1e-9)
    val nCust = graft.Tables.orders(spark, sf0001)
      .select("o_custkey").distinct().count()
    assert(rows.map(_.getAs[Long]("n_customers")).sum == nCust)
  }
}
