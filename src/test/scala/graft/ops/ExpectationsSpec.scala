package graft.ops

import java.sql.Timestamp

import graft.SparkTestBase

/** p30_expectations: data-quality gate with null-affirming range
  * checks, key uniqueness and referential integrity, hand-computed
  * on planted violations.
  */
class ExpectationsSpec extends SparkTestBase {
  import spark.implicits._

  private val ts = Timestamp.valueOf("2024-01-01 00:00:00")

  test("p30: planted violations land in the right checks") {
    // lineitem: 4 rows — one zero quantity, one NULL discount (range
    // check must flag the NULL), one NULL shipdate, one duplicate pk
    val l = Seq(
      (1L, 1, Some(0.0), Some(0.1), Some(ts)),   // quantity violation
      (1L, 2, Some(5.0), None, Some(ts)),        // NULL discount -> bad
      (2L, 1, Some(5.0), Some(0.2), None),       // NULL shipdate
      (2L, 1, Some(5.0), Some(0.2), Some(ts))    // duplicate (2, 1)
    ).toDF("l_orderkey", "l_linenumber", "l_quantity", "l_discount",
      "l_shipdate")
    // orders: one negative price, one dangling custkey
    val o = Seq((10L, 1L, 100.0), (11L, 99L, -5.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
    val c = Seq((1L, "alice")).toDF("c_custkey", "c_name")
    val rows = PipelineOps.expectationsOf(l, o, c).collect()
    assert(rows.length == 6)
    def chk(name: String) =
      rows.find(_.getAs[String]("check") == name).get
    val q = chk("lineitem.quantity_positive")
    assert(q.getAs[Long]("n_rows") == 4L)
    assert(q.getAs[Long]("n_violations") == 1L)
    assert(q.getAs[Long]("pass") == 0L)
    assert(q.getAs[Double]("violation_share") == 0.25)
    assert(chk("lineitem.discount_in_unit_range")
      .getAs[Long]("n_violations") == 1L) // the NULL counts
    assert(chk("lineitem.shipdate_not_null")
      .getAs[Long]("n_violations") == 1L)
    val pk = chk("lineitem.pk_unique")
    assert(pk.getAs[Long]("n_violations") == 1L) // 2nd copy of (2,1)
    assert(chk("orders.totalprice_positive")
      .getAs[Long]("n_violations") == 1L)
    val ri = chk("orders.custkey_resolves")
    assert(ri.getAs[Long]("n_violations") == 1L) // custkey 99 dangles
    assert(ri.getAs[Long]("n_rows") == 2L)
  }

  test("p30: clean tables pass every check") {
    val l = Seq((1L, 1, Some(2.0), Some(0.1), Some(ts)))
      .toDF("l_orderkey", "l_linenumber", "l_quantity", "l_discount",
        "l_shipdate")
    val o = Seq((10L, 1L, 100.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
    val c = Seq((1L, "alice")).toDF("c_custkey", "c_name")
    val rows = PipelineOps.expectationsOf(l, o, c).collect()
    assert(rows.forall(_.getAs[Long]("pass") == 1L))
    assert(rows.forall(_.getAs[Double]("violation_share") == 0.0))
  }

  test("p30: sf fixture — the synthetic tables are clean by contract") {
    val rows = PipelineOps.p30Expectations(spark, sf0001).collect()
    assert(rows.length == 6)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_violations") ==
        math.round(r.getAs[Double]("violation_share") *
          r.getAs[Long]("n_rows")))
      assert((r.getAs[Long]("pass") == 1L) ==
        (r.getAs[Long]("n_violations") == 0L))
    }
  }
}
