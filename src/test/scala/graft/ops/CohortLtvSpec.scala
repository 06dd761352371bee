package graft.ops

import java.sql.Timestamp

import graft.SparkTestBase

/** w48_cohort_ltv: cohort revenue triangle with zero-filled ages and
  * decimal-exact cumulative LTV, hand-computed on a 3-customer fixture.
  */
class CohortLtvSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")

  private def fixture = Seq(
    (1L, ts("2024-01-15"), 100.0),
    (1L, ts("2024-03-10"), 50.0),
    (2L, ts("2024-01-20"), 200.0),
    (3L, ts("2024-02-05"), 10.0)
  ).toDF("o_custkey", "o_orderdate", "o_totalprice")

  test("w48: hand-computed triangle — zero month kept, cum carries") {
    val rows = RelOps.cohortLtvOf(fixture).collect()
    // cohort 2024-01 ages 0..2 + cohort 2024-02 ages 0..1
    assert(rows.length == 5)
    def cell(cm: String, age: Long) = rows.find(r =>
      r.getAs[java.sql.Date]("cohort_month").toString == cm &&
        r.getAs[Long]("age_months") == age).get
    val jan0 = cell("2024-01-01", 0L)
    assert(jan0.getAs[Long]("n_orders") == 2L)
    assert(jan0.getAs[Long]("n_active") == 2L)
    assert(jan0.getAs[Double]("revenue") == 300.0)
    assert(jan0.getAs[Double]("cum_revenue") == 300.0)
    assert(jan0.getAs[Long]("cohort_size") == 2L)
    assert(jan0.getAs[Double]("ltv_per_customer") == 150.0)
    val jan1 = cell("2024-01-01", 1L) // the quiet month is a real cell
    assert(jan1.getAs[Long]("n_orders") == 0L)
    assert(jan1.getAs[Double]("revenue") == 0.0)
    assert(jan1.getAs[Double]("cum_revenue") == 300.0)
    assert(jan1.getAs[Double]("ltv_per_customer") == 150.0)
    val jan2 = cell("2024-01-01", 2L)
    assert(jan2.getAs[Long]("n_orders") == 1L)
    assert(jan2.getAs[Long]("n_active") == 1L)
    assert(jan2.getAs[Double]("cum_revenue") == 350.0)
    assert(jan2.getAs[Double]("ltv_per_customer") == 175.0)
    val feb1 = cell("2024-02-01", 1L)
    assert(feb1.getAs[Long]("cohort_size") == 1L)
    assert(feb1.getAs[Double]("cum_revenue") == 10.0)
  }

  test("w48: sf fixture — spine complete, cum monotone, totals reconcile") {
    val rows = RelOps.w48CohortLtv(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val byCohort = rows.groupBy(_.getAs[java.sql.Date]("cohort_month"))
    byCohort.foreach { case (_, cells) =>
      val ages = cells.map(_.getAs[Long]("age_months")).sorted
      assert(ages.sameElements(0L to ages.max)) // gap-free spine
      val cums = cells.sortBy(_.getAs[Long]("age_months"))
        .map(_.getAs[Double]("cum_revenue"))
      assert(cums.zip(cums.tail).forall { case (a, b) => b >= a })
    }
    // revenue totals reconcile with the raw orders sum
    val raw = graft.Tables.orders(spark, sf0001)
      .agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.col("o_totalprice")
          .cast(org.apache.spark.sql.types.DecimalType(28, 4))))
      .head().getDecimal(0).doubleValue()
    val got = rows.map(_.getAs[Double]("revenue")).sum
    assert(math.abs(got - raw) < 1e-6 * math.max(1.0, raw))
  }
}
