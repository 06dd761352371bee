package graft.ops

import graft.SparkTestBase

/** p27_budget_waterfill: max-min-fair token allocation under a global
  * budget, hand-computed on a 4-source frame.
  */
class WaterfillSpec extends SparkTestBase {
  import spark.implicits._

  private def fill(per: Seq[(String, Long)], num: Long, den: Long) =
    PipelineOps.budgetWaterfillOf(
      per.toDF("source", "n_tokens"), num, den)
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Double]("allocation"),
          r.getAs[Long]("capped"))).toMap

  test("p27: hand-computed threshold — small sources keep all, large " +
      "ones split the remainder") {
    // n = 10,20,40,50 total 120, budget 72: first feasible rank is 3
    // (cum 30 + 2*40 = 110 >= 72) -> T = (72-30)/2 = 21
    val by = fill(Seq(("a", 10L), ("b", 20L), ("c", 40L), ("d", 50L)),
      6L, 10L)
    assert(by("a") == ((10L, 10.0, 0L)))
    assert(by("b") == ((20L, 20.0, 0L)))
    assert(by("c") == ((40L, 21.0, 1L)))
    assert(by("d") == ((50L, 21.0, 1L)))
    assert(by.values.map(_._2).sum == 72.0) // allocations exhaust budget
  }

  test("p27: budget >= total degenerates to no cap") {
    val by = fill(Seq(("a", 10L), ("b", 30L)), 1L, 1L)
    assert(by("a") == ((10L, 10.0, 0L)))
    assert(by("b") == ((30L, 30.0, 0L)))
  }

  test("p27: equal sources all cap at budget/n") {
    // 4 x 100 tokens, budget 200 -> T = 50, everyone capped
    val by = fill(Seq(("a", 100L), ("b", 100L), ("c", 100L),
      ("d", 100L)), 5L, 10L)
    assert(by.values.forall(_ == ((100L, 50.0, 1L))))
  }

  test("p27: sf fixture — allocations exhaust the budget and never " +
      "exceed the source") {
    val rows = PipelineOps.p27BudgetWaterfill(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val budget = rows.head.getAs[Long]("budget")
    val allocs = rows.map(_.getAs[Double]("allocation"))
    assert(math.abs(allocs.sum - budget) < 1e-6)
    rows.foreach { r =>
      assert(r.getAs[Double]("allocation") <=
        r.getAs[Long]("n_tokens").toDouble)
    }
  }
}
