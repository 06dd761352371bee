package graft.sources

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** Bucketing: both-sides-bucketed equi-join runs with ZERO shuffle
  * exchanges and matches the unbucketed join's result exactly.
  */
class BucketingSpec extends SparkTestBase {

  test("bucketed-by-key join plans without exchanges; values identical") {
    val threshold = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(threshold)
    // force the SMJ path: broadcast would hide the shuffle either way
    spark.conf.set(threshold, "-1")
    try {
      val orders = Tables.orders(spark, sf0001)
        .select(col("o_custkey").as("custkey"), col("o_orderkey"),
          col("o_totalprice"))
      val customer = Tables.customer(spark, sf0001)
        .select(col("c_custkey").as("custkey"), col("c_name"))
      Bucketing.writeBucketed(orders, "b_orders", "custkey", 8)
      Bucketing.writeBucketed(customer, "b_customer", "custkey", 8)

      val colocated =
        Bucketing.colocatedJoin(spark, "b_orders", "b_customer", "custkey")
      val baseline = orders.join(customer, Seq("custkey"))

      // the contract: zero exchanges bucketed, at least one unbucketed.
      // shuffleCount EXECUTES the stages under AQE (documented side
      // effect); the collect()s below reuse the same QueryExecution's
      // cached stages, so nothing runs twice here.
      assert(Bucketing.shuffleCount(colocated) == 0,
        s"bucketed join still shuffles:\n" +
          colocated.queryExecution.executedPlan.toString().take(2000))
      assert(Bucketing.shuffleCount(baseline) >= 1)

      val got = colocated.collect()
        .map(r => (r.getAs[Long]("custkey"), r.getAs[Long]("o_orderkey"),
          r.getAs[String]("c_name"))).sortBy(t => (t._1, t._2)).toSeq
      val want = baseline.collect()
        .map(r => (r.getAs[Long]("custkey"), r.getAs[Long]("o_orderkey"),
          r.getAs[String]("c_name"))).sortBy(t => (t._1, t._2)).toSeq
      assert(got == want && got.nonEmpty)
    } finally {
      spark.conf.set(threshold, prev)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }

  test("bucketed aggregation on the bucket key also skips the exchange") {
    val orders = Tables.orders(spark, sf0001)
      .select(col("o_custkey").as("custkey"), col("o_totalprice"))
    Bucketing.writeBucketed(orders, "b_orders_agg", "custkey", 8)
    try {
      val agg = spark.table("b_orders_agg")
        .groupBy("custkey").agg(count(lit(1)).as("n"))
      assert(Bucketing.shuffleCount(agg) == 0,
        agg.queryExecution.executedPlan.toString().take(2000))
      // and the counts are right
      val want = orders.groupBy("custkey").count().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      agg.collect().foreach(r =>
        assert(want(r.getAs[Long]("custkey")) == r.getAs[Long]("n")))
    } finally spark.sql("DROP TABLE IF EXISTS b_orders_agg")
  }
}
