package graft.streaming

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** cohortLtvTws: accumulated (cohort, age) deltas fold to EXACTLY the
  * batch w48 cohort-LTV triangle.
  */
class CohortLtvTwsSpec extends SparkTestBase {
  import spark.implicits._

  test("cohortLtvTws: accumulated deltas fold to the exact batch w48 " +
      "board across a month-ordered micro-batch split") {
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try {
      val evs = LtvJobs.orderEvents(Tables.orders(spark, sf0001))
        .collect().sortBy(_.month_idx)
      // split at a month boundary: the ordering contract (per-customer
      // month order) holds for any global month-sorted split
      val cut = evs.map(_.month_idx).distinct.sorted
        .apply(evs.map(_.month_idx).distinct.length / 2)
      val b1 = evs.filter(_.month_idx < cut)
      val b2 = evs.filter(_.month_idx >= cut)
      assert(b1.nonEmpty && b2.nonEmpty)
      val mem = MemoryStream[OrderEvent]
      val q = LtvJobs.cohortLtvTws(mem.toDS())
        .writeStream.format("memory").queryName("ltv_deltas")
        .outputMode("update").start()
      mem.addData(b1.toIndexedSeq)
      q.processAllAvailable()
      mem.addData(b2.toIndexedSeq)
      q.processAllAvailable(); q.stop()
      val deltas = spark.table("ltv_deltas")
      // one delta per order, active deltas unique per (customer-cell)
      assert(deltas.count() == evs.length.toLong)
      val board = LtvJobs.cohortLtvBoard(deltas).collect()
        .map(_.toSeq).toSeq
      val batch = graft.ops.RelOps.w48CohortLtv(spark, sf0001).collect()
        .map(_.toSeq).toSeq
      assert(board == batch,
        s"streaming board != batch w48 (${board.size} vs ${batch.size})")
      assert(batch.nonEmpty)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
      graft.Caches.unpersistAll()
    }
  }
}
