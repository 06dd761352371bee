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

  test("cohortLtvTws: cohort-assignment state survives a checkpointed " +
      "restart — a fresh query re-uses first-order months, board == batch") {
    // The cohort a customer belongs to lives ONLY in state (its
    // first-order month). Feed the months before the cut to query
    // instance 1, stop it, feed the rest to a FRESH instance on the
    // same checkpoint: reset state would re-cohort every pre-cut
    // customer at its first post-cut month, shifting its deltas to the
    // wrong triangle cells — so board == batch IS the survival proof.
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    val tmp = java.nio.file.Files.createTempDirectory("graft_ltv_restart")
    try {
      val in = s"$tmp/in"; val out = s"$tmp/out"; val cp = s"$tmp/cp"
      val evs = LtvJobs.orderEvents(Tables.orders(spark, sf0001))
        .collect().sortBy(_.month_idx)
      val cut = evs.map(_.month_idx).distinct.sorted
        .apply(evs.map(_.month_idx).distinct.length / 2)
      val sch = implicitly[org.apache.spark.sql.Encoder[OrderEvent]].schema
      def feed(rows: Seq[OrderEvent]): Unit =
        spark.createDataset(rows.toIndexedSeq).toDF()
          .coalesce(1).write.mode("append").parquet(in)
      def drain(): Unit = {
        val q = LtvJobs.cohortLtvTws(
            spark.readStream.schema(sch).parquet(in).as[OrderEvent])
          .writeStream
          .foreachBatch(
            (b: org.apache.spark.sql.Dataset[LtvDelta], _: Long) => {
              b.write.mode("append").parquet(out); ()
            })
          .outputMode("update")
          .option("checkpointLocation", cp)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      // NOTE: the twin's ordering contract (per-customer month order)
      // holds because the files land in month order and the file
      // source replays them in discovery order
      feed(evs.filter(_.month_idx < cut).toSeq); drain()
      feed(evs.filter(_.month_idx >= cut).toSeq); drain() // fresh query
      val deltas = spark.read.parquet(out)
      assert(deltas.count() == evs.length.toLong,
        "one delta per order, across both query instances")
      val board = LtvJobs.cohortLtvBoard(deltas).collect()
        .map(_.toSeq).toSeq
      val batch = graft.ops.RelOps.w48CohortLtv(spark, sf0001).collect()
        .map(_.toSeq).toSeq
      assert(board == batch,
        s"post-restart board != batch w48 (${board.size} vs ${batch.size})")
      assert(batch.nonEmpty)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
      graft.Caches.unpersistAll()
      val walk = java.nio.file.Files.walk(tmp)
      try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
      finally walk.close()
    }
  }
}
