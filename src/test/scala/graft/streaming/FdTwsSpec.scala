package graft.streaming

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** fdTws (E256): per-determinant distinct-dependent counts accumulated
  * across micro-batches fold to EXACTLY the batch p37 row for the
  * events FD, and a planted determinant flips the FD verdict at the
  * batch cut — schema drift detected at ingest.
  */
class FdTwsSpec extends SparkTestBase {
  import spark.implicits._

  private def withRocksDb(body: => Unit): Unit = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try body
    finally {
      graft.Caches.unpersistAll()
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("fdTws: two micro-batches fold to the exact batch p37 events " +
      "row; updates are at-most-once per (det, n_dep)") {
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val incoming = Tables.events(spark, sf0001)
        .select(col("user_id").cast("string"),
          col("event_type").cast("string"))
        .as[(String, String)].collect().map(p => FdEvent(p._1, p._2))
      val cut = incoming.length / 2
      val mem = MemoryStream[FdEvent]
      val q = FdJobs.fdTws(
          mem.toDF().select(col("det").as("user_id"),
            col("dep").as("event_type")))
        .writeStream.format("memory").queryName("fd_updates")
        .outputMode("update").start()
      mem.addData(incoming.take(cut).toIndexedSeq)
      q.processAllAvailable()
      mem.addData(incoming.drop(cut).toIndexedSeq)
      q.processAllAvailable(); q.stop()
      val updates = spark.table("fd_updates")
      // monotone contract: a count value is emitted once per det
      assert(updates.groupBy("det", "n_dep").count()
        .filter(col("count") > 1).count() == 0L)
      val board = FdJobs.fdBoard(updates).collect().map(_.toSeq).toSeq
      val batch = graft.ops.PipelineOps.fdAuditOf(Seq(
          ("events", Tables.events(spark, sf0001), "user_id",
            "event_type")))
        .collect().map(_.toSeq).toSeq
      assert(board == batch,
        s"streaming board != batch p37 events row ($board vs $batch)")
      assert(batch.nonEmpty)
    }
  }

  test("fdTws: a planted determinant flips fd_holds exactly at the " +
      "batch cut — drift visible at ingest, not after the join") {
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val mem = MemoryStream[FdEvent]
      val q = FdJobs.fdTws(
          mem.toDF().select(col("det").as("user_id"),
            col("dep").as("event_type")))
        .writeStream.format("memory").queryName("fd_plant")
        .outputMode("update").start()
      def holdsNow(): Long = {
        val r = FdJobs.fdBoard(spark.table("fd_plant")).collect()
        assert(r.length == 1)
        r(0).getAs[Long]("fd_holds")
      }
      // batch 1: two determinants, one dependent each — the FD holds
      // (re-sent duplicates must not emit or count twice)
      mem.addData(FdEvent("k1", "x"), FdEvent("k1", "x"), FdEvent("k2", "y"))
      q.processAllAvailable()
      assert(holdsNow() == 1L, "single-valued determinants must hold")
      // batch 2: k1 acquires a SECOND dependent -> violated from here on
      mem.addData(FdEvent("k1", "z"))
      q.processAllAvailable(); q.stop()
      assert(holdsNow() == 0L,
        "the second dependent value must flip the verdict at the cut")
      val ups = spark.table("fd_plant").as[FdUpdate].collect().toSet
      assert(ups == Set(FdUpdate("k1", 1L), FdUpdate("k2", 1L),
        FdUpdate("k1", 2L)), s"got $ups")
    }
  }
}
