package graft.streaming

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Raw ingest shape fed to the memory stream (top-level: Spark cannot
  * build an encoder for a suite-inner case class).
  */
case class RawEvent(event_type: String, user_id: Long,
    ts: java.sql.Timestamp, value: Double)

/** privacyTws: per-QI-group anonymity state accumulated across
  * micro-batches folds to EXACTLY the batch w51 report.
  */
class PrivacyTwsSpec extends SparkTestBase {
  import spark.implicits._

  test("privacyTws: two micro-batches fold to the exact batch w51 " +
      "report; users spanning batches count once per group") {
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try {
      val incoming = Tables.events(spark, sf0001)
        .select(col("event_type"), col("user_id"), col("ts"), col("value"))
        .as[RawEvent].collect()
      // split users across the batch cut so every group straddling it
      // exercises the seen-user state (exactly-once input: disjoint
      // batches — the checkpointed-source contract)
      val cut = incoming.length / 2
      val mem = MemoryStream[RawEvent]
      val q = PrivacyJobs.privacyTws(mem.toDF())
        .writeStream.format("memory").queryName("privacy_updates")
        .outputMode("update").start()
      mem.addData(incoming.take(cut).toIndexedSeq)
      q.processAllAvailable()
      mem.addData(incoming.drop(cut).toIndexedSeq)
      q.processAllAvailable(); q.stop()
      // round-trip the update table through parquet: the board
      // self-joins it, and the MemorySink view cannot serve both sides
      // (production reads the checkpointed sink the same way)
      val sinkDir = s"/tmp/graft_privacy_tws_${System.nanoTime()}"
      spark.table("privacy_updates").write.mode("overwrite")
        .parquet(sinkDir)
      val updates = spark.read.parquet(sinkDir)
      // state contract: a user enters a group's update stream at most once
      assert(updates.filter(col("user_id") >= 0)
        .groupBy("event_type", "hr", "vb", "user_id").count()
        .filter(col("count") > 1).count() == 0L)
      val board = PrivacyJobs.privacyBoard(updates).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6))).toSeq
      val batch = graft.ops.RelOps.w51KAnonymity(spark, sf0001).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6))).toSeq
      assert(board == batch,
        s"streaming board != batch w51 (${board.size} vs ${batch.size})")
      assert(batch.nonEmpty) // must not pass vacuously
    } finally {
      graft.Caches.unpersistAll()
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
}
