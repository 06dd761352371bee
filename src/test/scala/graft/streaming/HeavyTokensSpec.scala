package graft.streaming

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** heavyTokensTws: per-token running counts accumulated across
  * micro-batches fold to EXACTLY the batch t11 heavy-token report.
  */
class HeavyTokensSpec extends SparkTestBase {
  import spark.implicits._

  test("heavyTokensTws: accumulated counts fold to the exact batch " +
      "t11 board, emissions monotone per token") {
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try {
      val toks = Tables.documents(spark, sf0001)
        .select(explode(split(col("text"), " ")).as("tok"))
        .as[TokEvent].collect()
      // two micro-batches with heavy overlap: re-sent tokens must emit
      // strictly larger totals, never duplicates of the same total
      val (b1, b2) = toks.splitAt(toks.length / 2)
      val mem = MemoryStream[TokEvent]
      val q = HeavyJobs.heavyTokensTws(mem.toDS())
        .writeStream.format("memory").queryName("tok_counts")
        .outputMode("update").start()
      mem.addData(b1.toIndexedSeq)
      q.processAllAvailable()
      mem.addData(b2.toIndexedSeq)
      q.processAllAvailable(); q.stop()
      val counts = spark.table("tok_counts")
      // monotone contract: at most one emission per (token, total), and
      // per token the emission count is <= 2 (one per micro-batch)
      assert(counts.groupBy("tok", "n_occurrences").count()
        .filter(col("count") > 1).count() == 0L)
      assert(counts.groupBy("tok").count()
        .filter(col("count") > 2).count() == 0L)
      val board = HeavyJobs.heavyTokensBoard(counts).collect()
        .map(r => (r.getAs[String]("tok"),
          r.getAs[Long]("n_occurrences"))).toSeq
      val batch = graft.ops.TextOps.t11HeavyTokens(spark, sf0001)
        .collect()
        .map(r => (r.getAs[String]("tok"),
          r.getAs[Long]("n_occurrences"))).toSeq
      assert(board == batch,
        s"streaming board != batch t11 (${board.size} vs ${batch.size})")
      assert(batch.nonEmpty) // the comparison must not pass vacuously
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
}
