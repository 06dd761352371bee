package graft.streaming

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** decontamTws: stream-static 4-gram decontamination accumulated across
  * micro-batches folds to EXACTLY the batch d08 report.
  */
class DecontamTwsSpec extends SparkTestBase {
  import spark.implicits._

  test("decontamTws: two overlapping micro-batches fold to the exact " +
      "batch d08 report; re-sent grams never inflate the count") {
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try {
      val corpus = Tables.documents(spark, sf0001)
        .select("doc_id", "text")
      val bench = DecontamJobs.benchGrams(corpus)
      val incoming = corpus.filter(col("doc_id") % 97 =!= 0)
        .as[DocEvent].collect()
      // batch 2 re-sends the tail of batch 1: duplicate (doc, gram)
      // arrivals must be absorbed by the seen-gram state
      val cut = incoming.length / 2
      val b1 = incoming.take(cut + cut / 4)
      val b2 = incoming.drop(cut)
      val mem = MemoryStream[DocEvent]
      val q = DecontamJobs.decontamTws(mem.toDF(), bench)
        .writeStream.format("memory").queryName("contam_updates")
        .outputMode("update").start()
      mem.addData(b1.toIndexedSeq)
      q.processAllAvailable()
      mem.addData(b2.toIndexedSeq)
      q.processAllAvailable(); q.stop()
      val updates = spark.table("contam_updates")
      // monotone contract: at most one emission per (doc, count)
      assert(updates.groupBy("doc_id", "n_shared_ngrams").count()
        .filter(col("count") > 1).count() == 0L)
      val board = DecontamJobs.decontamBoard(updates).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      val batch = graft.ops.DedupOps
        .d08Decontamination(spark, sf0001).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(board == batch,
        s"streaming board != batch d08 (${board.size} vs ${batch.size})")
      assert(batch.nonEmpty) // must not pass vacuously
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
}
