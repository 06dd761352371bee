package graft.streaming

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** indTws (E258): per-value (fk count, pk membership) updates
  * accumulated across micro-batches fold to EXACTLY the batch p38 row
  * for the events IND, and a fact arriving before its dimension is a
  * live orphan that un-orphans when the dimension catches up — the
  * late-arriving-dimension monitor.
  */
class IndTwsSpec extends SparkTestBase {
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

  test("indTws: two micro-batches fold to the exact batch p38 events " +
      "row; updates are at-most-once per (v, n_rows, in_pk)") {
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val fkRows = Tables.events(spark, sf0001)
        .select(col("user_id").cast("string")).as[String].collect()
        .map(IndEvent("fk", _))
      val pkRows = Tables.customer(spark, sf0001)
        .select(col("c_custkey").cast("string")).as[String].collect()
        .map(IndEvent("pk", _))
      // interleave so both sides straddle the batch cut
      val incoming = fkRows.take(fkRows.length / 2) ++
        pkRows.take(pkRows.length / 2) ++
        fkRows.drop(fkRows.length / 2) ++ pkRows.drop(pkRows.length / 2)
      val cut = incoming.length / 2
      val mem = MemoryStream[IndEvent]
      val q = IndJobs.indTws(mem.toDF())
        .writeStream.format("memory").queryName("ind_updates")
        .outputMode("update").start()
      mem.addData(incoming.take(cut).toIndexedSeq)
      q.processAllAvailable()
      mem.addData(incoming.drop(cut).toIndexedSeq)
      q.processAllAvailable(); q.stop()
      val updates = spark.table("ind_updates")
      // at-most-once contract: growth emits carry a fresh n_rows and a
      // membership flip re-emits the same n_rows only with in_pk
      // flipped, so full triples never repeat
      assert(updates.groupBy("v", "n_rows", "in_pk").count()
        .filter(col("count") > 1).count() == 0L)
      val board = IndJobs.indBoard(updates).collect().map(_.toSeq).toSeq
      val batch = graft.ops.PipelineOps.indAuditOf(Seq(
          ("events", Tables.events(spark, sf0001), "user_id",
            "customer", Tables.customer(spark, sf0001), "c_custkey")))
        .collect().map(_.toSeq).toSeq
      assert(board == batch,
        s"streaming board != batch p38 events row ($board vs $batch)")
      assert(batch.nonEmpty)
    }
  }

  test("indTws: a fact arriving before its dimension is a live orphan " +
      "at the cut and un-orphans when the dimension lands") {
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val mem = MemoryStream[IndEvent]
      val q = IndJobs.indTws(mem.toDF())
        .writeStream.format("memory").queryName("ind_plant")
        .outputMode("update").start()
      def boardNow(): (Long, Long, Long) = {
        val r = IndJobs.indBoard(spark.table("ind_plant")).collect()
        assert(r.length == 1)
        (r(0).getAs[Long]("n_orphan_values"),
          r(0).getAs[Long]("n_orphan_rows"),
          r(0).getAs[Long]("ind_holds"))
      }
      // batch 1: facts for keys 1 (x2 rows) and 2; only key 2's
      // dimension row has arrived -> key 1 is a live orphan
      mem.addData(IndEvent("fk", "1"), IndEvent("fk", "1"),
        IndEvent("fk", "2"), IndEvent("pk", "2"))
      q.processAllAvailable()
      assert(boardNow() == ((1L, 2L, 0L)),
        "the early fact must read as a live orphan at the cut")
      // batch 2: the late dimension row for key 1 lands -> un-orphaned
      // (plus a pk-only key 9, which the fk-driven audit never reports)
      mem.addData(IndEvent("pk", "1"), IndEvent("pk", "9"))
      q.processAllAvailable(); q.stop()
      assert(boardNow() == ((0L, 0L, 1L)),
        "the late dimension must un-orphan the early fact")
      val ups = spark.table("ind_plant").as[IndUpdate].collect().toSet
      assert(ups == Set(IndUpdate("1", 2L, 0L), IndUpdate("2", 1L, 1L),
        IndUpdate("1", 2L, 1L)), s"got $ups")
    }
  }
}
