package graft.streaming

import java.nio.file.{Files, Path}
import java.util.Comparator

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** disorderTws (E260): per-stream running disorder totals accumulated
  * across micro-batches fold to EXACTLY the batch w54 row, and a row
  * late only against a PREVIOUS batch's running max is caught — the
  * carried-state case a per-batch recompute would miss.
  */
class DisorderTwsSpec extends SparkTestBase {
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

  private val names = Seq(("orders", "o_orderkey", "o_orderdate"))
    .toDF("stream", "seq_column", "ts_column")

  private def withTempDir(body: Path => Unit): Unit = {
    val dir = Files.createTempDirectory("graft_disorder_tws")
    try body(dir)
    finally {
      val walk = Files.walk(dir)
      try walk.sorted(Comparator.reverseOrder[Path]())
        .forEach(p => Files.deleteIfExists(p))
      finally walk.close()
    }
  }

  test("disorderTws: two micro-batches in ingest order fold to the " +
      "exact batch w54 orders row; totals are strictly monotone") {
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val ord = Tables.orders(spark, sf0001)
        .select(col("o_orderkey").cast("long"),
          unix_micros(col("o_orderdate").cast("timestamp")))
        .as[(Long, Long)].collect().sortBy(_._1)
        .map { case (s, t) => DisorderEvent("orders", s, t) }
      val cut = ord.length / 2
      val mem = MemoryStream[DisorderEvent]
      val q = DisorderJobs.disorderTws(mem.toDF())
        .writeStream.format("memory").queryName("dis_updates")
        .outputMode("update").start()
      mem.addData(ord.take(cut).toIndexedSeq)
      q.processAllAvailable()
      mem.addData(ord.drop(cut).toIndexedSeq)
      q.processAllAvailable(); q.stop()
      val updates = spark.table("dis_updates")
      // one emission per (stream, batch), strictly growing n_events
      assert(updates.count() == 2L)
      assert(updates.groupBy("stream", "n_events").count()
        .filter(col("count") > 1).count() == 0L)
      val board = DisorderJobs.disorderBoard(updates, names)
        .collect().map(_.toSeq).toSeq
      val batch = graft.ops.RelOps.outOfOrderOf(Seq(
          ("orders", "o_orderkey", "o_orderdate",
            Tables.orders(spark, sf0001).select(
              col("o_orderkey").cast("long").as("seq"),
              unix_micros(col("o_orderdate").cast("timestamp"))
                .as("tus")))))
        .collect().map(_.toSeq).toSeq
      assert(board == batch,
        s"streaming board != batch w54 orders row ($board vs $batch)")
      assert(batch.nonEmpty)
    }
  }

  test("disorderTws: a row late only against a PREVIOUS batch's " +
      "running max is caught (state carryover), in-batch seq order " +
      "is restored before folding") {
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val mem = MemoryStream[DisorderEvent]
      val q = DisorderJobs.disorderTws(mem.toDF())
        .writeStream.format("memory").queryName("dis_plant")
        .outputMode("update").start()
      // batch 1 arrives seq-shuffled: folded order is (0,100),(1,50)
      // -> one late row of 50
      mem.addData(DisorderEvent("x", 1L, 50L), DisorderEvent("x", 0L, 100L))
      q.processAllAvailable()
      // batch 2: (2,60) is late ONLY against batch 1's carried max 100
      mem.addData(DisorderEvent("x", 2L, 60L))
      q.processAllAvailable(); q.stop()
      val ups = spark.table("dis_plant").as[DisorderUpdate]
        .collect().toSet
      assert(ups == Set(DisorderUpdate("x", 2L, 1L, 50L),
        DisorderUpdate("x", 3L, 2L, 50L)), s"got $ups")
      val nm = Seq(("x", "seq", "tus"))
        .toDF("stream", "seq_column", "ts_column")
      val b = DisorderJobs.disorderBoard(spark.table("dis_plant"), nm)
        .as[(String, String, String, Long, Long, Double, Long)]
        .collect().toSeq
      assert(b == Seq(("x", "seq", "tus", 3L, 2L, 2.0 / 3.0, 50L)),
        s"got $b")
    }
  }

  test("disorderTws: RocksDB state survives a checkpointed restart — " +
      "a fresh query resumes the running max and totals, and the " +
      "board equals batch w54") {
    // reset state would zero BOTH the running max (post-restart rows
    // late only against pre-restart maxes stop counting) and the
    // totals (n_events restarts from the batch size) — either alone
    // breaks board == batch; orders' heavy disorder guarantees
    // cut-straddling lateness
    withRocksDb { withTempDir { tmp =>
      import org.apache.spark.sql.streaming.Trigger
      val in = s"$tmp/in"; val out = s"$tmp/out"; val cp = s"$tmp/cp"
      val incoming = Tables.orders(spark, sf0001)
        .select(col("o_orderkey").cast("long"),
          unix_micros(col("o_orderdate").cast("timestamp")))
        .as[(Long, Long)].collect().sortBy(_._1)
        .map { case (s, t) => DisorderEvent("orders", s, t) }
      val cut = incoming.length / 2
      val sch = implicitly[org.apache.spark.sql.Encoder[DisorderEvent]]
        .schema
      def feed(rows: Seq[DisorderEvent]): Unit =
        spark.createDataset(rows.toIndexedSeq).toDF()
          .coalesce(1).write.mode("append").parquet(in)
      def drain(): Unit = {
        val q = DisorderJobs
          .disorderTws(spark.readStream.schema(sch).parquet(in))
          .writeStream
          .foreachBatch(
            (b: org.apache.spark.sql.Dataset[DisorderUpdate],
                _: Long) => {
              b.write.mode("append").parquet(out); ()
            })
          .outputMode("update")
          .option("checkpointLocation", cp)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      feed(incoming.take(cut)); drain()   // query instance 1
      feed(incoming.drop(cut)); drain()   // FRESH instance, same cp
      val updates = spark.read.parquet(out)
      // totals strictly grew across the restart: the largest
      // post-restart n_events must exceed anything instance 1 emitted
      assert(updates.agg(max(col("n_events"))).collect()(0).getLong(0)
        == incoming.length.toLong,
        "final totals must cover BOTH instances' rows")
      assert(updates.groupBy("stream", "n_events").count()
        .filter(col("count") > 1).count() == 0L,
        "duplicate totals emitted across instances")
      val board = DisorderJobs.disorderBoard(updates, names)
        .collect().map(_.toSeq).toSeq
      val batch = graft.ops.RelOps.outOfOrderOf(Seq(
          ("orders", "o_orderkey", "o_orderdate",
            Tables.orders(spark, sf0001).select(
              col("o_orderkey").cast("long").as("seq"),
              unix_micros(col("o_orderdate").cast("timestamp"))
                .as("tus")))))
        .collect().map(_.toSeq).toSeq
      assert(board == batch,
        s"post-restart board != batch w54 ($board vs $batch)")
    } }
  }
}
