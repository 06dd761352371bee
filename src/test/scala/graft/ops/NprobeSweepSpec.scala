package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** s24_nprobe_sweep: the recall/cost frontier is internally consistent
  * and reconciles with the standalone s08 search at the same setting.
  */
class NprobeSweepSpec extends SparkTestBase {

  private def collectOrdered(df: org.apache.spark.sql.DataFrame)
      : Seq[org.apache.spark.sql.Row] = {
    val out = df.collect().toSeq
    graft.Caches.unpersistAll()
    out
  }

  test("s24: monotone candidates and recall; nProbe=2 hits reconcile " +
      "with an independent s08-vs-exact intersection") {
    val rows = collectOrdered(SimOps.s24NprobeSweep(spark, sf0001))
    assert(rows.map(_.getAs[Long]("n_probe")) == Seq(1L, 2L, 3L, 4L))
    // cost and recall both grow (weakly) with the probe count
    val cands = rows.map(_.getAs[Long]("n_candidates"))
    assert(cands == cands.sorted && cands.head > 0)
    val hits = rows.map(_.getAs[Long]("n_hits"))
    assert(hits == hits.sorted)
    rows.foreach { r =>
      assert(r.getAs[Double]("recall_at_5") ==
        r.getAs[Long]("n_hits").toDouble / r.getAs[Long]("n_exact"))
    }
    // independent reconciliation at nProbe=2: s08's top-5 against the
    // exact top-5 must produce exactly the sweep's level-2 hit count
    val exact = SimOps.s01KnnBruteforce(spark, sf0001)
      .filter(col("rank") <= 5).select("qid", "neighbor_id")
    val s08 = SimOps.s08IvfAnn(spark, sf0001).select("qid", "neighbor_id")
    val expected = exact.join(s08, Seq("qid", "neighbor_id")).count()
    assert(rows(1).getAs[Long]("n_hits") == expected,
      s"sweep level 2 ${rows(1).getAs[Long]("n_hits")} != s08 $expected")
  }
}
