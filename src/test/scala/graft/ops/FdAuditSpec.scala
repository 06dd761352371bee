package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** p37_fd_audit: candidate functional dependencies audited for
  * violations — planted frames pinning both verdicts and every count,
  * plus an sf0.001 cross-check against an independent in-memory
  * recomputation.
  */
class FdAuditSpec extends SparkTestBase {
  import spark.implicits._

  test("p37 planted: a held FD, a violated FD with exact excess " +
      "counts, and an all-null dependent clamping at zero excess") {
    // holds: every key maps to one name
    val dim = Seq((1L, "a"), (2L, "b"), (2L, "b"), (3L, "c"))
      .toDF("k", "v")
    // violated: det 10 -> {x, y, z} (excess 2), det 20 -> {x} (clean),
    // det 30 -> all-NULL dependent (n_dep = 0: no violation, and the
    // excess clamp must not credit -1 against det 10's 2)
    val bad = Seq((10L, Some("x")), (10L, Some("y")), (10L, Some("z")),
      (20L, Some("x")), (30L, None), (30L, None))
      .toDF("k", "v")
    val rows = PipelineOps.fdAuditOf(Seq(
        ("dim", dim, "k", "v"), ("bad", bad, "k", "v")))
      .as[(String, String, String, Long, Long, Long, Long)]
      .collect().toSeq
    assert(rows == Seq(
      ("bad", "k", "v", 3L, 1L, 2L, 0L),
      ("dim", "k", "v", 3L, 0L, 0L, 1L)), s"got $rows")
    graft.Caches.unpersistAll()
  }

  test("p37 sf fixture: every row matches an independent in-memory " +
      "recomputation; the registry exercises both verdicts") {
    val out = PipelineOps.p37FdAudit(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        ((r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    // independent recomputation of two registry entries (one expected
    // to hold, one expected to violate) straight off the parquet
    def recompute(df: org.apache.spark.sql.DataFrame,
        det: String, dep: String): (Long, Long, Long, Long) = {
      val m = df.select(col(det).cast("string"), col(dep).cast("string"))
        .collect().map(r => (r.getString(0), r.getString(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).distinct.length.toLong)
      val nViol = m.values.count(_ > 1).toLong
      (m.size.toLong, nViol, m.values.map(n => math.max(n - 1, 0L)).sum,
        if (nViol == 0) 1L else 0L)
    }
    assert(out(("documents", "doc_id", "source")) ==
      recompute(graft.Tables.documents(spark, sf0001), "doc_id", "source"))
    assert(out(("events", "user_id", "event_type")) ==
      recompute(graft.Tables.events(spark, sf0001), "user_id", "event_type"))
    // doc_id is the documents key: its FD must hold on any fixture
    assert(out(("documents", "doc_id", "source"))._4 == 1L)
    // the registry must exercise BOTH verdicts against real data
    val verdicts = out.values.map(_._4).toSet
    assert(verdicts == Set(0L, 1L),
      s"registry no longer exercises both verdicts: $out")
    graft.Caches.unpersistAll()
  }
}
