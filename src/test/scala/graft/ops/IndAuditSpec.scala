package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** p38_ind_audit: candidate inclusion dependencies audited for orphan
  * foreign keys — planted frames pinning both verdicts, every count,
  * and the null semantics (a null fk never violates; null pk values
  * never satisfy), plus an sf0.001 cross-check against an independent
  * in-memory recomputation.
  */
class IndAuditSpec extends SparkTestBase {
  import spark.implicits._

  test("p38 planted: a held IND, a violated IND with exact orphan " +
      "value/row counts, and null fks counted but never blamed") {
    val pkClean = Seq(1L, 2L, 3L, 4L).toDF("pk")
    // holds: every fk value present on the pk side (2 repeats)
    val fkGood = Seq(1L, 2L, 2L, 3L).toDF("fk")
    // violated: 10 present; 20 (1 row) and 30 (3 rows) orphaned
    val fkBad = Seq(10L, 10L, 20L, 30L, 30L, 30L).toDF("fk")
    val pkBad = Seq(10L).toDF("pk")
    // null semantics: 2 null fk rows land in n_fk_null, not orphans;
    // the null pk value must not satisfy anything
    val fkNull = Seq(Some(1L), None, None).toDF("fk")
    val pkNull = Seq(Some(1L), None).toDF("pk")
    val rows = PipelineOps.indAuditOf(Seq(
        ("good", fkGood, "fk", "dim", pkClean, "pk"),
        ("bad", fkBad, "fk", "dim", pkBad, "pk"),
        ("nullfk", fkNull, "fk", "dim", pkNull, "pk")))
      .as[(String, String, String, String, Long, Long, Long, Long,
        Long, Long)]
      .collect().toSeq
    assert(rows == Seq(
      ("bad", "fk", "dim", "pk", 6L, 0L, 3L, 2L, 4L, 0L),
      ("good", "fk", "dim", "pk", 4L, 0L, 3L, 0L, 0L, 1L),
      ("nullfk", "fk", "dim", "pk", 1L, 2L, 1L, 0L, 0L, 1L)),
      s"got $rows")
    graft.Caches.unpersistAll()
  }

  test("p38 planted: an all-null fk column holds vacuously (SQL FK " +
      "semantics) with zero distinct values") {
    val fk = Seq[Option[Long]](None, None).toDF("fk")
    val pk = Seq(1L).toDF("pk")
    val r = PipelineOps.indAuditOf(Seq(("allnull", fk, "fk", "dim", pk,
        "pk")))
      .as[(String, String, String, String, Long, Long, Long, Long,
        Long, Long)]
      .collect().toSeq
    assert(r == Seq(("allnull", "fk", "dim", "pk", 0L, 2L, 0L, 0L, 0L,
      1L)), s"got $r")
    graft.Caches.unpersistAll()
  }

  test("p38 sf fixture: both join directions match an independent " +
      "in-memory recomputation; the registry exercises both verdicts") {
    val out = PipelineOps.p38IndAudit(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3)) ->
        ((r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
          r.getLong(8), r.getLong(9)))).toMap
    def recompute(fdf: org.apache.spark.sql.DataFrame, fc: String,
        pdf: org.apache.spark.sql.DataFrame, pc: String)
        : (Long, Long, Long, Long, Long, Long) = {
      val fks = fdf.select(col(fc).cast("string")).collect()
        .map(r => Option(r.getString(0))).toSeq
      val pks = pdf.select(col(pc).cast("string")).collect()
        .map(r => Option(r.getString(0))).collect { case Some(v) => v }
        .toSet
      val nonNull = fks.flatten
      val orphanVals = nonNull.distinct.filterNot(pks.contains)
      (nonNull.size.toLong, (fks.size - nonNull.size).toLong,
        nonNull.distinct.size.toLong, orphanVals.size.toLong,
        nonNull.count(orphanVals.toSet.contains).toLong,
        if (orphanVals.isEmpty) 1L else 0L)
    }
    val li = graft.Tables.lineitem(spark, sf0001)
    val ord = graft.Tables.orders(spark, sf0001)
    assert(out(("lineitem", "l_orderkey", "orders", "o_orderkey")) ==
      recompute(li, "l_orderkey", ord, "o_orderkey"))
    assert(out(("orders", "o_orderkey", "lineitem", "l_orderkey")) ==
      recompute(ord, "o_orderkey", li, "l_orderkey"))
    // the child->parent key link must hold on any fixture
    assert(out(("lineitem", "l_orderkey", "orders", "o_orderkey"))._6
      == 1L)
    // childless orders exist: the reverse direction genuinely violates
    assert(out(("orders", "o_orderkey", "lineitem", "l_orderkey"))._6
      == 0L, s"registry no longer exercises the violated verdict: $out")
    val verdicts = out.values.map(_._6).toSet
    assert(verdicts == Set(0L, 1L))
    graft.Caches.unpersistAll()
  }
}
