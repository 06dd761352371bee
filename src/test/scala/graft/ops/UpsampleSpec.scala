package graft.ops

import graft.SparkTestBase

/** p19_upsample_assign: integer rep factors toward the majority
  * language, the 4x cap, and the materialized per-copy rows.
  */
class UpsampleSpec extends SparkTestBase {
  import spark.implicits._

  test("p19: rep factors, cap, and copy expansion hand-computed") {
    // x: 5 docs (majority, rep 1); y: 2 docs (ceil(5/2)=3);
    // z: 1 doc (ceil(5/1)=5 -> CAPPED at 4)
    val docs = ((1 to 5).map(i => (i.toLong, "x")) ++
      Seq((10L, "y"), (11L, "y"), (20L, "z"))).toDF("doc_id", "lang")
    val rows = PipelineOps.upsampleAssign(docs).collect()
    assert(rows.length == 5 * 1 + 2 * 3 + 1 * 4)
    val byLang = rows.groupBy(_.getAs[String]("lang"))
    assert(byLang("x").forall(_.getAs[Long]("rep_factor") == 1L))
    assert(byLang("y").forall(_.getAs[Long]("rep_factor") == 3L))
    assert(byLang("z").forall(_.getAs[Long]("rep_factor") == 4L))
    // copy ids are exactly 1..rep per doc
    val z = byLang("z").map(_.getAs[Long]("copy_id")).sorted
    assert(z.toSeq == Seq(1L, 2L, 3L, 4L))
    val doc10 = rows.filter(_.getAs[Long]("doc_id") == 10L)
      .map(_.getAs[Long]("copy_id")).sorted
    assert(doc10.toSeq == Seq(1L, 2L, 3L))
  }

  test("p19: balanced corpus is a no-op plan (rep 1 everywhere)") {
    val docs = ((1 to 3).map(i => (i.toLong, "a")) ++
      (4 to 6).map(i => (i.toLong, "b"))).toDF("doc_id", "lang")
    val rows = PipelineOps.upsampleAssign(docs).collect()
    assert(rows.length == 6)
    assert(rows.forall(_.getAs[Long]("rep_factor") == 1L))
  }
}
