package graft.ops

import graft.SparkTestBase

/** p29_anneal_split: quality-ordered two-phase schedule under the
  * exact 10% token budget, hand-computed boundary behavior.
  */
class AnnealSplitSpec extends SparkTestBase {
  import spark.implicits._

  test("p29: hand-computed phases — straddling doc stays in anneal") {
    // total 100 tokens, budget 10; order: id1(level 9, 5t) id2(9, 3t)
    // id3(5, 10t) id4(1, 82t)
    val docs = Seq(
      (1L, "a", 9L, 5L), (2L, "a", 9L, 3L),
      (3L, "b", 5L, 10L), (4L, "b", 1L, 82L)
    ).toDF("doc_id", "source", "level", "n_tokens")
    val rows = PipelineOps.annealSplitOf(docs).collect()
    def doc(i: Long) = rows.find(_.getAs[Long]("doc_id") == i).get
    assert(doc(1L).getAs[Long]("cum_before") == 0L)
    assert(doc(1L).getAs[Long]("phase") == 2L)
    assert(doc(2L).getAs[Long]("cum_before") == 5L)
    assert(doc(2L).getAs[Long]("phase") == 2L)
    // id3's cum_before 8 < 10: the doc STRADDLING the budget anneals
    // (start-offset convention, m08's)
    assert(doc(3L).getAs[Long]("cum_before") == 8L)
    assert(doc(3L).getAs[Long]("phase") == 2L)
    assert(doc(4L).getAs[Long]("cum_before") == 18L)
    assert(doc(4L).getAs[Long]("phase") == 1L)
  }

  test("p29: within a level the bucket sub-order ranks mod-64 first") {
    // ids 65 (bucket 1) and 2 (bucket 2), same level: 65 precedes 2
    val docs = Seq(
      (65L, "a", 5L, 6L), (2L, "a", 5L, 6L), (9L, "a", 0L, 88L)
    ).toDF("doc_id", "source", "level", "n_tokens")
    val rows = PipelineOps.annealSplitOf(docs).collect()
    def doc(i: Long) = rows.find(_.getAs[Long]("doc_id") == i).get
    assert(doc(65L).getAs[Long]("cum_before") == 0L)
    assert(doc(2L).getAs[Long]("cum_before") == 6L)
    assert(doc(9L).getAs[Long]("phase") == 1L)
  }

  test("p29: sf fixture — exact budget boundary, level monotonicity, " +
      "totals reconcile") {
    val rows = PipelineOps.p29AnnealSplit(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("n_tokens")).sum
    val budget = total / 10
    val (p2, p1) = rows.partition(_.getAs[Long]("phase") == 2L)
    assert(p2.nonEmpty && p1.nonEmpty)
    assert(p2.map(_.getAs[Long]("cum_before")).max < budget)
    assert(p1.map(_.getAs[Long]("cum_before")).min >= budget)
    // quality order: anneal levels never fall below main-phase levels
    assert(p2.map(_.getAs[Long]("level")).min >=
      p1.map(_.getAs[Long]("level")).max)
    // cum_before is a genuine exclusive prefix: max(cum+n) == total
    assert(rows.map(r => r.getAs[Long]("cum_before") +
      r.getAs[Long]("n_tokens")).max == total)
  }
}
