package graft.ops

import org.apache.spark.sql.functions.col

import graft.SparkTestBase

/** s25_tombstone_compact: per-cell dead/live counts and the exact
  * integer 25% compaction threshold, hand-computed on planted postings.
  */
class TombstoneCompactSpec extends SparkTestBase {
  import spark.implicits._

  test("s25: planted postings — threshold, bill, healthy zero row") {
    val postings = Seq(
      // cell 1: 3 postings, 2 tombstoned (ids 4, 14) -> flagged, bill 1
      (4L, 1L), (14L, 1L), (21L, 1L),
      // cell 2: 3 postings, none tombstoned -> healthy real row
      (1L, 2L), (2L, 2L), (3L, 2L),
      // cell 3: fully dead -> flagged, zero rewrite bill
      (24L, 3L),
      // cell 4: exactly AT the threshold (1 of 4) -> 4*1 >= 4 flags
      (34L, 4L), (5L, 4L), (6L, 4L), (7L, 4L)
    ).toDF("vec_id", "cell")
    val rows = SimOps.tombstoneCompactOf(postings,
      col("vec_id") % 10 === 4).collect()
    assert(rows.length == 4)
    def cell(c: Long) = rows.find(_.getAs[Long]("cell") == c).get
    val c1 = cell(1L)
    assert(c1.getAs[Long]("n_tombstoned") == 2L)
    assert(c1.getAs[Long]("n_live") == 1L)
    assert(c1.getAs[Double]("live_share") == 1.0 / 3)
    assert(c1.getAs[Long]("compact_flag") == 1L)
    assert(c1.getAs[Long]("rewrite_rows") == 1L)
    val c2 = cell(2L)
    assert(c2.getAs[Long]("n_tombstoned") == 0L)
    assert(c2.getAs[Long]("compact_flag") == 0L)
    assert(c2.getAs[Double]("live_share") == 1.0)
    val c3 = cell(3L) // all dead: flagged but nothing to copy
    assert(c3.getAs[Long]("n_live") == 0L)
    assert(c3.getAs[Long]("compact_flag") == 1L)
    assert(c3.getAs[Long]("rewrite_rows") == 0L)
    val c4 = cell(4L) // boundary: 25% dead exactly triggers
    assert(c4.getAs[Long]("compact_flag") == 1L)
    assert(c4.getAs[Long]("rewrite_rows") == 3L)
  }

  test("s25: sf fixture — counts reconcile and flags match the " +
      "integer threshold") {
    val rows = SimOps.s25TombstoneCompact(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_postings")
      val t = r.getAs[Long]("n_tombstoned")
      assert(r.getAs[Long]("n_live") == n - t)
      assert(r.getAs[Long]("compact_flag") ==
        (if (4 * t >= n) 1L else 0L))
      val share = r.getAs[Double]("live_share")
      assert(share >= 0.0 && share <= 1.0)
    }
    // postings count reconciles with the persisted index population
    // (corpus = vec_id % 10 != 7 by the s19 build contract)
    val corpus = graft.Tables.embeddings(spark, sf0001)
      .filter(col("vec_id") % 10 =!= 7).count()
    assert(rows.map(_.getAs[Long]("n_postings")).sum == corpus)
  }
}
