package graft.ops

import graft.SparkTestBase

/** d26_dup_burst: ingestion-decile dup/redup shares with the zero-kept
  * spine, hand-computed on a 10-doc fixture (one doc per decile).
  */
class DupBurstSpec extends SparkTestBase {
  import spark.implicits._

  test("d26: hand-computed deciles — redup is the later pair end only") {
    // ids 0..9, span 10 => decile = doc_id exactly
    val docs = (0L to 9L).toDF("doc_id")
    // pairs (2,7) and (2,9): members {2,7,9}; re-dups (later ends) {7,9}
    val pairs = Seq((2L, 7L), (2L, 9L)).toDF("doc_a", "doc_b")
    val rows = DedupOps.dupBurstOf(docs, pairs).collect()
    assert(rows.length == 10)
    def d(i: Long) = rows.find(_.getAs[Long]("decile") == i).get
    assert(d(2).getAs[Long]("n_dup") == 1L)
    assert(d(2).getAs[Long]("n_redup") == 0L) // the ORIGINAL never flags
    assert(d(2).getAs[Double]("dup_share") == 1.0)
    assert(d(7).getAs[Long]("n_redup") == 1L)
    assert(d(9).getAs[Long]("n_redup") == 1L)
    assert(d(0).getAs[Long]("n_dup") == 0L) // zero cells are real rows
    assert(d(0).getAs[Double]("dup_share") == 0.0)
    assert(rows.map(_.getAs[Long]("n_docs")).sum == 10L)
  }

  test("d26: empty decile emits a zero row with NULL shares") {
    // ids clustered: 0 and 99 only -> deciles 0 and 9 occupied
    val docs = Seq(0L, 99L).toDF("doc_id")
    val pairs = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    val rows = DedupOps.dupBurstOf(docs, pairs).collect()
    assert(rows.length == 10)
    val mid = rows.find(_.getAs[Long]("decile") == 5L).get
    assert(mid.getAs[Long]("n_docs") == 0L)
    assert(mid.isNullAt(mid.fieldIndex("dup_share")))
  }

  test("d26: sf fixture — spine complete, members reconcile with the " +
      "pair graph") {
    val rows = DedupOps.d26DupBurst(spark, sf0001).collect()
    assert(rows.map(_.getAs[Long]("decile")).toSeq == (0L to 9L))
    val nDup = rows.map(_.getAs[Long]("n_dup")).sum
    val nodes = DedupOps.pairGraph(spark, sf0001)
      .select("doc_a").union(
        DedupOps.pairGraph(spark, sf0001).select("doc_b"))
      .distinct().count()
    assert(nDup == nodes)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_redup") <= r.getAs[Long]("n_dup"))
    }
  }
}
