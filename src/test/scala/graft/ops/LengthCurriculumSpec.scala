package graft.ops

import graft.SparkTestBase

/** p28_length_curriculum: length-ordered fixed-size batches and the
  * padding each pays to its batch max, hand-computed at batch = 2.
  */
class LengthCurriculumSpec extends SparkTestBase {
  import spark.implicits._

  test("p28: hand-computed batches of 2 — padding to the batch max") {
    val docs = Seq((1L, 5L), (2L, 3L), (3L, 5L), (4L, 9L), (5L, 4L))
      .toDF("doc_id", "n_tokens")
    // length order: (3,#2) (4,#5) (5,#1) (5,#3) (9,#4)
    val rows = PipelineOps.lengthCurriculumOf(docs, 2L).collect()
    assert(rows.length == 3)
    val b0 = rows(0)
    assert(b0.getAs[Long]("n_docs") == 2L)
    assert(b0.getAs[Long]("min_len") == 3L)
    assert(b0.getAs[Long]("max_len") == 4L)
    assert(b0.getAs[Long]("sum_tokens") == 7L)
    assert(b0.getAs[Long]("padding") == 1L) // 2*4 - 7
    assert(b0.getAs[Double]("pad_share") == 1.0 / 8)
    val b1 = rows(1) // the two 5s — zero padding by construction
    assert(b1.getAs[Long]("padding") == 0L)
    assert(b1.getAs[Double]("pad_share") == 0.0)
    val b2 = rows(2) // short tail batch pads only to its own max
    assert(b2.getAs[Long]("n_docs") == 1L)
    assert(b2.getAs[Long]("max_len") == 9L)
    assert(b2.getAs[Long]("padding") == 0L)
  }

  test("p28: sf fixture — contiguous batches, non-overlapping length " +
      "ranges, token totals reconcile") {
    val rows = PipelineOps.p28LengthCurriculum(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val ids = rows.map(_.getAs[Long]("batch_id"))
    assert(ids.sameElements(0L to ids.max)) // gap-free, ordered
    rows.init.foreach(r => assert(r.getAs[Long]("n_docs") == 32L))
    // length-sorted curriculum: batch i's max never exceeds i+1's min
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("max_len") <= b.getAs[Long]("min_len"))
    case _ => ()
    }
    rows.foreach { r =>
      assert(r.getAs[Long]("padding") ==
        r.getAs[Long]("n_docs") * r.getAs[Long]("max_len") -
          r.getAs[Long]("sum_tokens"))
    }
    val total = graft.Tables.documents(spark, sf0001)
      .select(org.apache.spark.sql.functions.size(
        org.apache.spark.sql.functions.split(
          org.apache.spark.sql.functions.col("text"), " "))
        .cast("long").as("n"))
      .agg(org.apache.spark.sql.functions.sum("n")).head().getLong(0)
    assert(rows.map(_.getAs[Long]("sum_tokens")).sum == total)
  }
}
