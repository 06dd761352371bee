package graft.ops

import graft.SparkTestBase

/** t18_keyword_extract: top-3 terms per doc by the exact bit-bucket
  * TF-IDF, hand-computed on a 3-doc corpus including the all-zero-score
  * and fewer-than-3-terms cases.
  */
class KeywordExtractSpec extends SparkTestBase {
  import spark.implicits._

  test("t18: hand-computed ranks, ties, and short-doc row count") {
    // N=3 -> bits(3)=2. df: apple 1, banana 2, the 3, cherry 1,
    // durian 1. idf_bits: apple/cherry/durian 2-1=1; banana/the 2-2=0.
    val docs = Seq(
      (1L, "apple apple banana the"),
      (2L, "the banana cherry"),
      (3L, "the the durian")
    ).toDF("doc_id", "text")
    val rows = TextOps.keywordExtract(docs).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rank"),
        r.getAs[String]("token"), r.getAs[Long]("score")))
    assert(rows.toSeq == Seq(
      // d1: apple tf2 -> 2; banana/the score 0, token-alphabetical
      (1L, 1L, "apple", 2L), (1L, 2L, "banana", 0L), (1L, 3L, "the", 0L),
      // d2: cherry 1; zero-score tie banana < the
      (2L, 1L, "cherry", 1L), (2L, 2L, "banana", 0L), (2L, 3L, "the", 0L),
      // d3: only TWO distinct terms -> exactly two rows, never padded
      (3L, 1L, "durian", 1L), (3L, 2L, "the", 0L)))
  }
}
