package graft.ops

import graft.SparkTestBase

/** t27_surprisal_terciles: hand-computed CCNet head/middle/tail
  * bucketing on a planted corpus (t08's bit-bucket surprisal).
  */
class SurprisalTercilesSpec extends SparkTestBase {
  import spark.implicits._

  test("t27: hand-computed terciles, ranking key, and cell means on a " +
      "3-doc source") {
    // corpus: x appears 6 times, y 3, z/w/v once -> bits: x=2, y=1,
    // z/w/v=0; n_total = 12 -> bits(12) = 3.
    //   d1 = 4x       : sum_bucket 8, mb_milli 2,000,000 -> head
    //   d2 = 2x 2y    : sum_bucket 6, mb_milli 1,500,000 -> middle
    //   d3 = y z w v  : sum_bucket 1, mb_milli   250,000 -> tail
    val docs = Seq(
      (1L, "s", "x x x x"),
      (2L, "s", "x x y y"),
      (3L, "s", "y z w v"))
      .toDF("doc_id", "source", "text")
    val out = TextOps.surprisalTercilesFrom(docs).collect()
      .map(r => r.getAs[Long]("tercile") -> r).toMap
    assert(out.keySet == Set(0L, 1L, 2L))
    assert(out(0L).getAs[String]("bucket") == "head")
    assert(out(1L).getAs[String]("bucket") == "middle")
    assert(out(2L).getAs[String]("bucket") == "tail")
    assert(out.values.forall(_.getAs[Long]("n_docs") == 1L))
    // mean surprisal per cell: (bits(12)*n_tokens - sum_bucket)/n_tokens
    assert(math.abs(out(0L).getAs[Double]("mean_surprisal_bits")
      - (3.0 * 4 - 8) / 4) < 1e-12) // 1.0
    assert(math.abs(out(1L).getAs[Double]("mean_surprisal_bits")
      - (3.0 * 4 - 6) / 4) < 1e-12) // 1.5
    assert(math.abs(out(2L).getAs[Double]("mean_surprisal_bits")
      - (3.0 * 4 - 1) / 4) < 1e-12) // 2.75
  }

  test("t27: tercile arithmetic on a 4-doc source is (3*(rk-1)) div n " +
      "— two heads, one middle, one tail — and sources rank " +
      "independently") {
    // source a: 4 docs with strictly decreasing commonness; source b:
    // 1 doc (rank 1 of 1 -> tercile 0 = head).
    val docs = Seq(
      (1L, "a", "p p p p p p p p"), // p cf=8+2+1=11? see below
      (2L, "a", "p p q q"),
      (3L, "a", "q r s t"),
      (4L, "a", "u v w x1"),
      (5L, "b", "p y y y"))
      .toDF("doc_id", "source", "text")
    val out = TextOps.surprisalTercilesFrom(docs).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("tercile")) ->
        r.getAs[Long]("n_docs")).toMap
    // doc ranks in a by mb_milli desc: d1 > d2 > d3 > d4 (p is the
    // corpus-commonest token, singles have bucket 0); terciles of
    // ranks 1..4 over n=4: 0, 0, 1, 2
    assert(out(("a", 0L)) == 2L)
    assert(out(("a", 1L)) == 1L)
    assert(out(("a", 2L)) == 1L)
    assert(out(("b", 0L)) == 1L)
    assert(!out.contains(("b", 1L)) && !out.contains(("b", 2L)))
  }
}
