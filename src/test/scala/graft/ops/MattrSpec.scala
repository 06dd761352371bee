package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** t29_mattr: the interval-contribution MATTR cross-checked against a
  * literal per-window brute force (slide every window, count distinct)
  * on the sf0.001 documents, plus the published boundary behaviors.
  */
class MattrSpec extends SparkTestBase {

  private val W = 20

  /** The definitionally-obvious MATTR: every window, one distinct. */
  private def brute(tokens: Array[String]): (Long, Long, Long, Double) = {
    val n = tokens.length
    val starts = if (n <= W) Seq(0) else 0 to (n - W)
    val sumDistinct =
      starts.map(i => tokens.slice(i, i + W).distinct.length.toLong).sum
    val nWindows = starts.length.toLong
    val mattr = sumDistinct.toDouble / (nWindows * math.min(W, n))
    (n.toLong, nWindows, sumDistinct, mattr)
  }

  test("t29: n_windows, vocab, sum_distinct and mattr match the " +
      "per-window brute force on every sf0.001 document") {
    val docs = graft.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1)).toMap
    val out = TextOps.t29Mattr(spark, sf0001).collect()
    assert(out.length == docs.size)
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val toks = docs(id)
      val (n, nWin, sumD, mattr) = brute(toks)
      assert(r.getAs[Long]("n_tokens") == n, s"doc $id n")
      assert(r.getAs[Long]("n_windows") == nWin, s"doc $id windows")
      assert(r.getAs[Long]("vocab") == toks.distinct.length.toLong,
        s"doc $id vocab")
      assert(r.getAs[Long]("sum_distinct") == sumD, s"doc $id sum")
      assert(math.abs(r.getAs[Double]("mattr") - mattr) < 1e-12,
        s"doc $id mattr")
    }
  }

  test("t29 boundaries: short docs degrade to plain TTR; an all-repeat " +
      "doc floors at 1/W; an all-distinct doc scores exactly 1.0") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a"),                          // n < W: MATTR = TTR = 2/3
      (2L, Array.fill(40)("x").mkString(" ")), // every window 1 distinct
      (3L, (1 to 40).map("t" + _).mkString(" ")) // every window W distinct
    ).toDF("doc_id", "text")
    val out = TextOps.mattrFrom(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Long]("n_windows") == 1L)
    assert(math.abs(out(1L).getAs[Double]("mattr") - 2.0 / 3) < 1e-15)
    assert(out(2L).getAs[Long]("sum_distinct") == 21L) // 21 windows x 1
    assert(math.abs(out(2L).getAs[Double]("mattr") - 1.0 / W) < 1e-15)
    assert(out(3L).getAs[Long]("sum_distinct") == 21L * W)
    assert(out(3L).getAs[Double]("mattr") == 1.0)
  }
}
