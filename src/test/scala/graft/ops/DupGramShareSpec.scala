package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** d30_dup_gram_share: the corpus-wide per-doc commonness signal
  * cross-checked against an independent in-memory recomputation on the
  * sf0.001 documents, plus planted extremes.
  */
class DupGramShareSpec extends SparkTestBase {

  private def gramsOf(text: String): Set[String] = {
    val t = text.split(" ", -1)
    val n = math.max(t.length - 3, 1)
    (1 to n).map(i => t.slice(i - 1, i + 3).mkString(" ")).toSet
  }

  test("d30: n_grams, dup counts, share and majority flag match an " +
      "independent recomputation on every sf0.001 document") {
    val docs = graft.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val gsets = docs.map { case (id, t) => id -> gramsOf(t) }
    val dfCount = gsets.values.flatten
      .groupBy(identity).map { case (g, occ) => g -> occ.size }
    val out = DedupOps.d30DupGramShare(spark, sf0001).collect()
    assert(out.length == docs.size)
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val gs = gsets(id)
      val dup = gs.count(g => dfCount(g) >= 2).toLong
      assert(r.getAs[Long]("n_grams") == gs.size.toLong, s"doc $id grams")
      assert(r.getAs[Long]("n_dup_grams") == dup, s"doc $id dup")
      assert(math.abs(r.getAs[Double]("dup_share") -
        dup.toDouble / gs.size) < 1e-15, s"doc $id share")
      assert(r.getAs[Long]("mostly_dup") ==
        (if (2 * dup >= gs.size) 1L else 0L), s"doc $id flag")
    }
    graft.Caches.unpersistAll()
  }

  test("d30 extremes: verbatim duplicates share 1.0; a disjoint-vocab " +
      "doc shares 0.0; a half-copied doc sits between") {
    import spark.implicits._
    val dupText = (1 to 30).map("c" + _).mkString(" ")
    val docs = Seq(
      (1L, dupText), (2L, dupText), // verbatim pair: every gram df=2
      (3L, (1 to 30).map("u" + _).mkString(" ")), // disjoint vocab
      // first half copies the dup pair's opening tokens, second half
      // is unique -> 0 < share < 1
      (4L, ((1 to 14).map("c" + _) ++ (1 to 16).map("v" + _)).mkString(" "))
    ).toDF("doc_id", "text")
    val out = DedupOps.dupGramShare(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Double]("dup_share") == 1.0)
    assert(out(2L).getAs[Double]("dup_share") == 1.0)
    assert(out(1L).getAs[Long]("mostly_dup") == 1L)
    assert(out(3L).getAs[Double]("dup_share") == 0.0)
    assert(out(3L).getAs[Long]("mostly_dup") == 0L)
    val s4 = out(4L).getAs[Double]("dup_share")
    assert(s4 > 0.0 && s4 < 1.0, s"half-copy share $s4")
    graft.Caches.unpersistAll()
  }
}
