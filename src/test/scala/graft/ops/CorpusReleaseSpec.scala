package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** p31_corpus_release / p32_release_card: the composed release
  * pipeline's stage order, keeper promotion, and reconciliation
  * invariants.
  */
class CorpusReleaseSpec extends SparkTestBase {
  import spark.implicits._

  // 60 prose-like tokens -> passes every cascade rule (>= 40 tokens,
  // high stopword share, no repeated bigrams, diverse vocabulary)
  private def goodText(seed: Int): String =
    (0 until 30).flatMap(i => Seq("the", s"w$seed-$i")).mkString(" ")
  // fails the cascade on length (< 40 tokens)
  private val shortText = "tiny doc"

  private val noFam = Seq.empty[(Long, Long)].toDF("doc_id", "component")

  test("p31: stage priority is filtered > exact_dup > near_dup > " +
      "capped > released, and a dup of a FILTERED doc is judged on " +
      "its own text") {
    // 0: good keeper. 1: exact dup of 0 -> exact_dup. 2: filtered
    // (short). 3: exact dup of FILTERED 2 but itself short -> filtered
    // (its text fails on its own; the exact stage never sees it).
    val docs = Seq(
      (0L, "s", goodText(0)), (1L, "s", goodText(0)),
      (2L, "s", shortText), (3L, "s", shortText))
      .toDF("doc_id", "source", "text")
    val m = PipelineOps.releaseManifestFrom(docs, noFam)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(m(0L) == "released")
    assert(m(1L) == "exact_dup")
    assert(m(2L) == "filtered")
    assert(m(3L) == "filtered")
  }

  test("p31: near-dup keeper is the smallest SURVIVING family member — " +
      "a filtered family minimum promotes the next member") {
    // family {10, 11, 12}: 10 is filtered (short), so 11 is the
    // surviving keeper and 12 is near_dup; distinct texts (no exact
    // collision)
    val docs = Seq(
      (10L, "s", shortText), (11L, "s", goodText(11)),
      (12L, "s", goodText(12)))
      .toDF("doc_id", "source", "text")
    val fam = Seq((10L, 10L), (11L, 10L), (12L, 10L))
      .toDF("doc_id", "component")
    val m = PipelineOps.releaseManifestFrom(docs, fam)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(m(10L) == "filtered")
    assert(m(11L) == "released")
    assert(m(12L) == "near_dup")
  }

  test("p31: the per-source cap bites at 50 surviving docs, keeping " +
      "the 50 smallest salted hashes") {
    val docs = (0L until 60L).map(i => (i, "big", goodText(i.toInt)))
      .toDF("doc_id", "source", "text")
    val rows = PipelineOps.releaseManifestFrom(docs, noFam).collect()
    val byStatus = rows.groupBy(_.getString(2)).view.mapValues(_.length)
    assert(byStatus("released") == 50)
    assert(byStatus("capped") == 10)
    // the kept set must match p14's independent cap of the same docs
    val kept = PipelineOps.sourceCap(docs.select("doc_id", "source"), 50)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    rows.foreach { r =>
      val isReleased = r.getString(2) == "released"
      assert(isReleased == kept.contains(r.getLong(0)))
    }
  }

  test("p31: released docs carry a split, train docs a bijective " +
      "0..k-1 position; everything else carries NULLs") {
    val rows = PipelineOps.p31CorpusRelease(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val released = rows.filter(_.getString(2) == "released")
    assert(released.nonEmpty)
    rows.foreach { r =>
      val isRel = r.getString(2) == "released"
      assert((r.getAs[Any]("split") != null) == isRel)
      val isTrain = isRel && r.getAs[String]("split") == "train"
      assert((r.getAs[Any]("pos") != null) == isTrain)
    }
    val pos = rows.filter(_.getAs[Any]("pos") != null)
      .map(_.getAs[Long]("pos")).sorted
    assert(pos.toSeq == (0L until pos.length).toSeq)
  }

  test("p31/p32 reconcile: statuses partition the corpus, the filtered " +
      "set is exactly p09's rejects, and the card's shares sum to 1") {
    val m = PipelineOps.p31CorpusRelease(spark, sf0001).collect()
    val nDocs = graft.Tables.documents(spark, sf0001).count()
    assert(m.length == nDocs)
    val filtered = m.filter(_.getString(2) == "filtered")
      .map(_.getLong(0)).toSet
    val p09Rejects = PipelineOps.p09FilterCascade(spark, sf0001)
      .filter(col("keep") === 0L).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(filtered == p09Rejects)
    val card = PipelineOps.p32ReleaseCard(spark, sf0001).collect()
    assert(card.map(_.getAs[Long]("n_docs")).sum == nDocs)
    assert(math.abs(card.map(_.getAs[Double]("doc_share")).sum - 1.0) < 1e-9)
    assert(math.abs(card.map(_.getAs[Double]("token_share")).sum - 1.0) < 1e-9)
    // card rows reconcile with the manifest cell-for-cell
    val cells = m.groupBy(r => (r.getString(2),
      Option(r.getAs[String]("split")).getOrElse("-")))
      .view.mapValues(_.length).toMap
    card.foreach { r =>
      assert(cells((r.getString(0), r.getString(1))) ==
        r.getAs[Long]("n_docs"))
    }
  }
}
