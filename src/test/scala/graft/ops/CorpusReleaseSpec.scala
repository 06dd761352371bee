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

  test("q26: the serving view carries ONLY released docs, per-source " +
      "splits reconcile, shares sum to 1, top_docs is the 5 largest " +
      "in token-desc/id-asc order") {
    // planted manifest: source a has 7 released docs (one of every
    // size 10..70, mixed splits) + a near_dup + a filtered doc that
    // must NOT serve; source b has 2 released docs
    val manifest = Seq(
      (1L, 10L, "released", "train"), (2L, 20L, "released", "val"),
      (3L, 30L, "released", "train"), (4L, 40L, "released", "test"),
      (5L, 50L, "released", "train"), (6L, 60L, "released", "train"),
      (7L, 70L, "released", "train"),
      (8L, 99L, "near_dup", null), (9L, 99L, "filtered", null),
      (20L, 5L, "released", "train"), (21L, 5L, "released", "val"))
      .toDF("doc_id", "n_tokens", "status", "split")
    val docs = ((1L to 9L).map(i => (i, "a")) ++
      Seq((20L, "b"), (21L, "b"))).toDF("doc_id", "source")
    val out = PipelineOps.releaseServingFrom(docs, manifest)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out.keySet == Set("a", "b"))
    val a = out("a")
    assert(a.getAs[Long]("n_released") == 7L)
    assert(a.getAs[Long]("n_train") == 5L &&
      a.getAs[Long]("n_val") == 1L && a.getAs[Long]("n_test") == 1L)
    assert(a.getAs[Long]("released_tokens") == 280L)
    // top 5 of source a by (n_tokens desc, doc_id asc): 7,6,5,4,3
    assert(a.getAs[String]("top_docs") == "7,6,5,4,3")
    val b = out("b")
    assert(b.getAs[Long]("n_released") == 2L &&
      b.getAs[Long]("released_tokens") == 10L)
    // a token-count tie serves the smaller doc_id first
    assert(b.getAs[String]("top_docs") == "20,21")
    // shares partition the release
    assert(math.abs(out.values.map(_.getAs[Double]("token_share")).sum
      - 1.0) < 1e-9)
    graft.Caches.unpersistAll()
  }

  test("p34: released bench members and 4-gram overlaps are counted " +
      "per (split, source); non-released docs never enter the rollup") {
    // doc 0 (0 % 97 == 0): an eval-suite member the pipeline RELEASED
    // -> n_bench_docs hazard. doc 97: an eval member kept out of the
    // release (filtered) — its grams still poison. doc 1: released,
    // shares doc 97's 4-gram -> contaminated. doc 2/3: clean released.
    // doc 4: near_dup — must not appear in any cell.
    val docs = Seq(
      (0L, "s", "b0a b0b b0c b0d b0e"),
      (97L, "s", "evalx evaly evalz evalw tailq"),
      (1L, "s", "pre1 evalx evaly evalz evalw post1"),
      (2L, "s", "clean2a clean2b clean2c clean2d clean2e"),
      (3L, "s", "clean3a clean3b clean3c clean3d clean3e"),
      (4L, "s", "dupa dupb dupc dupd dupe"))
      .toDF("doc_id", "source", "text")
    val manifest = Seq(
      (0L, 10L, "released", Some("train")),
      (97L, 99L, "filtered", None: Option[String]),
      (1L, 20L, "released", Some("train")),
      (2L, 30L, "released", Some("train")),
      (3L, 40L, "released", Some("val")),
      (4L, 50L, "near_dup", None: Option[String]))
      .toDF("doc_id", "n_tokens", "status", "split")
    val out = PipelineOps.releaseDecontamFrom(docs, manifest).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(out.keySet == Set(("train", "s"), ("val", "s")))
    val tr = out(("train", "s"))
    assert(tr.getAs[Long]("n_released") == 3L)
    assert(tr.getAs[Long]("n_bench_docs") == 1L) // doc 0
    assert(tr.getAs[Long]("n_contam") == 1L) // doc 1, never bench doc 0
    assert(tr.getAs[Long]("contam_tokens") == 20L)
    assert(math.abs(tr.getAs[Double]("contam_rate") - 1.0 / 3) < 1e-9)
    val va = out(("val", "s"))
    assert(va.getAs[Long]("n_released") == 1L &&
      va.getAs[Long]("n_contam") == 0L &&
      va.getAs[Long]("n_bench_docs") == 0L)
    graft.Caches.unpersistAll()
  }

  test("p35: train docs pack into 2000-token shards by start offset — " +
      "a straddling doc stays in the shard its start falls in — and " +
      "non-train rows never enter the plan") {
    val manifest = Seq(
      // (doc_id, n_tokens, status, split, pos)
      (10L, 900L, "released", Some("train"), Some(0L)),
      (11L, 900L, "released", Some("train"), Some(1L)),
      // starts at 1800 < 2000 -> shard 0, though it ends at 2700
      (12L, 900L, "released", Some("train"), Some(2L)),
      (13L, 500L, "released", Some("train"), Some(3L)), // starts 2700
      (14L, 600L, "released", Some("train"), Some(4L)), // starts 3200
      (15L, 999L, "released", Some("val"), None: Option[Long]),
      (16L, 999L, "capped", None: Option[String], None: Option[Long]))
      .toDF("doc_id", "n_tokens", "status", "split", "pos")
    val out = PipelineOps.releaseShardsFrom(manifest).collect()
      .map(r => r.getAs[Long]("shard_id") -> r).toMap
    assert(out.keySet == Set(0L, 1L))
    val s0 = out(0L)
    assert(s0.getAs[Long]("n_docs") == 3L &&
      s0.getAs[Long]("n_tokens") == 2700L &&
      s0.getAs[Long]("first_pos") == 0L &&
      s0.getAs[Long]("last_pos") == 2L)
    assert(math.abs(s0.getAs[Double]("fill_rate") - 1.35) < 1e-9)
    val s1 = out(1L)
    assert(s1.getAs[Long]("n_docs") == 2L &&
      s1.getAs[Long]("n_tokens") == 1100L &&
      s1.getAs[Long]("first_pos") == 3L &&
      s1.getAs[Long]("last_pos") == 4L)
  }

  test("p36: a clean release ships; a bench-released doc, a " +
      "contaminated released doc of ANY split, or a broken split mix " +
      "each refuse") {
    def manifest(rows: Seq[(Long, Long, String, Option[String])]) =
      rows.toDF("doc_id", "n_tokens", "status", "split")
    // clean: 10 released (8 train / 1 val / 1 test), no bench member,
    // disjoint vocabulary from the bench doc 97 (which stays filtered)
    val cleanDocs = ((1L to 10L).map(i =>
      (i, "s", s"c$i-a c$i-b c$i-c c$i-d c$i-e")) :+
      (97L, "s", "evalx evaly evalz evalw tailq"))
      .toDF("doc_id", "source", "text")
    val cleanM = manifest((1L to 10L).map(i =>
      (i, 10L, "released",
        Some(if (i <= 8) "train" else if (i == 9L) "val" else "test"))) :+
      ((97L, 9L, "filtered", None: Option[String])))
    val clean = PipelineOps.releaseSignoffFrom(cleanDocs, cleanM)
      .collect().head
    assert(clean.getAs[Long]("n_released") == 10L &&
      clean.getAs[Long]("n_train") == 8L &&
      clean.getAs[Long]("n_bench_released") == 0L &&
      clean.getAs[Long]("n_contam_released") == 0L &&
      clean.getAs[Long]("split_mix_ok") == 1L &&
      clean.getAs[Long]("ship") == 1L)
    graft.Caches.unpersistAll()
    // poisoned: doc 1's text now shares doc 97's 4-gram AND doc 0 (a
    // bench member, 0 % 97 == 0) is released -> both hazards fire
    val badDocs = (Seq(
      (0L, "s", "b0a b0b b0c b0d b0e"),
      (1L, "s", "pre evalx evaly evalz evalw post")) ++
      (2L to 10L).map(i => (i, "s", s"c$i-a c$i-b c$i-c c$i-d c$i-e")) :+
      ((97L, "s", "evalx evaly evalz evalw tailq")))
      .toDF("doc_id", "source", "text")
    val badM = manifest(Seq(
      (0L, 10L, "released", Some("train"))) ++
      (1L to 10L).map(i => (i, 10L, "released",
        Some(if (i <= 8) "train" else if (i == 9L) "val" else "test"))) :+
      ((97L, 9L, "filtered", None: Option[String])))
    val bad = PipelineOps.releaseSignoffFrom(badDocs, badM)
      .collect().head
    assert(bad.getAs[Long]("n_bench_released") == 1L) // doc 0
    assert(bad.getAs[Long]("n_contam_released") == 1L) // doc 1
    assert(bad.getAs[Long]("ship") == 0L)
    graft.Caches.unpersistAll()
    // a released VAL doc overlapping the eval suite blocks ship too —
    // the hazard covers every released split, matching p34 (ADVICE r11)
    val valDocs = (Seq(
      (9L, "s", "pre evalx evaly evalz evalw post")) ++
      ((1L to 8L) ++ Seq(10L)).map(i =>
        (i, "s", s"c$i-a c$i-b c$i-c c$i-d c$i-e")) :+
      ((97L, "s", "evalx evaly evalz evalw tailq")))
      .toDF("doc_id", "source", "text")
    val valBad = PipelineOps.releaseSignoffFrom(valDocs, cleanM)
      .collect().head
    assert(valBad.getAs[Long]("n_contam_released") == 1L) // doc 9 (val)
    assert(valBad.getAs[Long]("n_bench_released") == 0L &&
      valBad.getAs[Long]("split_mix_ok") == 1L)
    assert(valBad.getAs[Long]("ship") == 0L)
    graft.Caches.unpersistAll()
    // mix check alone refuses: 10 released, all train (share 1.0)
    val allTrainM = manifest((1L to 10L).map(i =>
      (i, 10L, "released", Some("train"))))
    val mix = PipelineOps.releaseSignoffFrom(cleanDocs, allTrainM)
      .collect().head
    assert(mix.getAs[Long]("split_mix_ok") == 0L &&
      mix.getAs[Long]("ship") == 0L &&
      mix.getAs[Long]("n_contam_released") == 0L)
    graft.Caches.unpersistAll()
  }

  test("p33: transition cells partition the new corpus, new-batch docs " +
      "land in 'absent', and a cross-release split flip is counted as " +
      "a migration") {
    // old release: 1 released/train, 2 released/val, 3 capped.
    // new release: 1 still released but now VAL (family merge moved its
    // split hash -> MIGRATION), 2 unchanged, 3 promoted to released,
    // 7 is the new batch doc (absent before), filtered on arrival.
    val oldM = Seq(
      (1L, 10L, "released", Some("train")),
      (2L, 10L, "released", Some("val")),
      (3L, 10L, "capped", None: Option[String]))
      .toDF("doc_id", "n_tokens", "status", "split")
    val newM = Seq(
      (1L, 10L, "released", Some("val")),
      (2L, 10L, "released", Some("val")),
      (3L, 10L, "released", Some("train")),
      (7L, 10L, "filtered", None: Option[String]))
      .toDF("doc_id", "n_tokens", "status", "split")
    val out = PipelineOps.releaseDiffFrom(newM, oldM).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_split_migrations")))
      .toMap
    assert(out == Map(
      ("released", "released") -> (2L, 1L), // doc 1 migrated, doc 2 not
      ("capped", "released") -> (1L, 0L),   // doc 3: cap freed up
      ("absent", "filtered") -> (1L, 0L)))  // the new batch doc
    // cells partition the NEW corpus
    assert(out.values.map(_._1).sum == newM.count())
  }
}
