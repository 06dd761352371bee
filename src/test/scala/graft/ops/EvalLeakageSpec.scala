package graft.ops

import graft.SparkTestBase

/** p26_eval_leakage: verbatim train→eval 8-gram leakage audit over the
  * family-safe split, hand-computed on planted texts.
  */
class EvalLeakageSpec extends SparkTestBase {
  import spark.implicits._

  private val phrase = "w1 w2 w3 w4 w5 w6 w7 w8" // exactly one 8-gram

  test("p26: a verbatim phrase shared train→eval is counted; clean " +
      "eval docs keep a zero row") {
    // doc 0 train contains the phrase twice-extended (2 leaked grams:
    // the 9-token text has 2 distinct 8-grams, eval doc shares both);
    // doc 1 eval repeats the full 9-token text; doc 2 eval is clean.
    val docs = Seq(
      (0L, s"$phrase w9"), (1L, s"$phrase w9"), (2L, "x1 x2 x3"))
      .toDF("doc_id", "text")
    val splits = Seq((0L, "train"), (1L, "test"), (2L, "val"))
      .toDF("doc_id", "split")
    val rows = PipelineOps.evalLeakageOf(docs, splits).collect()
    assert(rows.length == 2)
    val r1 = rows.find(_.getLong(0) == 1L).get
    assert(r1.getAs[Long]("n_leaked_grams") == 2L)
    assert(r1.getAs[Long]("example_train_doc") == 0L)
    val r2 = rows.find(_.getLong(0) == 2L).get
    assert(r2.getAs[Long]("n_leaked_grams") == 0L)
    assert(r2.getAs[Any]("example_train_doc") == null)
  }

  test("p26: example_train_doc is the smallest offender over all " +
      "shared grams") {
    val docs = Seq(
      (0L, s"$phrase"), (5L, s"$phrase"), (9L, s"$phrase"))
      .toDF("doc_id", "text")
    val splits = Seq((0L, "train"), (5L, "train"), (9L, "test"))
      .toDF("doc_id", "split")
    val r = PipelineOps.evalLeakageOf(docs, splits).head()
    assert(r.getAs[Long]("doc_id") == 9L)
    assert(r.getAs[Long]("n_leaked_grams") == 1L)
    assert(r.getAs[Long]("example_train_doc") == 0L)
  }

  test("p26 df-cap: capped == exact on a boilerplate-free fixture " +
      "(every train gram df <= maxDf)") {
    // three train docs share the phrase (df = 3), eval shares it too:
    // with maxDf >= 3 nothing is boilerplate and the capped audit must
    // be row-for-row the exact audit
    val docs = Seq(
      (0L, s"$phrase a1"), (1L, s"$phrase b1"), (2L, s"$phrase c1"),
      (3L, s"$phrase d1"), (4L, "x1 x2 x3"))
      .toDF("doc_id", "text")
    val splits = Seq((0L, "train"), (1L, "train"), (2L, "train"),
      (3L, "test"), (4L, "val")).toDF("doc_id", "split")
    val exact = PipelineOps.evalLeakageOf(docs, splits).collect().toSeq
    val capped = PipelineOps.evalLeakageOf(docs, splits, maxDf = 3L)
      .collect().toSeq
    assert(capped == exact)
  }

  test("p26 df-cap: a gram in more than maxDf train docs is dropped as " +
      "boilerplate; rarer leaks still count") {
    // boilerplate phrase in 3 train docs; a RARE 8-gram in exactly one
    // train doc; the eval doc carries both. maxDf = 2 drops the
    // boilerplate hit, keeps the rare one — and the example_train_doc
    // follows the surviving gram.
    val rare = "r1 r2 r3 r4 r5 r6 r7 r8"
    val docs = Seq(
      (0L, s"$phrase"), (1L, s"$phrase"), (2L, s"$phrase"),
      (5L, s"$rare"), (9L, s"$phrase"), (10L, s"$rare"))
      .toDF("doc_id", "text")
    val splits = Seq((0L, "train"), (1L, "train"), (2L, "train"),
      (5L, "train"), (9L, "test"), (10L, "test"))
      .toDF("doc_id", "split")
    val capped = PipelineOps.evalLeakageOf(docs, splits, maxDf = 2L)
      .collect()
    val r9 = capped.find(_.getLong(0) == 9L).get
    assert(r9.getAs[Long]("n_leaked_grams") == 0L,
      "boilerplate gram (df=3 > maxDf=2) must not count as leakage")
    assert(r9.getAs[Any]("example_train_doc") == null)
    val r10 = capped.find(_.getLong(0) == 10L).get
    assert(r10.getAs[Long]("n_leaked_grams") == 1L)
    assert(r10.getAs[Long]("example_train_doc") == 5L)
  }

  test("p26: sf fixture — output is the complete non-train spine of " +
      "p13's split, zero rows included") {
    val splits = PipelineOps.p13LeakageSafeSplit(spark, sf0001)
      .select("doc_id", "split")
    val nEval = splits.filter("split <> 'train'").count()
    val rows = PipelineOps.p26EvalLeakage(spark, sf0001).collect()
    assert(rows.length == nEval)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_leaked_grams")
      assert(n >= 0L)
      if (n == 0L) assert(r.getAs[Any]("example_train_doc") == null)
      else assert(r.getAs[Any]("example_train_doc") != null)
    }
  }
}
