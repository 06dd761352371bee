package graft.ops

import graft.SparkTestBase

/** d29_cross_lang_families: mixed-language dup families with dominant
  * language and deterministic tiebreaks, on planted labels.
  */
class CrossLangSpec extends SparkTestBase {
  import spark.implicits._

  test("d29: mixed family flagged, dominant lang and share computed") {
    // family 1: en,en,fr (cross, top en 2/3); family 2: zh,zh (mono)
    val fam = Seq((10L, 1L), (11L, 1L), (12L, 1L), (20L, 2L), (21L, 2L))
      .toDF("doc_id", "component")
    val langs = Seq((10L, "en"), (11L, "en"), (12L, "fr"),
      (20L, "zh"), (21L, "zh")).toDF("doc_id", "lang")
    val rows = DedupOps.crossLangFamiliesOf(fam, langs).collect()
    assert(rows.length == 2)
    val f1 = rows(0)
    assert(f1.getAs[Long]("family") == 1L)
    assert(f1.getAs[Long]("n_docs") == 3L)
    assert(f1.getAs[Long]("n_langs") == 2L)
    assert(f1.getAs[String]("langs_csv") == "en,fr")
    assert(f1.getAs[Long]("cross_lang") == 1L)
    assert(f1.getAs[String]("top_lang") == "en")
    assert(f1.getAs[Double]("top_lang_share") == 2.0 / 3.0)
    val f2 = rows(1)
    assert(f2.getAs[Long]("cross_lang") == 0L)
    assert(f2.getAs[String]("top_lang") == "zh")
    assert(f2.getAs[Double]("top_lang_share") == 1.0)
  }

  test("d29: dominant-lang tie breaks to the smaller lang") {
    val fam = Seq((1L, 5L), (2L, 5L)).toDF("doc_id", "component")
    val langs = Seq((1L, "fr"), (2L, "de")).toDF("doc_id", "lang")
    val r = DedupOps.crossLangFamiliesOf(fam, langs).head()
    assert(r.getAs[String]("top_lang") == "de")
    assert(r.getAs[Double]("top_lang_share") == 0.5)
  }

  test("d29: sf fixture — shares bounded, csv arity matches n_langs") {
    val rows = DedupOps.d29CrossLangFamilies(spark, sf0001).collect()
    rows.foreach { r =>
      val share = r.getAs[Double]("top_lang_share")
      assert(share > 0.0 && share <= 1.0)
      assert(r.getAs[String]("langs_csv").split(",").length ==
        r.getAs[Long]("n_langs"))
      assert((r.getAs[Long]("cross_lang") == 1L) ==
        (r.getAs[Long]("n_langs") > 1L))
    }
  }
}
