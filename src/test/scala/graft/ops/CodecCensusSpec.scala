package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** m11_codec_census: per-kind header-magic census with top-5 naming
  * and the OTHER rollup, hand-computed on planted payloads.
  */
class CodecCensusSpec extends SparkTestBase {
  import spark.implicits._

  private def media(rows: Seq[(String, String)]) =
    rows.toDF("kind", "txt")
      .select(col("kind"), encode(col("txt"), "UTF-8").as("payload"))

  test("m11: hand-computed magics, counts, shares") {
    // image: AAx AAy ABz -> magic 4141 (n=2, 6 bytes), 4142 (1, 3)
    val rows = MediaOps.codecCensusOf(media(Seq(
      ("image", "AAx"), ("image", "AAy"), ("image", "ABz")))).collect()
    assert(rows.length == 2)
    val top = rows(0)
    assert(top.getAs[String]("header_hex") == "4141")
    assert(top.getAs[Long]("n_items") == 2L)
    assert(top.getAs[Long]("n_bytes") == 6L)
    assert(top.getAs[Double]("item_share") == 2.0 / 3)
    assert(top.getAs[Double]("byte_share") == 6.0 / 9)
    assert(rows(1).getAs[String]("header_hex") == "4142")
  }

  test("m11: beyond five magics the tail rolls into OTHER") {
    // seven 1-count magics Aa..Ag: top-5 by (count, hex) named,
    // the two largest-hex magics roll up
    val rows = MediaOps.codecCensusOf(media(
      ('a' to 'g').map(c => ("audio", s"A$c-payload")))).collect()
    assert(rows.length == 6)
    val other = rows.find(_.getAs[String]("header_hex") == "OTHER").get
    assert(other.getAs[Long]("n_items") == 2L)
    assert(other.getAs[Double]("item_share") == 2.0 / 7)
    assert(rows.count(_.getAs[String]("header_hex") != "OTHER") == 5)
  }

  test("m11: sf fixture — shares sum to 1 per kind, OTHER last by count") {
    val rows = MediaOps.m11CodecCensus(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("kind")).foreach { case (_, rs) =>
      assert(math.abs(rs.map(_.getAs[Double]("item_share")).sum - 1.0)
        < 1e-9)
      assert(math.abs(rs.map(_.getAs[Double]("byte_share")).sum - 1.0)
        < 1e-9)
      assert(rs.length <= 6) // top-5 + OTHER
    }
  }
}
