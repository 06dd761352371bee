package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** t28_dsir_weights: weights cross-checked against an independent
  * in-memory recomputation (own md5 bucketing, own counts), plus the
  * directional invariant the sampler relies on.
  */
class DsirWeightsSpec extends SparkTestBase {
  import spark.implicits._

  private def bucketOf(token: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(token.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 8), 16) % 1024
  }

  private def bits(c: Long): Long =
    63L - java.lang.Long.numberOfLeadingZeros(c)

  test("t28: engine weights equal an independent recomputation on a " +
      "mixed-lang fixture, and a target-vocabulary doc outscores a " +
      "disjoint-vocabulary doc") {
    val docs = Seq(
      (1L, "de", "haus baum fluss berg"),
      (2L, "de", "haus baum strasse turm"),
      (3L, "en", "haus baum fluss berg"), // shares de vocabulary
      (4L, "en", "table chair window door"), // disjoint vocabulary
      (5L, "en", "table chair haus haus"))
      .toDF("doc_id", "lang", "text")
    val rows = Seq(
      (1L, "de", Seq("haus", "baum", "fluss", "berg")),
      (2L, "de", Seq("haus", "baum", "strasse", "turm")),
      (3L, "en", Seq("haus", "baum", "fluss", "berg")),
      (4L, "en", Seq("table", "chair", "window", "door")),
      (5L, "en", Seq("table", "chair", "haus", "haus")))
    // independent counts per bucket
    val all = rows.flatMap { case (_, lang, ts) => ts.map(t => (lang, bucketOf(t))) }
    val cr = all.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val ct = all.filter(_._1 == "de").groupBy(_._2).view
      .mapValues(_.size.toLong).toMap
    // the published recipe's per-token normalization constant
    // log(Nr/Nt) in the same bit-bucket form (ADVICE r11)
    val nr = all.size.toLong
    val nt = all.count(_._1 == "de").toLong
    val norm = bits(nr + 1) - bits(nt + 1)
    val expected = rows.map { case (id, _, ts) =>
      id -> ts.map { t =>
        val b = bucketOf(t)
        bits(ct.getOrElse(b, 0L) + 1) - bits(cr(b) + 1) + norm
      }.sum
    }.toMap
    val out = TextOps.dsirWeightsFrom(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("dsir_weight"), r.getAs[Long]("n_tokens"),
          r.getAs[Double]("mean_bits"))).toMap
    expected.foreach { case (id, w) =>
      assert(out(id)._1 == w, s"doc $id weight")
      assert(math.abs(out(id)._3 - w.toDouble / out(id)._2) < 1e-15)
    }
    // the de-vocabulary en doc must outscore the disjoint-vocab en doc
    assert(out(3L)._1 > out(4L)._1,
      s"target-like ${out(3L)._1} !> disjoint ${out(4L)._1}")
    graft.Caches.unpersistAll()
  }
}
