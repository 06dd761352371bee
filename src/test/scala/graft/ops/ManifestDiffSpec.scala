package graft.ops

import graft.SparkTestBase

/** m10_manifest_diff: per-shard reconciliation of the m09 incremental
  * append against an m08 full repack, hand-computed at tiny capacity.
  */
class ManifestDiffSpec extends SparkTestBase {
  import spark.implicits._

  private def diff(rows: Seq[(Long, Long, Long)], cap: Long) =
    MediaOps.manifestDiffOf(
      rows.toDF("doc_id", "n_bytes", "is_batch"), cap)
      .collect().map(r => (r.getAs[Long]("shard_id"),
        (r.getAs[Long]("repack_items"), r.getAs[Long]("repack_bytes"),
          r.getAs[Long]("append_items"), r.getAs[Long]("append_bytes"),
          r.getAs[String]("status")))).toMap

  test("m10: match vs changed — same totals, different layout, " +
      "fingerprint catches it") {
    // corpus d0,d1,d2,d5 (4B each), batch d3,d4 (4B each), cap 10.
    // repack (doc order):  d0@s0:0 d1@s0:4 d2@s0:8 d3@s1:2 d4@s1:6 d5@s2:0
    // append (corpus+batch): d0@s0:0 d1@s0:4 d2@s0:8 d5@s1:2 d3@s1:6 d4@s2:0
    val d = diff(Seq((0L, 4L, 0L), (1L, 4L, 0L), (2L, 4L, 0L),
      (5L, 4L, 0L), (3L, 4L, 1L), (4L, 4L, 1L)), 10L)
    assert(d(0L) == ((3L, 12L, 3L, 12L, "match")))
    // shard 1 holds 2 items / 8 bytes under BOTH manifests but with
    // different members — only the fingerprint flags the rewrite
    assert(d(1L) == ((2L, 8L, 2L, 8L, "changed")))
    assert(d(2L) == ((1L, 4L, 1L, 4L, "changed")))
  }

  test("m10: repack_only and append_only tail shards") {
    // corpus {d0=1B, d9=8B}, batch {d5=1B}, cap 5, total 10B.
    // append: d0@s0:0 d9@s0:1 d5@s1:4   repack: d0@s0:0 d5@s0:1 d9@s0:2
    val d = diff(Seq((0L, 1L, 0L), (9L, 8L, 0L), (5L, 1L, 1L)), 5L)
    assert(d(0L)._5 == "changed")
    assert(d(1L) == ((0L, 0L, 1L, 1L, "append_only")))
    // mirrored: batch doc is large, top corpus doc small, cap 4.
    // append: d9@s0:0 d3@s0:2   repack: d3@s0:0 d9@s2:1
    val e = diff(Seq((9L, 2L, 0L), (3L, 9L, 1L)), 4L)
    assert(e(0L)._5 == "changed")
    assert(e(2L) == ((1L, 2L, 0L, 0L, "repack_only")))
  }

  test("m10: sf fixture — byte totals reconcile and statuses are " +
      "well-formed") {
    val rows = MediaOps.m10ManifestDiff(spark, sf0001).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("repack_bytes")).sum ==
      rows.map(_.getAs[Long]("append_bytes")).sum)
    rows.foreach { r =>
      r.getAs[String]("status") match {
        case "append_only" => assert(r.getAs[Long]("repack_items") == 0L)
        case "repack_only" => assert(r.getAs[Long]("append_items") == 0L)
        case "match" =>
          assert(r.getAs[Long]("repack_items") ==
            r.getAs[Long]("append_items"))
          assert(r.getAs[Long]("repack_bytes") ==
            r.getAs[Long]("append_bytes"))
        case "changed" =>
          assert(r.getAs[Long]("repack_items") > 0L)
          assert(r.getAs[Long]("append_items") > 0L)
        case other => fail(s"unknown status $other")
      }
    }
  }
}
