package graft.ops

import graft.SparkTestBase

/** m12_release_staleness: stale-share arithmetic and the exact-integer
  * compaction boundary on a planted pack + manifest.
  */
class ReleaseStalenessSpec extends SparkTestBase {
  import spark.implicits._

  test("m12: stale share and the compact flag fire exactly at " +
      "stale*2 >= total; non-released statuses all count stale") {
    // shard 0: released 60 B + near_dup 40 B -> stale 0.4, 80 < 100
    //   -> keep. shard 1: filtered 50 B only -> stale 1.0 -> compact.
    // shard 2: released 30 B + capped 30 B -> stale 0.5, 60 >= 60
    //   -> compact fires exactly AT the boundary.
    val pack = Seq(
      (1L, 60L, 0L), (2L, 40L, 0L),
      (3L, 50L, 1L),
      (4L, 30L, 2L), (5L, 30L, 2L))
      .toDF("doc_id", "n_bytes", "shard_id")
    val manifest = Seq(
      (1L, "released"), (2L, "near_dup"), (3L, "filtered"),
      (4L, "released"), (5L, "capped"))
      .toDF("doc_id", "status")
    val out = MediaOps.releaseStalenessFrom(pack, manifest).collect()
      .map(r => r.getAs[Long]("shard_id") -> r).toMap
    val s0 = out(0L)
    assert(s0.getAs[Long]("n_items") == 2L &&
      s0.getAs[Long]("n_bytes") == 100L &&
      s0.getAs[Long]("live_items") == 1L &&
      s0.getAs[Long]("live_bytes") == 60L)
    assert(math.abs(s0.getAs[Double]("stale_share") - 0.4) < 1e-12)
    assert(s0.getAs[Long]("compact") == 0L)
    val s1 = out(1L)
    assert(s1.getAs[Long]("live_items") == 0L &&
      s1.getAs[Double]("stale_share") == 1.0 &&
      s1.getAs[Long]("compact") == 1L)
    val s2 = out(2L)
    assert(math.abs(s2.getAs[Double]("stale_share") - 0.5) < 1e-12)
    assert(s2.getAs[Long]("compact") == 1L) // boundary: 30*2 == 60
  }

  test("m12: an all-zero-byte shard is consistent — stale_share 0.0 " +
      "(never NULL) and compact 0 (ADVICE r11)") {
    val pack = Seq((1L, 0L, 0L), (2L, 0L, 0L), (3L, 10L, 1L))
      .toDF("doc_id", "n_bytes", "shard_id")
    val manifest = Seq((1L, "filtered"), (2L, "filtered"),
      (3L, "released")).toDF("doc_id", "status")
    val out = MediaOps.releaseStalenessFrom(pack, manifest).collect()
      .map(r => r.getAs[Long]("shard_id") -> r).toMap
    val s0 = out(0L)
    assert(!s0.isNullAt(s0.fieldIndex("stale_share")))
    assert(s0.getAs[Double]("stale_share") == 0.0)
    assert(s0.getAs[Long]("compact") == 0L)
    val s1 = out(1L) // fully-live real shard unaffected by the guard
    assert(s1.getAs[Double]("stale_share") == 0.0 &&
      s1.getAs[Long]("compact") == 0L)
  }
}
