package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** m08_shard_pack: contiguous-fill shard assignment. Pins the two-phase
  * prefix sum against the naive global statement on a fixture that
  * crosses bucket boundaries, and the boundary-straddle convention.
  */
class ShardPackSpec extends SparkTestBase {
  import spark.implicits._

  test("m08: hand-computed pack with a boundary-straddling item") {
    // cap 100: starts 0,60,110,190,260 -> shards 0,0,1,1,2. Item at
    // start 60 (size 50) straddles byte 100 but belongs to shard 0
    // (start-offset convention).
    val sized = Seq(
      (1L, "a", 60L), (2L, "a", 50L), (3L, "b", 80L),
      (4L, "b", 70L), (5L, "c", 40L)
    ).toDF("doc_id", "kind", "n_bytes")
    val rows = MediaOps.shardPack(sized, 100L).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("shard_id"),
        r.getAs[Long]("shard_offset")))
    assert(rows.toSeq == Seq(
      (1L, 0L, 0L), (2L, 0L, 60L), (3L, 1L, 10L),
      (4L, 1L, 90L), (5L, 2L, 60L)))
  }

  test("m08: bucketed two-phase starts equal the naive global cumsum") {
    // doc_ids span multiple 256-buckets with gaps; the reconstructed
    // start (shard_id * cap + shard_offset) must equal the exclusive
    // global running total in doc_id order.
    val ids = Seq(3L, 100L, 255L, 256L, 257L, 700L, 1024L, 1500L)
    val sized = ids.zipWithIndex
      .map { case (id, i) => (id, "x", (i + 1) * 7L) }
      .toDF("doc_id", "kind", "n_bytes")
    val cap = 50L
    val rows = MediaOps.shardPack(sized, cap).collect()
    var running = 0L
    ids.zipWithIndex.foreach { case (id, i) =>
      val r = rows.find(_.getAs[Long]("doc_id") == id).get
      val start = r.getAs[Long]("shard_id") * cap +
        r.getAs[Long]("shard_offset")
      assert(start == running, s"doc $id start $start != $running")
      running += (i + 1) * 7L
    }
  }
}
