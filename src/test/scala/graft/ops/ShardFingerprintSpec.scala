package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** m13_shard_fingerprint: the transfer-verification checksums
  * cross-checked against an independent in-memory recomputation, plus
  * the tamper property (one flipped payload byte moves exactly one
  * shard's fingerprint and nothing else).
  */
class ShardFingerprintSpec extends SparkTestBase {

  private def md5hex(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(b)
      .map("%02x".format(_)).mkString

  private def brute(docs: Seq[(Long, Array[Byte])], cap: Long)
      : Map[Long, (Long, Long, Long, Long, String)] = {
    // the lpad-to-12 member-order contract holds for 0 <= id < 10^12
    // (documented next to the lpad, ADVICE r12) — pin the fixture in it
    docs.foreach { case (id, _) =>
      assert(id >= 0L && id < 1000000000000L,
        s"fixture doc_id $id outside the lpad-to-12 order bound") }
    var start = 0L
    val rows = docs.sortBy(_._1).map { case (id, payload) =>
      val s = start; start += payload.length
      (id, payload.length.toLong, s / cap, md5hex(payload))
    }
    rows.groupBy(_._3).map { case (shard, ms) =>
      val member = ms.sortBy(_._1)
        .map(m => f"${m._1}%012d:${m._4}").mkString(",")
      shard -> (ms.size.toLong, ms.map(_._2).sum, ms.map(_._1).min,
        ms.map(_._1).max, md5hex(member.getBytes("UTF-8")))
    }
  }

  test("m13: every shard's counts, range and fingerprint match the " +
      "independent recomputation on the sf0.001 corpus") {
    val docs = graft.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).getBytes("UTF-8")).toSeq
    val expect = brute(docs, 8192L)
    val out = MediaOps.m13ShardFingerprint(spark, sf0001).collect()
    assert(out.length == expect.size)
    out.foreach { r =>
      val sid = r.getAs[Long]("shard_id")
      val (n, bytes, first, last, fp) = expect(sid)
      assert(r.getAs[Long]("n_docs") == n, s"shard $sid docs")
      assert(r.getAs[Long]("n_bytes") == bytes, s"shard $sid bytes")
      assert(r.getAs[Long]("first_doc") == first, s"shard $sid first")
      assert(r.getAs[Long]("last_doc") == last, s"shard $sid last")
      assert(r.getAs[String]("fingerprint") == fp, s"shard $sid fp")
    }
  }

  test("m13 tamper: flipping one payload byte moves exactly that " +
      "shard's fingerprint; same-length tampering leaves packing intact") {
    import spark.implicits._
    def frame(tamper: Boolean) = (0L until 40L).map { id =>
      val base = s"payload-$id-" + ("x" * 500)
      val text = if (tamper && id == 17L) base.dropRight(1) + "y" else base
      (id, text.getBytes("UTF-8"))
    }.toDF("doc_id", "payload")
    val clean = MediaOps.shardFingerprintOf(frame(tamper = false), 2048L)
      .collect().map(r => r.getLong(0) -> r.getString(5)).toMap
    val dirty = MediaOps.shardFingerprintOf(frame(tamper = true), 2048L)
      .collect().map(r => r.getLong(0) -> r.getString(5)).toMap
    assert(clean.keySet == dirty.keySet) // same-length => same packing
    val moved = clean.keySet.filter(s => clean(s) != dirty(s))
    assert(moved.size == 1, s"moved shards: $moved")
  }
}
