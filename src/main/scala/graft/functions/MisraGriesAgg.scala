package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import scala.collection.mutable

/** graft_heavy_keys(key string, capacity) — Misra-Gries heavy-hitter
  * candidate summary as a TypedImperativeAggregate. One global agg =
  * one pass: every partition keeps a bounded `capacity`-entry counter
  * map (map-side partial), partials merge associatively, and only
  * partition-count x capacity entries ever reach the reducer — the
  * full key cardinality NEVER shuffles, which is the whole point at
  * 100 TB (a groupBy(key).count() heavy-hitter query shuffles the
  * entire vocabulary/user-id space).
  *
  * Returns struct(n BIGINT, keys ARRAY<STRING> sorted): `n` is the
  * EXACT total row count (tracked alongside the sketch), `keys` the
  * candidate set. Guarantee (standard MG + mergeability): any key with
  * true frequency > n/(capacity+1) is in `keys`. The summary
  * under-counts, so candidates must be exact-counted afterwards — the
  * consumer joins the corpus against the (tiny) candidate set and
  * filters on the real threshold, making the OUTPUT exact and
  * deterministic while only candidate keys are ever aggregated by key.
  */
case class MisraGriesAgg(
    key: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MisraGriesAgg.MGBuf] {
  import MisraGriesAgg.MGBuf

  override def children: Seq[Expression] = Seq(key)
  override def nullable: Boolean = false
  // counts are aligned with keys: MG LOWER BOUNDS (true count >= count
  // >= true count - n/(capacity+1)), exposed so a streaming consumer
  // can carry the summary itself as state and keep merging
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType), StructField("keys", ArrayType(StringType)),
    StructField("counts", ArrayType(LongType))))
  override def prettyName: String = "graft_heavy_keys"

  override def checkInputDataTypes(): TypeCheckResult =
    if (key.dataType == StringType && capacity >= 1)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_heavy_keys needs (string, positive int literal), got " +
        s"(${key.dataType}, $capacity)")

  override def createAggregationBuffer(): MGBuf =
    new MGBuf(0L, mutable.HashMap.empty)

  override def update(buf: MGBuf, input: InternalRow): MGBuf = {
    val k = key.eval(input)
    if (k != null) {
      buf.n += 1
      // .toString copies out of Spark's reused row buffer — storing the
      // UTF8String itself would alias mutating memory
      val s = k.asInstanceOf[UTF8String].toString
      buf.m.get(s) match {
        case Some(c) => buf.m(s) = c + 1
        case None if buf.m.size < capacity => buf.m(s) = 1L
        case None =>
          // classic MG miss-on-full: decrement every counter, drop zeros
          // (O(capacity), only on misses — bounded by design)
          val dead = mutable.ArrayBuffer.empty[String]
          buf.m.foreach { case (kk, c) =>
            if (c == 1L) dead += kk else buf.m(kk) = c - 1
          }
          dead.foreach(buf.m.remove)
      }
    }
    buf
  }

  override def merge(buf: MGBuf, other: MGBuf): MGBuf =
    MisraGriesAgg.mergeInto(buf, other, capacity)

  override def eval(buf: MGBuf): Any = {
    val keys = buf.m.keys.toArray.sorted
    new GenericInternalRow(Array[Any](buf.n,
      new GenericArrayData(keys.map(UTF8String.fromString(_))),
      new GenericArrayData(keys.map(buf.m(_)))))
  }

  override def serialize(buf: MGBuf): Array[Byte] = {
    val entries = buf.m.toSeq.map { case (k, c) =>
      (k.getBytes(StandardCharsets.UTF_8), c)
    }
    val bb = ByteBuffer.allocate(
      8 + 4 + entries.map(e => 4 + e._1.length + 8).sum)
    bb.putLong(buf.n)
    bb.putInt(entries.size)
    entries.foreach { case (kb, c) =>
      bb.putInt(kb.length); bb.put(kb); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MGBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new MGBuf(bb.getLong, mutable.HashMap.empty)
    val size = bb.getInt
    (0 until size).foreach { _ =>
      val kb = new Array[Byte](bb.getInt)
      bb.get(kb)
      buf.m(new String(kb, StandardCharsets.UTF_8)) = bb.getLong
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesAgg =
    copy(key = newChildren(0))
}

object MisraGriesAgg {
  /** Counter map + the EXACT processed-row count (exactness of `n` is
    * what lets the consumer state a precise share threshold).
    */
  final class MGBuf(var n: Long, val m: mutable.HashMap[String, Long])

  /** The mergeable-summaries reduction (Agarwal et al.): sum counters,
    * then subtract the (capacity+1)-th largest count and drop
    * non-positives — error stays <= n/(capacity+1). Shared by the
    * aggregate's partial merge and by streaming consumers that carry a
    * summary as state across micro-batches.
    */
  def mergeInto(buf: MGBuf, other: MGBuf, capacity: Int): MGBuf = {
    buf.n += other.n
    other.m.foreach { case (k, c) =>
      buf.m(k) = buf.m.getOrElse(k, 0L) + c
    }
    if (buf.m.size > capacity) {
      val d = buf.m.values.toArray.sorted(Ordering[Long].reverse)(capacity)
      val dead = mutable.ArrayBuffer.empty[String]
      buf.m.foreach { case (k, c) =>
        if (c - d <= 0L) dead += k else buf.m(k) = c - d
      }
      dead.foreach(buf.m.remove)
    }
    buf
  }
}
