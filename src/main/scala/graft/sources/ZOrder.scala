package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) layout helpers — the write-side and
  * query-side halves of Delta/Iceberg `OPTIMIZE ZORDER BY (a, b)`:
  *
  *   - WRITE: add `zCol` over the two (rank-scaled) dimensions, bucket
  *     with [[bucket]], then `repartition($"zb").write.partitionBy("zb")`
  *     (or `repartitionByRange` on the raw z for file-level clustering
  *     without directories). Every bucket is a cell of an aligned 2^k
  *     x 2^k grid, tight in BOTH dimensions.
  *   - QUERY: a rectangular predicate box maps to the bucket ids whose
  *     cell intersects it ([[bucketsFor]]) — an `isin` filter on the
  *     partition column that Catalyst prunes at FILE-LISTING time, so a
  *     selective predicate on EITHER dimension skips most of the data.
  *     A 1-D sorted layout can only prune on its leading dimension.
  *
  * All arithmetic is integer shift/mask — deterministic everywhere. The
  * bucket enumeration is driver-side over 4^bucketBits cells (64 for
  * the default 3 bits/dim) — O(grid), never O(data). At petabyte scale
  * the same three calls run unchanged; only `bits`/`bucketBits` grow
  * with the desired file count.
  */
object ZOrder {

  /** Interleave the low `bits` bits of nonnegative `a` (even positions)
    * and `b` (odd positions) into a 2*bits-bit z-value.
    */
  def zCol(a: Column, b: Column, bits: Int): Column =
    (0 until bits).map(i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
      .reduce(_ + _)

  /** Bucket id = top `bucketBits` bits of each dimension, interleaved:
    * z >> 2*(bits - bucketBits). An aligned 2^bucketBits x 2^bucketBits
    * grid over the scaled domain.
    */
  def bucket(z: Column, bits: Int, bucketBits: Int): Column =
    shiftright(z, 2 * (bits - bucketBits))

  /** Scalar twin of [[zCol]] for driver-side enumeration. */
  def zValue(a: Long, b: Long, bits: Int): Long =
    (0 until bits).map(i =>
      (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1)))
      .reduce(_ | _)

  /** All bucket ids whose grid cell intersects the CLOSED query box
    * [aLo..aHi] x [bLo..bHi] (in the scaled 2^bits domain). The isin()
    * filter this feeds is exact at the cell level: every matching row
    * lives in a returned bucket, and each returned bucket's cell
    * overlaps the box.
    */
  def bucketsFor(aLo: Long, aHi: Long, bLo: Long, bHi: Long,
      bits: Int, bucketBits: Int): Seq[Long] = {
    val cell = 1L << (bits - bucketBits)
    val n = 1 << bucketBits
    for {
      ca <- 0L until n
      if ca * cell <= aHi && (ca + 1) * cell - 1 >= aLo
      cb <- 0L until n
      if cb * cell <= bHi && (cb + 1) * cell - 1 >= bLo
    } yield zValue(ca, cb, bucketBits)
  }
}
