package graft.ops

import graft.SparkTestBase
import java.sql.Timestamp

/** w43_autocorr: lag-1/lag-24 Pearson over zero-filled hourly cells.
  * Expected values are recomputed in-spec from the planted count
  * arrays via the same exact-moment formula (integer moments, IEEE
  * sqrt), so the comparison is double-for-double.
  */
class AutocorrSpec extends SparkTestBase {
  import spark.implicits._

  /** (n, sx, sy, sxy, sxx, syy) -> r via the g04-style moment form. */
  private def pearson(xs: Seq[Long], lag: Int): Option[Double] = {
    val pairs = xs.dropRight(lag).zip(xs.drop(lag))
    val n = pairs.length.toLong
    val sx = pairs.map(_._1).sum
    val sy = pairs.map(_._2).sum
    val sxy = pairs.map(p => p._1 * p._2).sum
    val sxx = pairs.map(p => p._1 * p._1).sum
    val syy = pairs.map(p => p._2 * p._2).sum
    val (vx, vy) = (n * sxx - sx * sx, n * syy - sy * sy)
    if (vx > 0 && vy > 0)
      Some((n * sxy - sx * sy).toDouble /
        (math.sqrt(vx.toDouble) * math.sqrt(vy.toDouble)))
    else None
  }

  private def plant(counts: Map[String, Seq[Long]]) = {
    val base = Timestamp.valueOf("2025-03-01 00:00:00").getTime
    counts.toSeq.flatMap { case (ty, xs) =>
      xs.zipWithIndex.flatMap { case (x, h) =>
        (1L to x).map(i =>
          (ty, new Timestamp(base + h * 3600000L + i * 60000L)))
      }
    }.toDF("event_type", "ts")
  }

  test("w43: periodic series scores lag-24 r = 1; alternating series lag-1 r = -1") {
    // a: period-24 pattern over 3 days (5 at hour 0 of each day, else 1)
    val a = (0 until 72).map(h => if (h % 24 == 0) 5L else 1L)
    // c: 1,0,1 (the middle cell is a REAL zero from the spine)
    val raw = plant(Map("a" -> a, "c" -> Seq(1L, 0L, 1L)))
    val rows = RelOps.w43AutocorrOf(raw).collect()
    val m = rows.map(r =>
      (r.getAs[String]("event_type"), r.getAs[Long]("lag")) ->
        ((r.getAs[Long]("n_pairs"), Option(r.getAs[Any]("autocorr"))))).toMap
    assert(m(("a", 24L)) == ((48L, pearson(a, 24))))
    // y == x pair-for-pair: r is 1 up to the sqrt(a)*sqrt(a) != a
    // 1-ulp residue (the engine and the recompute agree bit-for-bit)
    assert(math.abs(pearson(a, 24).get - 1.0) < 1e-15)
    assert(m(("a", 1L)) == ((71L, pearson(a, 1))))
    // c at lag 1: pairs (1,0),(0,1) -> exactly -1
    assert(m(("c", 1L)) == ((2L, Some(-1.0))))
    // c's 3-hour span has no lag-24 pairs: no row, not a zero row
    assert(!m.contains(("c", 24L)))
    graft.Caches.unpersistAll()
  }

  test("w43: constant series has no variance, autocorr NULL not NaN") {
    val raw = plant(Map("b" -> Seq.fill(30)(2L)))
    val rows = RelOps.w43AutocorrOf(raw).collect()
    assert(rows.length == 2) // lags 1 and 24 both have pairs
    rows.foreach { r =>
      assert(r.getAs[Any]("autocorr") == null)
      assert(r.getAs[Long]("n_pairs") > 0)
    }
    graft.Caches.unpersistAll()
  }

  test("w43: sf fixture — bounded r, both lags present per type") {
    val rows = RelOps.w43Autocorr(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      Option(r.getAs[Any]("autocorr")).foreach { v =>
        val d = v.asInstanceOf[Double]
        assert(d >= -1.0 - 1e-12 && d <= 1.0 + 1e-12)
      }
    }
    val byType = rows.groupBy(_.getAs[String]("event_type"))
    byType.foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Long]("lag")).toSet == Set(1L, 24L))
    }
  }
}
