package graft.ops

import graft.SparkTestBase

/** s30_cell_balance: IVF inverted-list balance with dead cells kept as
  * zero rows, hand-computed on a planted postings table.
  */
class CellBalanceSpec extends SparkTestBase {
  import spark.implicits._

  test("s30: hand-computed shares and load factors, dead cell kept") {
    // 4 cells, 8 postings: cell0=4, cell1=2, cell2=2, cell3 dead
    val cells = Seq(0L, 1L, 2L, 3L).toDF("cell")
    val postings = Seq(
      (10L, 0L), (11L, 0L), (12L, 0L), (13L, 0L),
      (14L, 1L), (15L, 1L), (16L, 2L), (17L, 2L))
      .toDF("vec_id", "cell")
    val rows = SimOps.cellBalanceOf(cells, postings).collect()
    assert(rows.length == 4)
    val byCell = rows.map(r => r.getAs[Long]("cell") ->
      (r.getAs[Long]("n_vectors"), r.getAs[Double]("share"),
        r.getAs[Double]("load_factor"))).toMap
    assert(byCell(0L) == ((4L, 0.5, 2.0)))
    assert(byCell(1L) == ((2L, 0.25, 1.0)))
    assert(byCell(2L) == ((2L, 0.25, 1.0)))
    assert(byCell(3L) == ((0L, 0.0, 0.0)))
  }

  test("s30: empty postings — every cell is a zero row, NULL shares") {
    val rows = SimOps.cellBalanceOf(
      Seq(0L, 1L).toDF("cell"),
      Seq.empty[(Long, Long)].toDF("vec_id", "cell")).collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_vectors") == 0L)
      assert(r.getAs[Any]("share") == null)
      assert(r.getAs[Any]("load_factor") == null)
    }
  }

  test("s30: sf fixture — shares sum to 1, mean load factor is 1") {
    val rows = SimOps.s30CellBalance(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val shares = rows.map(_.getAs[Double]("share"))
    assert(math.abs(shares.sum - 1.0) < 1e-9)
    val loads = rows.map(_.getAs[Double]("load_factor"))
    assert(math.abs(loads.sum / loads.length - 1.0) < 1e-9)
  }
}
