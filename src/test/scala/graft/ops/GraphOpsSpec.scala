package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over planted edge sets: triangle counts / local
  * clustering coefficients against hand-computed values AND a brute-force
  * three-way-join recount, and the integer-exact PageRank against a
  * hand-unrolled 3-iteration computation plus its regular-graph fixpoint
  * and partitioning-invariance properties.
  */
class GraphOpsSpec extends SparkTestBase {
  import spark.implicits._

  private def edges(pairs: (Long, Long)*): DataFrame =
    pairs.toDF("doc_a", "doc_b")

  // 4-clique {1,2,3,4} + path 5-6-7 + triangle {8,9,10}
  private def planted: DataFrame = edges(
    1L -> 2L, 1L -> 3L, 1L -> 4L, 2L -> 3L, 2L -> 4L, 3L -> 4L,
    5L -> 6L, 6L -> 7L,
    8L -> 9L, 8L -> 10L, 9L -> 10L)

  test("g01: hand-computed counts on clique + path + triangle") {
    val rows = GraphOps.triangleStats(planted).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("degree"), r.getAs[Long]("n_triangles"),
          r.getAs[Double]("local_cc")))).toMap
    // 4-clique: deg 3, C(3,2)=3 closed wedges each, cc = 2*3/(3*2) = 1.0
    Seq(1L, 2L, 3L, 4L).foreach { n => assert(rows(n) == ((3L, 3L, 1.0))) }
    // path: middle node has an open wedge, cc 0; ends are degree-1
    assert(rows(5L) == ((1L, 0L, 0.0)))
    assert(rows(6L) == ((2L, 0L, 0.0)))
    assert(rows(7L) == ((1L, 0L, 0.0)))
    // plain triangle: cc 1.0
    Seq(8L, 9L, 10L).foreach { n => assert(rows(n) == ((2L, 1L, 1.0))) }
  }

  test("g01: total equals the brute-force three-way-join recount") {
    // naive recount: every (a < b < c) with all three edges present
    val p = planted
    val naive = p.as("e1")
      .join(p.as("e2"), col("e2.doc_a") === col("e1.doc_b"))
      .join(p.as("e3"), col("e3.doc_a") === col("e1.doc_a") &&
        col("e3.doc_b") === col("e2.doc_b"))
      .count()
    assert(naive == 5) // C(4,3) + 1
    val total = GraphOps.triangleStats(planted)
      .agg(sum(col("n_triangles"))).head().getLong(0)
    assert(total == 3 * naive) // each triangle counted at its 3 corners
  }

  test("g01: star hub closes nothing (orientation survives skew)") {
    val star = edges((1L to 20L).map(i => 0L -> (i + 100)): _*)
    val rows = GraphOps.triangleStats(star).collect()
    assert(rows.forall(_.getAs[Long]("n_triangles") == 0L))
    val hub = rows.find(_.getAs[Long]("doc_id") == 0L).get
    assert(hub.getAs[Long]("degree") == 20L)
    assert(hub.getAs[Double]("local_cc") == 0.0)
  }

  test("g02: hand-unrolled 3 iterations on a 3-node path") {
    // a-b-c: deg(a)=deg(c)=1, deg(b)=2; all integer arithmetic:
    // r1: a=c=150000+85*500000/100=575000, b=150000+85*2000000/100=1850000
    // r2: a=c=936250, b=1127500; r3: a=c=629187 (trunc .5), b=1741625
    val ranks = GraphOps.pagerank(edges(1L -> 2L, 2L -> 3L)).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("rank")).toMap
    assert(ranks == Map(1L -> 629187L, 2L -> 1741625L, 3L -> 629187L))
  }

  test("g02: regular graphs are an exact fixpoint at 1,000,000") {
    // 5-cycle: every node degree 2 -> each round returns exactly
    // 150000 + 85% of 1000000 = 1000000; integer arithmetic is exact
    val cycle = edges(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L, 1L -> 5L)
    val ranks = GraphOps.pagerank(cycle).collect()
    assert(ranks.length == 5)
    assert(ranks.forall(_.getAs[Long]("rank") == 1000000L))
  }

  test("g02: partitioning-invariant (integer sums cannot reorder)") {
    val base = GraphOps.pagerank(planted).collect().toSeq
    val shuffled = GraphOps.pagerank(planted.repartition(7)).collect().toSeq
    assert(base == shuffled)
  }
}
