package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** g08_degree_distribution: degree-frequency table with the corpus-spine
  * zero row and top-cumulative counts, hand-computed on a star+edge
  * fixture.
  */
class DegreeDistributionSpec extends SparkTestBase {
  import spark.implicits._

  test("g08: star + disjoint edge + isolated docs, hand-computed") {
    // star 0-{1,2,3} plus edge 4-5; corpus of 10 docs => 4 isolated.
    // degrees: node0=3; nodes1,2,3,4,5=1  => rows:
    //   deg0: 4 nodes, deg1: 5 nodes, deg3: 1 node
    val pairs = Seq((0L, 1L), (0L, 2L), (0L, 3L), (4L, 5L))
      .toDF("doc_a", "doc_b")
    val nDocs = Seq(1).toDF("x").agg(lit(10L).as("n_docs"))
    val rows = GraphOps.degreeDistributionOf(pairs, nDocs).collect()
    assert(rows.map(_.getAs[Long]("degree")).toSeq == Seq(0L, 1L, 3L))
    val by = rows.map(r => r.getAs[Long]("degree") ->
      (r.getAs[Long]("n_nodes"), r.getAs[Double]("node_share"),
        r.getAs[Long]("n_nodes_ge"))).toMap
    assert(by(0L) == ((4L, 0.4, 10L)))
    assert(by(1L) == ((5L, 0.5, 6L)))
    assert(by(3L) == ((1L, 0.1, 1L)))
  }

  test("g08: empty graph — a single all-isolated zero row") {
    val pairs = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    val nDocs = Seq(1).toDF("x").agg(lit(7L).as("n_docs"))
    val rows = GraphOps.degreeDistributionOf(pairs, nDocs).collect()
    assert(rows.length == 1)
    assert(rows(0).getAs[Long]("degree") == 0L)
    assert(rows(0).getAs[Long]("n_nodes") == 7L)
    assert(rows(0).getAs[Double]("node_share") == 1.0)
    assert(rows(0).getAs[Long]("n_nodes_ge") == 7L)
  }

  test("g08: sf fixture — shares sum to 1 and the cumulative column is " +
      "monotone down from the full corpus") {
    val rows = GraphOps.g08DegreeDistribution(spark, sf0001).collect()
    assert(rows.nonEmpty)
    assert(math.abs(rows.map(_.getAs[Double]("node_share")).sum - 1.0)
      < 1e-9)
    // rows come back ordered by degree asc; n_nodes_ge must decrease
    val ge = rows.map(_.getAs[Long]("n_nodes_ge")).toSeq
    assert(ge == ge.sorted.reverse)
    assert(ge.head == rows.map(_.getAs[Long]("n_nodes")).sum)
  }
}
