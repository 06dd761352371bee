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

  test("g06: hand-computed edge supports; path edges flag as chain links") {
    val rows = GraphOps.edgeSupport(planted).collect()
    val m = rows.map(r =>
      (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        ((r.getAs[Long]("support"), r.getAs[Long]("chain_link")))).toMap
    assert(m.size == 11) // one row per planted edge
    // 4-clique: every edge sits in exactly 2 triangles
    Seq(1L -> 2L, 1L -> 3L, 1L -> 4L, 2L -> 3L, 2L -> 4L, 3L -> 4L)
      .foreach { e => assert(m(e) == ((2L, 0L))) }
    // path edges have no common neighbor — the chain-link shape
    assert(m(5L -> 6L) == ((0L, 1L)))
    assert(m(6L -> 7L) == ((0L, 1L)))
    // plain triangle: support 1 each
    Seq(8L -> 9L, 8L -> 10L, 9L -> 10L).foreach { e =>
      assert(m(e) == ((1L, 0L)))
    }
    // degrees ride along: edge (1,2) joins two degree-3 corners
    val e12 = rows.find(r => r.getAs[Long]("doc_a") == 1L &&
      r.getAs[Long]("doc_b") == 2L).get
    assert(e12.getAs[Long]("deg_a") == 3L && e12.getAs[Long]("deg_b") == 3L)
  }

  test("g06: edge-support total reconciles with g01's corner total (both 3T)") {
    val bySupport = GraphOps.edgeSupport(planted)
      .agg(sum(col("support"))).head().getLong(0)
    val byCorner = GraphOps.triangleStats(planted)
      .agg(sum(col("n_triangles"))).head().getLong(0)
    assert(bySupport == byCorner && bySupport == 15L)
  }

  test("g06: star hub edges all chain-link (orientation survives skew)") {
    val star = edges((1L to 20L).map(i => 0L -> (i + 100)): _*)
    val rows = GraphOps.edgeSupport(star).collect()
    assert(rows.length == 20)
    assert(rows.forall(_.getAs[Long]("chain_link") == 1L))
  }

  private def labelsOf(pairs: (Long, Long)*): DataFrame = {
    // min-label components of the planted edges, computed by hand in
    // the fixtures below — here just (node -> given component) rows
    pairs.toDF("doc_id", "component")
  }

  test("g07: two equal triangles split modularity 0.25 + 0.25") {
    // m = 6; each triangle: e_c = 3, deg_sum = 6
    // edge_share = 1/2, deg_share_sq = 36/144 = 1/4, contrib = 1/4
    val pairs = edges(1L -> 2L, 2L -> 3L, 1L -> 3L,
      8L -> 9L, 9L -> 10L, 8L -> 10L)
    val labels = labelsOf(1L -> 1L, 2L -> 1L, 3L -> 1L,
      8L -> 8L, 9L -> 8L, 10L -> 8L)
    val rows = GraphOps.modularityOf(pairs, labels).collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_nodes") == 3L)
      assert(r.getAs[Long]("n_internal") == 3L)
      assert(r.getAs[Long]("deg_sum") == 6L)
      assert(r.getAs[Double]("edge_share") == 0.5)
      assert(r.getAs[Double]("deg_share_sq") == 0.25)
      assert(r.getAs[Double]("modularity_contrib") == 0.25)
    }
  }

  test("g07: a single component scores exactly zero (the chaining readout)") {
    val pairs = edges(1L -> 2L, 2L -> 3L, 1L -> 3L, 3L -> 4L)
    val labels = labelsOf(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L)
    val rows = GraphOps.modularityOf(pairs, labels).collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[Double]("edge_share") == 1.0)
    assert(rows.head.getAs[Double]("deg_share_sq") == 1.0)
    assert(rows.head.getAs[Double]("modularity_contrib") == 0.0)
  }

  test("g07: sf fixture — shares normalize, Q bounded") {
    val rows = GraphOps.g07Modularity(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val edgeShares = rows.map(_.getAs[Double]("edge_share"))
    assert(math.abs(edgeShares.sum - 1.0) < 1e-9) // every edge internal
    val q = rows.map(_.getAs[Double]("modularity_contrib")).sum
    assert(q >= 0.0 && q < 1.0)
    rows.foreach { r =>
      assert(r.getAs[Double]("modularity_contrib") ==
        r.getAs[Double]("edge_share") - r.getAs[Double]("deg_share_sq"))
    }
    graft.Caches.unpersistAll()
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

  private def kcoreMap(df: DataFrame): Map[Long, (Long, Long, Long)] =
    df.collect().map(r => r.getAs[Long]("doc_id") ->
      ((r.getAs[Long]("degree"), r.getAs[Long]("peel_round"),
        r.getAs[Long]("in_2core")))).toMap

  test("g03: triangle with a tail peels outside-in") {
    // triangle {1,2,3} + tail 3-4-5: node 5 falls round 1 (degree 1),
    // node 4 falls round 2 (exposed), the triangle is the 2-core
    val g = edges(1L -> 2L, 2L -> 3L, 1L -> 3L, 3L -> 4L, 4L -> 5L)
    val m = kcoreMap(GraphOps.kcorePeel(g, rounds = 4))
    assert(m(5L) == ((1L, 1L, 0L)))
    assert(m(4L) == ((2L, 2L, 0L)))
    Seq(1L, 2L).foreach(n => assert(m(n) == ((2L, 0L, 1L))))
    assert(m(3L) == ((3L, 0L, 1L)))
  }

  test("g03: a clique never peels") {
    val m = kcoreMap(GraphOps.kcorePeel(edges(
      1L -> 2L, 1L -> 3L, 1L -> 4L, 2L -> 3L, 2L -> 4L, 3L -> 4L), 4))
    assert(m.values.forall { case (_, pr, core) => pr == 0L && core == 1L })
  }

  test("g03: deep path — fixed rounds under-peel, fixpoint completes") {
    // 10-node path: the 4-round unroll strips 4 node-pairs outside-in
    // and leaves {5, 6} flagged as core (the documented deterministic
    // under-peel); the fixpoint variant peels everything in 5 rounds
    val path = edges((1L to 9L).map(i => i -> (i + 1)): _*)
    val fixed = kcoreMap(GraphOps.kcorePeel(path, rounds = 4))
    Seq(1L -> 1L, 10L -> 1L, 2L -> 2L, 9L -> 2L, 3L -> 3L, 8L -> 3L,
      4L -> 4L, 7L -> 4L).foreach { case (n, r) =>
      assert(fixed(n)._2 == r, s"node $n expected peel round $r")
    }
    assert(fixed(5L) == ((2L, 0L, 1L)) && fixed(6L) == ((2L, 0L, 1L)))
    val (out, rounds, converged) = GraphOps.kcorePeelToFixpoint(path)
    assert(converged && rounds <= 7)
    val full = kcoreMap(out)
    assert(full.values.forall(_._3 == 0L), "a path has no 2-core")
    assert(full(5L)._2 == 5L && full(6L)._2 == 5L)
  }

  test("g03: fixpoint equals a driver-side reference peel on a random graph") {
    val rnd = new scala.util.Random(11)
    val es = (0 until 40).map { _ =>
      val a = rnd.nextInt(25).toLong
      val b = rnd.nextInt(25).toLong
      (math.min(a, b), math.max(a, b))
    }.filter(e => e._1 != e._2).distinct
    // reference: iterate removing degree-<2 nodes until stable
    var liveE = es.toSet
    var rounds = Map.empty[Long, Long]
    var r = 0L
    var changed = true
    while (changed) {
      r += 1
      val deg = liveE.toSeq.flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct
        .filterNot(rounds.contains)
      val drop = nodes.filter(n => deg.getOrElse(n, 0L) < 2).toSet
      changed = drop.nonEmpty
      if (changed) {
        rounds ++= drop.map(_ -> r)
        liveE = liveE.filterNot(e => drop(e._1) || drop(e._2))
      }
    }
    val (out, _, converged) = GraphOps.kcorePeelToFixpoint(edges(es: _*))
    assert(converged)
    val got = kcoreMap(out)
    es.flatMap(e => Seq(e._1, e._2)).distinct.foreach { n =>
      assert(got(n)._2 == rounds.getOrElse(n, 0L), s"node $n round")
      assert(got(n)._3 == (if (rounds.contains(n)) 0L else 1L))
    }
  }

  test("g04: star is perfectly disassortative, path is -0.5, regular is NULL") {
    // star hub-leaf pairing: r = -1 by hand (m=6, sx=12, sxy=18, sxx=30)
    val star = GraphOps.assortativityOf(
      edges(0L -> 1L, 0L -> 2L, 0L -> 3L)).collect().head
    assert(star.getAs[Long]("m") == 6L)
    assert(star.getAs[Double]("assortativity") == -1.0)
    // 4-path: degrees 1,2,2,1 -> r = -0.5 by hand
    val path = GraphOps.assortativityOf(
      edges(1L -> 2L, 2L -> 3L, 3L -> 4L)).collect().head
    assert(path.getAs[Double]("assortativity") == -0.5)
    // a 5-cycle is degree-regular: zero variance, r is NULL (an exact
    // integer test, never a float divide-by-zero)
    val cyc = GraphOps.assortativityOf(
      edges(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L, 1L -> 5L)).collect().head
    assert(cyc.isNullAt(cyc.fieldIndex("assortativity")))
    assert(cyc.getAs[Long]("n_edges") == 5L)
  }

  test("g03: 4 rounds are converged on the real fixture pair graph") {
    val pairs = DedupOps.pairGraph(spark, sf0001).select("doc_a", "doc_b")
    val fixed = kcoreMap(GraphOps.kcorePeel(pairs, rounds = 4))
    val (out, _, converged) = GraphOps.kcorePeelToFixpoint(pairs)
    assert(converged)
    assert(fixed == kcoreMap(out))
  }

  test("g05: hand-computed link scores on square + tail, confirmation " +
      "against a truth set") {
    // strict graph: square 1-2-3-4 + tail 4-5. Non-edges sharing
    // neighbors: (1,3) via {2,4} -> 2/(2+2-2)=1.0; (2,4) via {1,3} ->
    // 2/(2+3-2)=2/3; (1,5) and (3,5) via {4} -> 1/(2+1-1)=0.5.
    // truth additionally holds (1,3) -> only that suggestion confirms.
    val strict = edges(1L -> 2L, 2L -> 3L, 3L -> 4L, 1L -> 4L, 4L -> 5L)
    val truth = edges(1L -> 2L, 2L -> 3L, 3L -> 4L, 1L -> 4L, 4L -> 5L,
      1L -> 3L)
    val rows = GraphOps.linkPrediction(strict, truth).collect()
      .map(r => ((r.getAs[Long]("doc_x"), r.getAs[Long]("doc_y")),
        (r.getAs[Long]("n_common"), r.getAs[Long]("deg_x"),
          r.getAs[Long]("deg_y"), r.getAs[Double]("link_score"),
          r.getAs[Long]("confirmed"))))
    assert(rows.toSeq == Seq(
      (1L, 3L) -> ((2L, 2L, 2L, 1.0, 1L)),
      (1L, 5L) -> ((1L, 2L, 1L, 0.5, 0L)),
      (2L, 4L) -> ((2L, 2L, 3L, 2.0 / 3.0, 0L)),
      (3L, 5L) -> ((1L, 2L, 1L, 0.5, 0L))), s"got ${rows.mkString("; ")}")
    // no strict edge ever appears as a suggestion
    val sugg = rows.map(_._1).toSet
    Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (4L, 5L)).foreach { e =>
      assert(!sugg.contains(e))
    }
    graft.Caches.unpersistAll()
  }

  test("g09: degree-clustering curve hand-computed on triangle + tail") {
    // triangle {1,2,3} + tail 3-4: degrees 1:2 2:2 3:3 4:1
    val rows = GraphOps.degreeClusteringOf(
      edges(1L -> 2L, 1L -> 3L, 2L -> 3L, 3L -> 4L)).collect()
    // degree-1 node 4 is excluded (no defined coefficient)
    assert(rows.map(_.getAs[Long]("degree")).toSeq == Seq(2L, 3L))
    val d2 = rows(0)
    assert(d2.getAs[Long]("n_nodes") == 2L)
    assert(d2.getAs[Long]("n_triangles") == 2L)
    assert(d2.getAs[Double]("avg_cc") == 1.0) // both fully closed
    val d3 = rows(1) // the hub: 1 of its 3 wedge pairs closed
    assert(d3.getAs[Long]("n_nodes") == 1L)
    assert(d3.getAs[Double]("avg_cc") == 1.0 / 3)
    graft.Caches.unpersistAll()
  }

  test("g09: curve reconciles with the per-node g01 frame") {
    val perNode = GraphOps.triangleStats(planted).collect()
      .filter(_.getAs[Long]("degree") >= 2L)
    val want = perNode.groupBy(_.getAs[Long]("degree")).map {
      case (d, rs) => d -> (rs.length.toLong,
        rs.map(_.getAs[Long]("n_triangles")).sum)
    }
    val rows = GraphOps.degreeClusteringOf(planted).collect()
    rows.foreach { r =>
      val (n, t) = want(r.getAs[Long]("degree"))
      assert(r.getAs[Long]("n_nodes") == n)
      assert(r.getAs[Long]("n_triangles") == t)
      assert(r.getAs[Double]("avg_cc") ==
        2.0 * t / (n * r.getAs[Long]("degree") *
          (r.getAs[Long]("degree") - 1)))
    }
    graft.Caches.unpersistAll()
  }
}
