package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph analytics over the materialized near-dup pair graph
  * (`DedupOps.pairGraph`): triangle counting / clustering coefficients and
  * an integer-exact PageRank. The reference's dedup surface stops at
  * connected components (`/root/reference/src/assets/silver.py`); these are the
  * next two graph measurements a data-governance team runs on the same
  * edge set — how CLIQUE-LIKE the duplicate families are (triangle density
  * distinguishes a template farm from a chain of incremental edits) and
  * which documents are structurally central to the duplication.
  *
  * Cross-engine determinism: every number here is integer arithmetic
  * (counts, truncating integer division) or a single IEEE double division
  * of exact integers — bit-identical in Spark and DuckDB.
  *
  * 100 TB posture: no all-pairs or per-node-quadratic stage. Triangle
  * counting uses degree orientation (each edge directed from its
  * (degree, id)-smaller endpoint), the classic MapReduce-triangles bound:
  * every wedge is generated at its lowest-degree vertex, so total wedge
  * work is O(m^1.5) worst-case instead of sum(deg^2) — the hub that would
  * explode a naive neighbor self-join generates no wedges at all. PageRank
  * is the standard join+agg round, unrolled a fixed 3 iterations (like
  * d07's label rounds), all shuffles keyed on node id.
  */
object GraphOps {

  /** Symmetric (u, v) edge view of the canonical doc_a < doc_b pair graph. */
  private def symmetric(pairs: DataFrame): DataFrame =
    pairs.select(col("doc_a").as("u"), col("doc_b").as("v"))
      .union(pairs.select(col("doc_b").as("u"), col("doc_a").as("v")))

  /** Per-node degree over the symmetric edge view: (doc_id, degree). */
  private def degrees(pairs: DataFrame): DataFrame =
    symmetric(pairs).groupBy(col("u").as("doc_id"))
      .agg(count(lit(1)).as("degree"))

  /** Per-document triangle participation and local clustering coefficient
    * over the near-dup pair graph.
    *
    * Algorithm (Suri & Vassilvitskii MR triangle counting): orient each
    * undirected edge from its (degree, id)-smaller endpoint; wedges are
    * pairs of out-edges at a shared pivot (the triangle's unique minimum
    * vertex in that total order), closed by probing the canonical edge
    * set. Each triangle is produced exactly once, and per-pivot out-degree
    * is O(sqrt(m)), so wedge volume is O(m^1.5) regardless of hub skew.
    *
    * local_cc = 2*triangles / (degree*(degree-1)) — one IEEE division of
    * exact integers (0.0 for degree-1 nodes).
    */
  def g01TriangleCount(spark: SparkSession, dir: String): DataFrame = {
    val pairs = graft.Caches.cache(
      DedupOps.pairGraph(spark, dir).select("doc_a", "doc_b"))
    triangleStats(pairs)
  }

  /** g01's body over any canonical (doc_a < doc_b) distinct edge frame —
    * shared with the planted-graph spec.
    */
  private[graft] def triangleStats(pairs: DataFrame): DataFrame = {
    val deg = graft.Caches.cache(degrees(pairs))
    // Orient each edge toward the (degree, id)-larger endpoint. The
    // degree frame is near-dup-node-population-sized (same reasoning as
    // d15's family join) but NOT forced broadcast: at corpus scale both
    // joins hash-partition on the node id.
    val withDeg = pairs
      .join(deg.select(col("doc_id").as("doc_a"), col("degree").as("deg_a")),
        "doc_a")
      .join(deg.select(col("doc_id").as("doc_b"), col("degree").as("deg_b")),
        "doc_b")
    val aFirst = col("deg_a") < col("deg_b") ||
      (col("deg_a") === col("deg_b") && col("doc_a") < col("doc_b"))
    val oriented = graft.Caches.cache(withDeg.select(
      when(aFirst, col("doc_a")).otherwise(col("doc_b")).as("src"),
      when(aFirst, col("doc_b")).otherwise(col("doc_a")).as("dst")))
    // Wedges at the pivot: (x, y) canonicalized x < y so the closing
    // probe hits the doc_a < doc_b edge set directly.
    val wedges = oriented.select(col("src"), col("dst").as("x"))
      .join(oriented.select(col("src"), col("dst").as("y")), "src")
      .filter(col("x") < col("y"))
    val triangles = wedges.join(
      pairs.select(col("doc_a").as("x"), col("doc_b").as("y")), Seq("x", "y"))
    val perNode = triangles
      .select(col("src").as("doc_id"))
      .union(triangles.select(col("x").as("doc_id")))
      .union(triangles.select(col("y").as("doc_id")))
      .groupBy("doc_id").agg(count(lit(1)).as("n_triangles"))
    deg.join(perNode, Seq("doc_id"), "left")
      .select(col("doc_id"), col("degree"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
      .withColumn("local_cc",
        when(col("degree") >= 2,
          (lit(2) * col("n_triangles")).cast("double") /
            (col("degree") * (col("degree") - 1)))
          .otherwise(lit(0.0)))
      .orderBy("doc_id")
  }

  /** Integer-exact PageRank (3 iterations, damping 0.85) over the
    * symmetric pair graph. Ranks live in integer micro-units (start
    * 1,000,000 per node); each round is
    * rank' = 150000 + (85 * sum(rank(u) div degree(u))) div 100 with
    * truncating integer division — no floating point anywhere, so the
    * result is bit-identical across engines AND across partitionings
    * (float summation order can differ; integer sums cannot). Every node
    * of the pair graph has degree >= 1, so there are no dangling nodes.
    */
  def g02Pagerank(spark: SparkSession, dir: String): DataFrame = {
    val pairs = DedupOps.pairGraph(spark, dir).select("doc_a", "doc_b")
    pagerank(pairs)
  }

  /** g02's body over any canonical distinct edge frame (spec-shared). */
  private[graft] def pagerank(pairs: DataFrame, iters: Int = 3): DataFrame = {
    val edges = graft.Caches.cache(symmetric(pairs))
    val deg = degrees(pairs)
    var ranks = graft.Caches.cache(
      deg.withColumn("rank", lit(1000000L)))
    // Fixed unrolled rounds (the d07 discipline): one join + one agg per
    // round, both hash-keyed on the node id; the degree re-join rides the
    // same key. No driver-side reads inside the loop.
    for (_ <- 1 to iters) {
      val contrib = edges
        .join(ranks.withColumnRenamed("doc_id", "u"), "u")
        .select(col("v").as("doc_id"),
          expr("rank div degree").as("contrib"))
      val summed = contrib.groupBy("doc_id")
        .agg(sum(col("contrib")).as("s"))
      ranks = graft.Caches.cache(deg.join(summed, "doc_id")
        .select(col("doc_id"), col("degree"),
          (lit(150000L) + expr("(85 * s) div 100")).as("rank")))
    }
    ranks.select("doc_id", "degree", "rank").orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "g01_triangle_count" -> (g01TriangleCount _),
    "g02_pagerank" -> (g02Pagerank _)
  )

  private def graphSqlPrefix: String =
    s"""WITH pairs AS (SELECT doc_a, doc_b FROM (${DedupOps.d03Sql})),
       |edges AS (
       |  SELECT doc_a AS u, doc_b AS v FROM pairs
       |  UNION ALL SELECT doc_b, doc_a FROM pairs
       |),
       |deg AS (SELECT u AS doc_id, count(*) AS degree FROM edges GROUP BY u)""".stripMargin

  val oracle: Map[String, String] = Map(
    "g01_triangle_count" ->
      s"""$graphSqlPrefix,
         |tri AS (
         |  SELECT e1.doc_a AS a, e1.doc_b AS b, e2.doc_b AS c
         |  FROM pairs e1
         |  JOIN pairs e2 ON e2.doc_a = e1.doc_b
         |  JOIN pairs e3 ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b
         |),
         |tc AS (
         |  SELECT doc_id, count(*) AS n_triangles FROM (
         |    SELECT a AS doc_id FROM tri
         |    UNION ALL SELECT b FROM tri
         |    UNION ALL SELECT c FROM tri)
         |  GROUP BY doc_id
         |)
         |SELECT d.doc_id, d.degree,
         |       coalesce(tc.n_triangles, 0) AS n_triangles,
         |       CASE WHEN d.degree >= 2
         |            THEN CAST(2 * coalesce(tc.n_triangles, 0) AS DOUBLE)
         |                 / (d.degree * (d.degree - 1))
         |            ELSE CAST(0 AS DOUBLE) END AS local_cc
         |FROM deg d LEFT JOIN tc ON tc.doc_id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin,

    "g02_pagerank" -> {
      def round(k: Int): String =
        s"""r$k AS (
           |  SELECT d.doc_id, d.degree,
           |         150000 + (85 * CAST(sum(r.rank // r.degree) AS BIGINT))
           |           // 100 AS rank
           |  FROM edges e
           |  JOIN r${k - 1} r ON r.doc_id = e.u
           |  JOIN deg d ON d.doc_id = e.v
           |  GROUP BY d.doc_id, d.degree
           |)""".stripMargin
      s"""$graphSqlPrefix,
         |r0 AS (SELECT doc_id, degree, CAST(1000000 AS BIGINT) AS rank
         |       FROM deg),
         |${(1 to 3).map(round).mkString(",\n")}
         |SELECT doc_id, degree, rank FROM r3 ORDER BY doc_id""".stripMargin
    }
  )
}
