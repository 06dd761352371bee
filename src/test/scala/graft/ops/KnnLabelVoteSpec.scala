package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** s34_knn_label_vote: planted mislabeled cluster members are flagged
  * by their neighborhood's majority vote.
  */
class KnnLabelVoteSpec extends SparkTestBase {
  import spark.implicits._

  test("s34: a mislabeled cluster member lands in an off-diagonal " +
      "mismatch cell; clean members stay diagonal") {
    // 10 clusters x 20 members, labels = cluster id — except vectors
    // 0 and 105, which carry a WRONG label (99). Their banded top-3
    // neighbors are own-cluster members voting the true cluster label,
    // so both must land in (99 -> true-label) mismatch cells.
    val n = 200
    val k = 10
    val vecs = graft.PlantedVectors.corpus(n, k)
    val mislabeled = Map(0L -> 99L, 105L -> 99L)
    val emb = vecs.toDF("vec_id", "embedding")
    val v = SimOps.prepareVectors(emb)
      .withColumn("label",
        when(col("vec_id").isin(mislabeled.keys.toSeq: _*), 99L)
          .otherwise(expr(s"vec_id div ${n / k}")))
    val out = SimOps.knnLabelVoteOf(v).collect()
    val cells = out.map(r => (r.getAs[Long]("label"),
      r.getAs[Long]("voted_label")) ->
      (r.getAs[Long]("n_vectors"), r.getAs[Long]("is_mismatch"))).toMap
    // the two planted fakes: label 99, voted = their true cluster
    assert(cells((99L, 0L)) == (1L, 1L)) // vector 0: flagged mismatch
    assert(cells((99L, 5L)) == (1L, 1L)) // 105 div 20 = 5
    // every cell with label != voted_label >= 0 is flagged, diagonal not
    out.foreach { r =>
      val (l, vl, m) = (r.getAs[Long]("label"),
        r.getAs[Long]("voted_label"), r.getAs[Long]("is_mismatch"))
      assert(m == (if (vl >= 0 && vl != l) 1L else 0L), s"cell ($l,$vl)")
    }
    // clean diagonal mass dominates: each true label's diagonal cell
    // holds most of its 20 members (minus the planted fake)
    val diag0 = cells.get((0L, 0L)).map(_._1).getOrElse(0L)
    assert(diag0 >= 15L, s"cluster 0 diagonal only $diag0")
    graft.Caches.unpersistAll()
  }

  test("s34: a 1-1-1 plurality tie breaks FOR the vector's own label " +
      "and does not flag it (ADVICE r11)") {
    // one tight cluster of 4 (all pairs band together); labels: v0=2,
    // v1=1, v2=2, v3=3. v0's top-3 neighbors carry labels {1, 2, 3} —
    // a three-way tie. Old rule (smallest id) voted 1 and flagged a
    // correctly-labeled vector; the own-label tie-break votes 2.
    // v2 faces the same {1, 2, 3} tie -> 2. v1 sees {2, 2, 3} -> 2
    // (genuine majority, flagged); v3 sees {1, 2, 2} -> 2 (flagged).
    val vecs = graft.PlantedVectors.corpus(4, 1)
    val labels = Map(0L -> 2L, 1L -> 1L, 2L -> 2L, 3L -> 3L)
    val emb = vecs.toDF("vec_id", "embedding")
    val v = SimOps.prepareVectors(emb)
      .withColumn("label",
        element_at(typedLit(labels), col("vec_id")))
    val out = SimOps.knnLabelVoteOf(v).collect()
      .map(r => (r.getAs[Long]("label"), r.getAs[Long]("voted_label")) ->
        (r.getAs[Long]("n_vectors"), r.getAs[Long]("is_mismatch"))).toMap
    assert(out((2L, 2L)) == (2L, 0L), s"own-label tie cell: $out")
    assert(!out.contains((2L, 1L)), s"tie leaked to smallest id: $out")
    assert(out((1L, 2L)) == (1L, 1L) && out((3L, 2L)) == (1L, 1L),
      s"genuine majorities must still flag: $out")
    graft.Caches.unpersistAll()
  }
}
