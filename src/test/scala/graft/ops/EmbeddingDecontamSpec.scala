package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** s35_embedding_decontam: planted clusters — only clusters holding an
  * eval anchor flag, and every flag points at the own-cluster anchor.
  */
class EmbeddingDecontamSpec extends SparkTestBase {
  import spark.implicits._

  test("s35: flags come only from clusters with an eval anchor and " +
      "point at it; anchor-free clusters stay clean") {
    // 10 clusters x 20; eval anchors (id % 97 == 0): 0 (cluster 0),
    // 97 (cluster 4), 194 (cluster 9). Same-cluster cosine ~0.9 >>
    // 0.35; cross-cluster ~0 — so flags must map 1:1 to own anchors.
    val n = 200
    val vecs = graft.PlantedVectors.corpus(n, 10)
    val v = SimOps.prepareVectors(vecs.toDF("vec_id", "embedding"))
    val out = SimOps.embeddingDecontamFrom(v).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Long]("nearest_eval_id"), r.getAs[Long]("n_eval_hits"),
          r.getAs[Double]("nearest_cosine"))).toMap
    assert(out.nonEmpty)
    val anchorOf = Map(0L -> 0L, 4L -> 97L, 9L -> 194L)
    out.foreach { case (id, (nearest, hits, cos)) =>
      val cluster = id / 20
      assert(anchorOf.get(cluster).contains(nearest),
        s"vec $id (cluster $cluster) flagged against $nearest")
      assert(hits >= 1L && cos >= 0.35)
      assert(id % 97 != 0, s"eval anchor $id flagged as train")
    }
    // each anchored cluster flags a healthy share of its 19 non-anchor
    // members (banding recall; same-cluster cosine is far above cut)
    anchorOf.foreach { case (cl, anchor) =>
      val flagged = out.keys.count(id => id / 20 == cl)
      assert(flagged >= 15, s"cluster $cl flagged only $flagged")
      assert(!out.contains(anchor))
    }
    // anchor-free clusters contribute nothing
    assert(out.keys.forall(id => anchorOf.contains(id / 20)))
    graft.Caches.unpersistAll()
  }
}
