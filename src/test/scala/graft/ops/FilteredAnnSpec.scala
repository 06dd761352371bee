package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** s26_filtered_ann: every neighbor satisfies the predicate, and on a
  * planted clustered corpus (where the index's cells mean something)
  * the widened probe keeps recall against the TRUE filtered top-5.
  * On the uniform sf fixture the operator is hash-checked against the
  * identical DuckDB statement instead — recall there is a property of
  * the corpus geometry, not of the plan.
  */
class FilteredAnnSpec extends SparkTestBase {
  import spark.implicits._

  test("s26: predicate holds on every neighbor (sf fixture)") {
    val ann = SimOps.s26FilteredAnn(spark, sf0001).collect()
    assert(ann.nonEmpty)
    assert(ann.forall(_.getAs[Long]("neighbor_id") % 3 == 1),
      "a neighbor escaped the metadata filter")
    graft.Caches.unpersistAll()
  }

  test("s26: filtered recall@5 >= 0.9 on a planted clustered corpus") {
    // 20 clusters of 50; ~1/3 of each cluster passes the filter, so the
    // filtered top-5 stay overwhelmingly same-cluster and nProbe=4
    // covers the home cell with room for competitors.
    val vecs = graft.PlantedVectors.corpus(1000, 20)
    val qv = graft.PlantedVectors.quantized(vecs)
    val emb = vecs.toDF("vec_id", "embedding")
    val v = SimOps.prepareVectors(emb)
      .withColumn("label", expr("CAST(vec_id DIV 50 AS INT)"))
    val got = SimOps.ivfTopK(v, col("vec_id") % 50 === 0,
        nProbe = 4, k = 5, corpusFilter = col("vec_id") % 3 === 1)
      .select("qid", "neighbor_id").as[(Long, Long)].collect()
    assert(got.forall(_._2 % 3 == 1))
    val byQ = got.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val queries = (0 until 1000 by 50).map(_.toLong)
    val recall = graft.PlantedVectors.recallAtKWhere(
      qv, byQ, queries, 5, _ % 3 == 1)
    info(f"filtered ANN recall@5 on clustered corpus: $recall%.3f")
    assert(recall >= 0.9, f"filtered recall@5 = $recall%.3f < 0.9")
    graft.Caches.unpersistAll()
  }
}
