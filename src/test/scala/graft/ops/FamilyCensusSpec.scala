package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** d25_family_census: the size histogram reconciles exactly with the
  * d07 component labeling and the corpus total.
  */
class FamilyCensusSpec extends SparkTestBase {

  test("d25: census sums back to the corpus and matches d07 families") {
    val census = DedupOps.d25FamilyCensus(spark, sf0001).collect()
    val nDocs = graft.Tables.documents(spark, sf0001).count()
    // completeness: every doc is in exactly one family
    assert(census.map(_.getAs[Long]("n_docs")).sum == nDocs)
    // n_docs is always size * families
    census.foreach { r =>
      assert(r.getAs[Long]("n_docs") ==
        r.getAs[Long]("family_size") * r.getAs[Long]("n_families"))
    }
    // multi-member rows reconcile with the independent d07 labeling
    val labels = DedupOps.d07NeardupComponents(spark, sf0001)
      .groupBy("component").agg(count(lit(1)).as("sz"))
    val multi = census.filter(_.getAs[Long]("family_size") >= 2L)
    assert(multi.map(_.getAs[Long]("n_families")).sum ==
      labels.filter(col("sz") >= 2).count())
    assert(multi.map(_.getAs[Long]("n_docs")).sum ==
      labels.filter(col("sz") >= 2)
        .agg(sum(col("sz"))).head().getLong(0))
    // the fixture plants near-dups: there must BE multi-member families
    assert(multi.nonEmpty)
  }
}
