package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** w50_churn_hazard: hand-computed risk sets and hazards against the
  * sf0.001 events (lifetimes recomputed independently in the spec).
  */
class ChurnHazardSpec extends SparkTestBase {
  import spark.implicits._

  test("w50: risk sets are suffix sums of the lifetime histogram, " +
      "hazards divide exactly, the t=0 row holds every user") {
    val out = RelOps.w50ChurnHazard(spark, sf0001).collect()
    assert(out.nonEmpty)
    // independent recomputation: lifetimes via a raw groupBy
    val life = graft.Tables.events(spark, sf0001)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .groupBy("user_id")
      .agg(datediff(max(col("day")), min(col("day"))).cast("long")
        .as("lifetime"))
      .collect().map(_.getLong(1))
    val hist = life.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val nUsers = life.length.toLong
    // first row is the smallest observed lifetime; its risk set is ALL
    // users (everyone survives at least to the minimum)
    assert(out.head.getAs[Long]("n_at_risk") == nUsers)
    out.foreach { r =>
      val t = r.getAs[Long]("t_days")
      val expChurn = hist(t)
      val expRisk = hist.filter(_._1 >= t).values.sum
      assert(r.getAs[Long]("n_churned") == expChurn, s"t=$t churned")
      assert(r.getAs[Long]("n_at_risk") == expRisk, s"t=$t risk")
      assert(math.abs(r.getAs[Double]("hazard")
        - expChurn.toDouble / expRisk) < 1e-15, s"t=$t hazard")
    }
    // rows are exactly the observed lifetimes, ascending
    val ts = out.map(_.getAs[Long]("t_days")).toSeq
    assert(ts == hist.keys.toSeq.sorted)
    // the largest lifetime's hazard is 1.0 (everyone at risk dies)
    assert(out.last.getAs[Double]("hazard") == 1.0)
  }
}
