package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** w24_scd2_asof tie rules, planted exactly: a version starting ON the
  * ship date applies (valid_from inclusive), same-date versions resolve
  * to the highest version_no (the empty half-open interval is skipped),
  * facts before the first version drop, and facts after the last version
  * read the current (valid_to = null) one.
  */
class Scd2AsofSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = s"$s 00:00:00"

  test("w24 core: boundary-inclusive, same-date, out-of-range cases") {
    val dim = Seq(
      (1L, "LOW", ts("2020-01-01"), 1L),
      (1L, "HIGH", ts("2020-02-01"), 2L),
      (2L, "A", ts("2020-03-01"), 1L), // empty [d, d) interval
      (2L, "B", ts("2020-03-01"), 2L)
    ).toDF("custkey", "priority", "vf", "version_no")
      .select(col("custkey"), col("priority"),
        col("vf").cast("timestamp").as("valid_from"), col("version_no"))
    val facts = Seq(
      (1L, 10L, 1, ts("2020-01-15")), // mid v1
      (1L, 11L, 1, ts("2020-02-01")), // ON the v2 boundary -> v2
      (1L, 12L, 1, ts("2019-12-31")), // before v1 -> dropped
      (1L, 13L, 1, ts("2021-06-01")), // after last boundary -> current v2
      (2L, 20L, 1, ts("2020-03-01")), // same-date versions -> v2 ("B")
      (2L, 21L, 1, ts("2020-04-01"))
    ).toDF("custkey", "l_orderkey", "l_linenumber", "sd")
      .select(col("custkey"), col("l_orderkey"), col("l_linenumber"),
        col("sd").cast("timestamp").as("l_shipdate"))
    val got = RelOps.scd2AsofCore(dim, facts).collect()
      .map(r => r.getAs[Long]("l_orderkey") ->
        ((r.getAs[String]("priority_at_ship"),
          r.getAs[Long]("version_no")))).toMap
    assert(got == Map(
      10L -> (("LOW", 1L)),
      11L -> (("HIGH", 2L)),
      13L -> (("HIGH", 2L)),
      20L -> (("B", 2L)),
      21L -> (("B", 2L))))
  }
}
