package graft

/** Partition-count invariance: registered queries must produce
  * BIT-IDENTICAL results regardless of `spark.sql.shuffle.partitions`.
  * The suite runs at 4 and the driver's Verify at 32, so the property
  * already holds implicitly at those two points; this spec pins it at
  * the pathological ends (1 = everything in one task, 7 = a prime that
  * misaligns every evenly-split assumption) for the constructions most
  * exposed to partitioning:
  *
  *  - t09: the two-phase global ranking (per-cf offset + partition-
  *    local row_number) must reproduce the oracle's single global sort
  *    under ANY partitioning — the one construction whose entire point
  *    is avoiding a global sort without changing its answer.
  *  - d03: LSH band join + canonical pair dedup (join-order exposure).
  *  - w43: window lead + moment aggregation (map-side combine order).
  *  - p17: Hamilton apportionment + salted-hash pick (window ranking
  *    inside each source partition).
  *  - w47: top-20 basket selection with its (n_co DESC, a, b) total
  *    order (TakeOrdered under different partial orders).
  *  - w53: decimal TVD fold with its broadcast roster join.
  *
  * Floats make this meaningful: every double in these outputs is a
  * single division/sqrt of exact integers (the repo's arithmetic
  * discipline), so partition order CANNOT perturb them — a failure
  * here means an order-dependent float sum or an under-specified sort
  * crept into a query body.
  */
class PartitionInvarianceSpec extends SparkTestBase {

  private val queries = Seq("t09_zipf_fit", "d03_lsh_near_dup",
    "w43_autocorr", "p17_quota_sample", "w47_market_basket",
    "w53_t_closeness")

  test("representative queries are bit-identical at shuffle.partitions " +
      "1 and 7") {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    try {
      queries.foreach { name =>
        val fn = SparkEntry.queries(name)
        def run(parts: String): Seq[String] = {
          spark.conf.set(key, parts)
          // Row.toString renders decimals/doubles/timestamps at full
          // fidelity for equality purposes; collect order is the
          // query's own orderBy, which must itself be total
          val out = fn(spark, sf0001).collect().map(_.toString).toSeq
          graft.Caches.unpersistAll()
          out
        }
        val one = run("1")
        val seven = run("7")
        assert(one.nonEmpty, s"$name returned no rows at sf0.001")
        assert(one == seven,
          s"$name differs between 1 and 7 shuffle partitions — " +
            "an order-dependent aggregate or under-specified sort")
      }
    } finally spark.conf.set(key, prev)
  }
}
