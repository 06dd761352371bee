package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.broadcast
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** CrossJoinGuard: the analysis-time cartesian-product guard on the
  * extensions deployment path. A big-big product must fail BEFORE
  * execution; every bounded pattern the engine itself uses must pass
  * unchanged.
  */
class CrossJoinGuardSpec extends AnyFunSuite with BeforeAndAfterAll {

  // Own session: the guard lives on the GraftExtensions path, and
  // getOrCreate would silently reuse the shared extension-free test
  // session (builder extensions only apply to NEW sessions). Clear the
  // default, build a guarded session on the shared context, and restore
  // afterwards so the rest of the suite keeps the plain-session path.
  private var prevDefault: Option[SparkSession] = None

  private lazy val spark: SparkSession = {
    prevDefault = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
  }

  override def afterAll(): Unit = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    prevDefault.foreach(SparkSession.setDefaultSession)
  }

  // ~80 MB logical estimate each (8 bytes x 10M rows) — over the 64 MiB
  // bound on both sides
  private def big = spark.range(10L * 1000 * 1000).toDF("id")
  private def small = spark.range(100).toDF("id")

  test("big x big cartesian product fails at analysis time") {
    val e = intercept[Exception] { big.crossJoin(big).queryExecution.analyzed }
    assert(e.getMessage.contains("CrossJoinGuard"))
  }

  test("bounded patterns pass: broadcast hint, small side, equi-join") {
    // broadcast hint on a big-stats side: the author's declaration wins
    big.crossJoin(broadcast(big.limit(1))).queryExecution.analyzed
    // both sides under the size bound: executes normally
    assert(small.crossJoin(small).count() == 10000L)
    // equi-join of two big frames is not a product
    big.join(big, Seq("id")).queryExecution.analyzed
  }

  test("an inner broadcast join inside a big side does NOT waive the guard") {
    // ADVICE r7: big.join(broadcast(tiny)) as a product side carries a
    // BROADCAST ResolvedHint in its subtree, but the hint declared the
    // TINY side bounded, not the enriched big side — the product must
    // still fail. (Only a hint at the side's root is an author
    // declaration about the side itself.)
    val l = big // stabilize: `big` is a def, each call has fresh attr ids
    val tiny = small.withColumnRenamed("id", "id2")
    val enriched = l.join(broadcast(tiny), l("id") % 100 === tiny("id2"))
    val e = intercept[Exception] {
      enriched.crossJoin(big).queryExecution.analyzed
    }
    assert(e.getMessage.contains("CrossJoinGuard"))
    // while a root hint — even under an alias — still passes
    broadcast(big.limit(1)).alias("t").crossJoin(big)
      .queryExecution.analyzed
  }

  test("a big-big using-join passes (the scratch-plan constraint)") {
    // Dataset.join(right, usingColumns) internally analyzes a
    // condition-free Inner join to disambiguate self-join columns; the
    // guard must not fire on that intermediate — this is the case that
    // pins the rule's Cross-only scope
    assert(big.join(big, Seq("id")).filter("id < 3").count() == 3L)
  }

  test("the escape hatch disables the guard for a deliberate product") {
    spark.conf.set(CrossJoinGuard.EnabledKey, "false")
    try big.crossJoin(big).queryExecution.analyzed
    finally spark.conf.set(CrossJoinGuard.EnabledKey, "true")
  }

  test("graft functions resolve on the extensions path too") {
    import spark.implicits._
    val n = Seq("hello world").toDF("text")
      .selectExpr("size(graft_pos_hashes(text, 8))").as[Int].head()
    assert(n == 4) // 11 chars -> 4 shingle positions
  }
}
