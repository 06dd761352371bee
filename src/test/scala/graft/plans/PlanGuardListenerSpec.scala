package graft.plans

import graft.SparkTestBase
import org.apache.spark.sql.functions.lit

/** PlanGuardListener: the runtime detection layer — an executed
  * cartesian (the folded-equi-condition trap the Cross-only check rule
  * cannot see) lands in the listener's log; clean queries do not.
  */
class PlanGuardListenerSpec extends SparkTestBase {

  private def awaitFlag(l: PlanGuardListener, timeoutMs: Long): Boolean = {
    // QueryExecutionListener events are delivered asynchronously on the
    // listener bus; poll instead of reaching into private Spark APIs.
    val deadline = System.currentTimeMillis() + timeoutMs
    while (l.flagged.isEmpty && System.currentTimeMillis() < deadline)
      Thread.sleep(50)
    l.flagged.nonEmpty
  }

  test("an executed cartesian is recorded; clean queries are not") {
    val listener = new PlanGuardListener()
    spark.listenerManager.register(listener)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // clean query first: keyed join + agg, nothing to flag
      val a = spark.range(100).toDF("id")
      a.join(a, Seq("id")).count()
      // the trap: an Inner join whose condition folds to TRUE executes
      // as CartesianProduct
      val b = spark.range(100).toDF("id2")
      a.join(b, lit(1) === lit(1)).count()
      assert(awaitFlag(listener, 10000), "cartesian never recorded")
      val hits = listener.flagged
      assert(hits.exists(_._2.contains("CartesianProduct")), s"hits: $hits")
      // every hit must be a real trap — the clean join contributed none
      assert(hits.forall(_._2.nonEmpty))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.listenerManager.unregister(listener)
    }
  }

  test("the log is bounded: a flood stops at maxEntries") {
    val tiny = new PlanGuardListener(maxEntries = 2)
    spark.listenerManager.register(tiny)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val a = spark.range(50).toDF("id")
      val b = spark.range(50).toDF("id2")
      (1 to 5).foreach { _ =>
        a.join(b, lit(1) === lit(1)).count()
      }
      val deadline = System.currentTimeMillis() + 10000
      while (tiny.flagged.size < 2 && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      // async delivery may still be in flight; give stragglers a beat,
      // then pin the bound
      Thread.sleep(500)
      assert(tiny.flagged.size == 2, s"log grew past bound: ${tiny.flagged.size}")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.listenerManager.unregister(tiny)
    }
  }
}
