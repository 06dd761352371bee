package graft.plans

import java.util.concurrent.ConcurrentLinkedQueue
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Runtime companion to the CI plan audit (the third layer of the
  * cartesian defense, VERDICT r7 item 5):
  *
  *  1. `CrossJoinGuard` rejects explicit big-big Cross joins at
  *     ANALYSIS time — but is Cross-only by the using-join
  *     scratch-plan constraint;
  *  2. the PlanAuditSpec CI sweep pins every REGISTERED query's
  *     physical plan at sf0.001 and sf0.1 — but only sees queries the
  *     suite knows about;
  *  3. this listener watches whatever a deployment actually RUNS: it
  *     applies `PlanAudit.flags` to each executed plan and records
  *     hits in a bounded in-memory log, so an ad-hoc Inner join whose
  *     equi-condition was typo'd away (executing as a
  *     CartesianProduct) is named in ops telemetry the first time it
  *     runs.
  *
  * Listeners fire post-hoc by Spark contract (onSuccess runs after the
  * query finished), so this layer is DETECTION, not prevention — the
  * preventive layers are 1 and 2. Production wiring:
  * `spark.listenerManager.register(new PlanGuardListener)`, then ship
  * `flagged` wherever metrics go. The log is bounded (default 256
  * entries) and lock-free; a flood of flagged queries drops new
  * entries rather than growing without bound on the driver.
  */
final class PlanGuardListener(maxEntries: Int = 256)
    extends QueryExecutionListener {

  private val log = new ConcurrentLinkedQueue[(String, Seq[String])]()
  // atomic admission counter: ConcurrentLinkedQueue.size is O(n) and a
  // size-check-then-add races under concurrent listener-bus deliveries
  private val admitted = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Snapshot of (funcName, flags) hits recorded so far. */
  def flagged: Seq[(String, Seq[String])] = {
    import scala.jdk.CollectionConverters._
    log.asScala.toSeq
  }

  def clear(): Unit = { log.clear(); admitted.set(0) }

  private def record(funcName: String, qe: QueryExecution): Unit = {
    // Once the log is full, stop paying for plan toString + sweep
    // entirely: the listener-bus thread runs CONCURRENTLY with the
    // next query on the driver, so unbounded per-action sweeps bleed
    // into foreground timings (measured in the r9 bench wiring).
    if (admitted.get() >= maxEntries) return
    // executedPlan is already materialized by the finished query; the
    // flags scan is a string sweep — cheap enough for every query.
    val fs =
      try graft.PlanAudit.flags(qe.executedPlan.toString)
      catch { case _: Throwable => Nil } // never break the listener bus
    if (fs.nonEmpty) {
      // reserve a slot atomically; roll back on overflow so the
      // counter can't creep past maxEntries under contention
      if (admitted.incrementAndGet() <= maxEntries) log.add(funcName -> fs)
      else admitted.decrementAndGet()
    }
  }

  override def onSuccess(
      funcName: String, qe: QueryExecution, durationNs: Long): Unit =
    record(funcName, qe)

  /** A query that FAILED with a trap plan still gets recorded — the
    * flag is about the plan, not the outcome.
    */
  override def onFailure(
      funcName: String, qe: QueryExecution, exception: Exception): Unit =
    record(funcName, qe)
}
