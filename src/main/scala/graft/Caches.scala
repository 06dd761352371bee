package graft

import org.apache.spark.sql.DataFrame
import scala.collection.mutable

/** Registry for intra-query caches (self-join / CTE-reuse subtrees that
  * would otherwise be recomputed per reference, e.g. DedupOps' banded
  * keys or Serving's `targets`). Query functions register with
  * [[cache]]; the harness ([[Verify]]/[[Bench]], or any long-lived
  * session embedding the library) calls [[unpersistAll]] once the
  * query's result is materialized — otherwise every cached subtree
  * stays pinned in executor memory for the session's lifetime.
  */
object Caches {
  private val live = mutable.Buffer.empty[DataFrame]
  // RDDs persisted by eager localCheckpoints — these bypass the
  // CacheManager, so Dataset.unpersist can't release them; they are
  // dropped directly instead.
  private val checkpointed =
    mutable.Buffer.empty[org.apache.spark.rdd.RDD[_]]

  /** `df.cache()` + registration; returns `df` for chaining. */
  def cache(df: DataFrame): DataFrame = synchronized {
    df.cache()
    live += df
    df
  }

  /** Eager `df.localCheckpoint(true)` + registration of the RDD blocks
    * it pins (localCheckpoint persists the executed RDD directly,
    * outside the CacheManager — without registry tracking every
    * iterative query would leak one persisted RDD per round for the
    * session's lifetime). The returned frame is only valid until
    * [[unpersistAll]] — checkpointing truncates lineage, so once the
    * blocks drop the data is unrecoverable, which is exactly the
    * intra-query lifecycle this registry manages.
    */
  def checkpoint(df: DataFrame): DataFrame = synchronized {
    val out = df.localCheckpoint(true)
    // Capture the checkpointed RDD DIRECTLY from the returned plan (a
    // LogicalRDD leaf wrapping the freshly persisted internal RDD) —
    // diffing sc.getPersistentRDDs around the call misattributes any
    // RDD persisted concurrently by another thread or by AQE background
    // materialization, and would force-unpersist someone else's blocks.
    out.queryExecution.analyzed.collectLeaves().foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD
          if lr.rdd.getStorageLevel != org.apache.spark.storage.StorageLevel.NONE =>
        checkpointed += lr.rdd
      case _ => ()
    }
    out
  }

  /** Release every registered cache (non-blocking) and clear the
    * registry. Safe to call while nothing is registered.
    */
  def unpersistAll(): Unit = synchronized {
    live.foreach(_.unpersist(false))
    live.clear()
    checkpointed.foreach(_.unpersist(blocking = false))
    checkpointed.clear()
  }

  /** Release ONE checkpointed frame's persisted blocks mid-query — the
    * fixpoint-loop discipline (r9): a driver loop that checkpoints
    * every round would otherwise pin O(rounds) copies of the working
    * set until [[unpersistAll]], turning an O(log n)-round contraction
    * into an O(edges x log n) memory bill at scale. Callers release
    * round r's frame once round r+1 is materialized AND no later code
    * touches r (checkpointing truncated its lineage — a released frame
    * is unrecoverable, which is why this is an explicit per-frame call
    * and never automatic). No-op for frames this registry never
    * checkpointed.
    */
  def release(df: DataFrame): Unit = synchronized {
    df.queryExecution.analyzed.collectLeaves().foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        val (hit, keep) = checkpointed.partition(_.id == lr.rdd.id)
        hit.foreach(_.unpersist(blocking = false))
        checkpointed.clear()
        checkpointed ++= keep
      case _ => ()
    }
  }
}
