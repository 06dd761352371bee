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

  /** `df.cache()` + registration; returns `df` for chaining. */
  def cache(df: DataFrame): DataFrame = synchronized {
    df.cache()
    live += df
    df
  }

  /** Release every registered cache (non-blocking) and clear the
    * registry. Safe to call while nothing is registered.
    */
  def unpersistAll(): Unit = synchronized {
    live.foreach(_.unpersist(false))
    live.clear()
  }
}
