package graft.plans

import org.apache.spark.SparkException
import org.apache.spark.sql.catalyst.plans.Cross
import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, Join, LogicalPlan, ResolvedHint, SubqueryAlias}
import org.apache.spark.sql.internal.SQLConf

/** Post-analysis check rule (`SparkSessionExtensions.injectCheckRule`):
  * FAIL FAST on unbounded cartesian products. At 100 TB an accidental
  * `crossJoin` (or a join whose equi-condition was silently dropped by
  * a typo'd column) is not a slow query — it is a cluster-sized
  * incident that surfaces hours in. Spark's own
  * `spark.sql.crossJoin.enabled` gate was removed in 3.0 (cross joins
  * are always legal now); this rule restores the guard with a SIZE
  * bound instead of a blanket ban, so every intentional pattern the
  * engine uses stays legal:
  *
  *  - a side carrying an explicit `broadcast()` hint is trusted (the
  *    author declared it bounded — the s01-family query-set scans);
  *  - a side whose logical size estimate is under
  *    `spark.graft.crossJoinGuard.maxBytes` (default 64 MiB, the
  *    "could have broadcast it" bar) passes — 1-row scalar frames,
  *    codebooks, quota tables;
  *  - everything else throws at ANALYSIS time, naming the rule and the
  *    offending estimate, long before an executor burns a cycle.
  *
  * Scope: EXPLICIT cross joins only (`crossJoin` / SQL `CROSS JOIN`).
  * An Inner join with no condition is the same trap semantically, but
  * `Dataset.join(right, usingColumns)` internally analyzes exactly
  * that shape as a scratch plan (to disambiguate self-join columns
  * before attaching the equality) and session check rules run on that
  * intermediate — so guarding Inner/None would reject every big-big
  * using-join. Spark's optimizer later converts condition-free Inner
  * to Cross anyway, where physical planning (and this rule on the
  * re-analyzed plan in SQL paths) still sees it.
  *
  * The guard is advisory-free and value-neutral: it rewrites nothing,
  * so a plan that passes is byte-identical to the plan without the
  * rule. Disable with `spark.graft.crossJoinGuard.enabled=false` for a
  * deliberate big-big product.
  */
object CrossJoinGuard extends (LogicalPlan => Unit) {
  val EnabledKey = "spark.graft.crossJoinGuard.enabled"
  val MaxBytesKey = "spark.graft.crossJoinGuard.maxBytes"
  val DefaultMaxBytes: Long = 64L * 1024 * 1024

  /** A broadcast hint is honored only when the author hinted THE SIDE
    * itself — the hint at the root of the join input (alias wrappers
    * peeled; aliasing changes no sizes). ADVICE r7: the old
    * anywhere-in-subtree scan waved through a huge side that merely
    * CONTAINED an inner `big.join(broadcast(tiny))` — the tiny-side
    * declaration said nothing about the product's outer side.
    */
  @annotation.tailrec
  private def rootBroadcastHint(p: LogicalPlan): Boolean = p match {
    case h: ResolvedHint => h.hints.strategy.contains(BROADCAST)
    case a: SubqueryAlias => rootBroadcastHint(a.child)
    case _ => false
  }

  private def bounded(p: LogicalPlan, maxBytes: Long): Boolean =
    rootBroadcastHint(p) || p.stats.sizeInBytes <= maxBytes

  override def apply(plan: LogicalPlan): Unit = {
    val conf = SQLConf.get
    if (!conf.getConfString(EnabledKey, "true").toBoolean) return
    val maxBytes = conf.getConfString(MaxBytesKey, DefaultMaxBytes.toString).toLong
    plan.foreach {
      // Cross ONLY — an Inner join with condition=None looks like the
      // same trap, but Dataset.join(right, usingColumns) internally
      // analyzes exactly that shape as a scratch plan to disambiguate
      // self-join columns (before attaching the equality), and check
      // rules run on that intermediate too — guarding Inner/None would
      // reject every big-big using-join. broadcast() declarations may
      // sit as a ResolvedHint child or already folded into the Join's
      // JoinHint field depending on where in analysis we are — honor
      // both.
      case Join(left, right, Cross, None, jh)
          if !jh.leftHint.exists(_.strategy.contains(BROADCAST)) &&
            !jh.rightHint.exists(_.strategy.contains(BROADCAST)) &&
            !bounded(left, maxBytes) && !bounded(right, maxBytes) =>
        throw new SparkException(
          s"CrossJoinGuard: cartesian product with no bounded side — " +
            s"left ~${left.stats.sizeInBytes} bytes, " +
            s"right ~${right.stats.sizeInBytes} bytes, " +
            s"limit $maxBytes ($MaxBytesKey). Broadcast a side you know " +
            s"is small, add an equi-join condition, or disable " +
            s"$EnabledKey for a deliberate big-big product.")
      case _ => ()
    }
  }
}
