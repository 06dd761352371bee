package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table co-location: the shuffle-elimination lever the
  * engine's big-big joins reach for when broadcast is off the table
  * (both sides large) and the join repeats (nightly enrichment, the
  * d80-style anti-joins, fact-to-fact reconciliation).
  *
  * Writing both sides `bucketBy(n, key).sortBy(key)` pins an identical
  * hash partitioning INTO THE FILES; a later equi-join on that key
  * reads each bucket pair directly — zero Exchange on either side, and
  * with sortBy the SortMergeJoin's sorts collapse too. At 100 TB this
  * converts the single most expensive stage of a repeated join
  * (re-shuffling the fact table every run) into a one-time write-side
  * cost, exactly like Hive/Iceberg bucket transforms.
  *
  * The spec pins the contract, not just the API: the bucketed join's
  * executed plan contains ZERO shuffle exchanges (vs >= 1 for the same
  * join unbucketed) and the results are value-identical.
  *
  * Caveats encoded here rather than rediscovered on a cluster:
  * bucket-join elision needs equal bucket counts on both sides (or a
  * multiple, Spark 3.1+ `bucketing.enabled` semantics), the join key
  * must be the bucket key, and `autoBroadcastJoinThreshold` decides
  * whether the optimizer even considers the SMJ path this serves.
  */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted managed parquet table.
    * Overwrites; `buckets` must match the partner table's count for
    * exchange-free joins.
    */
  def writeBucketed(
      df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table) // managed: lands under spark.sql.warehouse.dir

  /** Equi-join two bucketed tables on their shared bucket key. With
    * matching bucket counts this plans with no Exchange on either side.
    */
  def colocatedJoin(
      spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), Seq(key))

  /** Count shuffle exchanges in a frame's FINAL executed plan — the
    * spec-facing probe for "this join is co-located". With AQE enabled
    * `executedPlan` is the non-finalized adaptive wrapper whose string
    * reflects the initial plan (ADVICE r9); unwrap `finalPhysicalPlan`
    * so the count reflects the exchanges that actually execute.
    * Static plans pass through.
    *
    * SIDE EFFECT (ADVICE r10): under AQE, `finalPhysicalPlan` RUNS the
    * query's stages if they have not executed yet — this is a
    * measurement that executes, not a free inspection. Call it either
    * on a frame you are about to act on anyway (the stages are cached
    * on the same QueryExecution, so the later action reuses them — the
    * BucketingSpec pattern), or accept paying the job. Never call it
    * in a laziness-sensitive spec.
    */
  def shuffleCount(df: DataFrame): Int = {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.finalPhysicalPlan
      case p => p
    }
    plan.toString().linesIterator
      .count(_.contains("Exchange hashpartitioning"))
  }
}
