package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Aggregates the per-module query/oracle maps; each module documents the
  * SURVEY.md §2 operators it covers.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Full velib pipeline spine over the events adapter: parse-shaped silver
    * -> enrichment (lag + trailing-1h mean) -> gold alerts -> serving
    * sparkline query (scan/project/filter/window/join/agg/sort).
    */
  def entry(spark: SparkSession): DataFrame =
    // sf0.001 events are sparse (~1.4/h), so the flagship chain runs with a
    // full-span horizon to guarantee a non-empty alert set.
    ops.CoreOps.criticalChain(spark, "/root/testdata/sf0.001", "INTERVAL 720 HOURS")

  /** One entry per implemented operator from SURVEY.md §2 (+ §7 step E). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ops.CoreOps.queries ++ ops.TextOps.queries ++
      ops.DedupOps.queries ++ ops.SimOps.queries ++ ops.RelOps.queries ++
      ops.MediaOps.queries ++ ops.PipelineOps.queries ++ ops.GraphOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    ops.CoreOps.oracle ++ ops.TextOps.oracle ++
      ops.DedupOps.oracle ++ ops.SimOps.oracle ++ ops.RelOps.oracle ++
      ops.MediaOps.oracle ++ ops.PipelineOps.oracle ++ ops.GraphOps.oracle
}
