package graft.velib

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Serving-layer queries: Spark-native restatement of the two DuckDB SQL
  * endpoints in reference `src/api.py:37-142` — the richest relational
  * semantics in the system (CTE reuse, semi-join, windowed top-k, ordered
  * list aggregation, cross join, distinct count).
  */
object Serving {

  /** `/alerts/critical` (reference `src/api.py:41-65`):
    * tiny `target_stations` CTE -> semi-join reduction of history (J1) ->
    * per-station 5-most-recent (W2) -> inner join back (J2) -> ordered
    * sparkline array (A1, struct-sort idiom: collect_list alone is
    * UNORDERED post-shuffle) -> global sort (O1).
    *
    * Scale notes: targets are O(alert count) — both joins broadcast, so the
    * only shuffle on the big side is the window's partition-by-station, and
    * it runs on the semi-join-reduced history, not the full table.
    */
  def criticalAlerts(
      gold: DataFrame,
      history: DataFrame,
      tiebreak: Column,
      targetFilter: Column = col("bikes") <= 5): DataFrame = {
    // cached via the Caches registry (harness unpersists post-query):
    // `targets` is referenced twice (semi-join reduction + final join) and
    // sits on top of the whole enrich->gold subtree — without
    // materialization Spark would recompute that chain per reference
    // (SURVEY.md §7 risk register: CTE reuse). It is O(alert count).
    val targets = graft.Caches.cache(gold.filter(targetFilter)
      .select(col("station_code"), col("station_name"), col("bikes"),
        col("alert_level")))
    val reduced = history.join(broadcast(targets.select("station_code")),
      Seq("station_code"), "left_semi")
    val w = Window.partitionBy(col("station_code"))
      .orderBy(col("last_reported").desc, tiebreak.desc)
    val trends = reduced
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .drop("station_name") // targets' (= latest reading's) name wins
    trends
      .join(broadcast(targets), Seq("station_code"))
      .groupBy(col("station_code"), col("station_name"), col("bikes"),
        col("alert_level"))
      .agg(
        // Serialized to a scalar CSV (not an array column) so any
        // row-hash/sort-based comparator can handle the result; decimal
        // cast fixes the double->string rendering across engines.
        array_join(
          transform(
            sort_array(collect_list(struct(
              col("last_reported"), trends("rank"),
              col("bikes_available")))).getField("bikes_available"),
            x => x.cast(DecimalType(28, 6)).cast("string")),
          ",").as("sparkline_data"))
      .withColumnRenamed("bikes", "current_bikes")
      .orderBy(col("current_bikes").asc, col("station_code").asc)
  }

  /** `/health/pipeline` (reference `src/api.py:87-142`): unnest the GBFS
    * reference dimension (P14+A3), one-pass global multi-aggregate over
    * today's partition (A4), 1x1 cross join (J3), zombie-station
    * reconciliation, plus the endpoint's Python-side conditional counts
    * folded in-engine (A6).
    */
  def healthPipeline(silver: DataFrame, stationsNested: DataFrame, asOfDate: Column): DataFrame = {
    val referenceData = stationsNested
      .select(explode(col("data.stations")).as("s"))
      .agg(count(lit(1)).as("total_expected_stations"))
    val silverData = silver.filter(col("date") === asOfDate).agg(
      max(col("last_reported")).as("latest_data_point"),
      countDistinct(col("station_code")).as("active_stations_today"),
      sum(col("bikes_available").cast(DecimalType(28, 6))).cast("double")
        .as("total_bikes_available"),
      sum(col("docks_available").cast(DecimalType(28, 6))).cast("double")
        .as("total_docks_available"),
      sum(when(col("bikes_available") === 0, 1).otherwise(0))
        .as("empty_readings"),
      sum(when(col("bikes_available") > 0 && col("bikes_available") <= 3, 1)
        .otherwise(0)).as("low_readings"))
    silverData.crossJoin(referenceData)
      .withColumn("zombie_stations",
        col("total_expected_stations") - col("active_stations_today"))
  }
}
