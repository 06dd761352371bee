package graft.velib

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gold alerts job: parity with reference `src/assets/velib_alerte.py:19-82`.
  * Recency filter (P6) -> latest-per-station dedup (W1) -> alert rules
  * (P7/P8) -> renamed projection (P9/P10).
  *
  * The reference compares against wall-clock `now()` (`velib_alerte.py:41`);
  * here "now" is derived as `max(last_reported)` (broadcast 1-row cross
  * join — a scalar subquery, no shuffle) so results are deterministic
  * (SURVEY.md §7 risk register).
  *
  * Scale notes: the recency filter runs BEFORE the window, so the W1
  * shuffle only carries the horizon's rows, not full history; on a
  * date-partitioned silver table the derived `date` predicate
  * partition-prunes the scan (Catalyst PruneFileSourcePartitions —
  * subsumes the reference's hand-built today/yesterday path list,
  * SURVEY.md §4).
  */
object GoldAlerts {

  val LowBikes = 3

  /** Reference-exact rule: absolute thresholds (`velib_alerte.py:60-67`). */
  def absoluteRule: (Column, Column) =
    (col("bikes") < LowBikes && col("trend") <= 0, col("bikes") === 0)

  /** Scale-free rule for arbitrary magnitudes: below the station's own
    * running mean and not refilling; critical at half the baseline.
    */
  def relativeRule: (Column, Column) =
    (col("bikes") < col("baseline_avg") && col("trend") <= 0,
      col("bikes") <= col("baseline_avg") * 0.5)

  def alerts(
      enriched: DataFrame,
      tiebreak: Column,
      horizon: String = "INTERVAL 4 HOURS",
      rule: (Column, Column) = absoluteRule): DataFrame = {
    val (alertWhen, criticalWhen) = rule
    val asOf = enriched.agg(max(col("last_reported")).as("__as_of"))
    val recent = enriched
      .crossJoin(broadcast(asOf))
      .filter(col("last_reported") >= col("__as_of") - expr(horizon))
      .drop("__as_of")
    val w = Window.partitionBy(col("station_code"))
      .orderBy(col("last_reported").desc, tiebreak.desc)
    recent
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") === 1)
      .drop("rank")
      .select(
        col("station_code"),
        col("station_name"),
        col("bikes_available").as("bikes"),
        col("net_flow").as("trend"),
        col("moving_avg_1h").as("avg_1h"),
        col("baseline_avg"),
        col("last_reported"))
      .filter(alertWhen)
      .withColumn("alert_level",
        when(criticalWhen, "CRITICAL_EMPTY").otherwise("WARNING_LOW"))
  }
}
