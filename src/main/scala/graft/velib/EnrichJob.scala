package graft.velib

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The latent `velib_stats_history_silver` asset (SURVEY.md §1.4): the
  * reference depends on it by name (`src/assets/velib_alerte.py:17`) but its
  * source is absent; semantics are reconstructed from its consumers.
  *
  * Input: canonical columns `station_code, station_name, bikes_available,
  * docks_available, last_reported` (+ optional `seq` tiebreaker column).
  * Adds:
  *   - `net_flow`      = bikes_available - lag(bikes_available) per station
  *                       ordered by last_reported  (W3)
  *   - `moving_avg_1h` = trailing-1h mean of bikes_available per station
  *                       (W4, RANGE frame over event-time)
  *   - `date`          = to_date(last_reported)    (partition column)
  *
  * Scale notes: both windows share ONE partitioning (station_code), so the
  * whole enrichment costs a single hash shuffle + per-partition sort; at
  * 100 TB the station key is high-cardinality and un-skewed (each station
  * contributes one reading per tick), so no salting is needed.
  */
object EnrichJob {

  /** Deterministic trailing mean: exact decimal sum, then one double
    * division — bit-identical across engines regardless of addition order.
    */
  private def exactAvg(c: Column, w: org.apache.spark.sql.expressions.WindowSpec): Column =
    sum(c.cast(DecimalType(28, 6))).over(w).cast("double") / count(c).over(w)

  def enrich(silver: DataFrame, tiebreak: Column): DataFrame = {
    val byStation = Window.partitionBy(col("station_code"))
    val ordered = byStation.orderBy(col("last_reported"), tiebreak)
    // RANGE frame over microsecond event-time: 1h = 3.6e9 us. Micros (not a
    // seconds cast) so the frame boundary is exact at any timestamp precision.
    val byMicros = byStation.orderBy(unix_micros(col("last_reported")))
    val lastHour = byMicros.rangeBetween(-3600L * 1000000L, 0L)
    // Running per-station mean: the scale-free baseline the alert rules can
    // compare against (a trailing-1h mean degenerates to a single reading
    // when the feed is sparse).
    val allSoFar = byMicros.rangeBetween(Window.unboundedPreceding, 0L)
    // one select, not chained withColumns: interleaved Projects would
    // break CollapseWindow adjacency, leaving the two micros-ordered
    // RANGE windows in separate Window execs with a redundant sort each
    silver.select(
      col("*"),
      (col("bikes_available") - lag(col("bikes_available"), 1).over(ordered))
        .as("net_flow"),
      exactAvg(col("bikes_available"), lastHour).as("moving_avg_1h"),
      exactAvg(col("bikes_available"), allSoFar).as("baseline_avg"),
      to_date(col("last_reported")).as("date"))
  }

  /** J4: dimension enrichment — re-source `station_name` from the station
    * reference (broadcast: the dimension is tiny relative to the fact).
    */
  def withDimension(status: DataFrame, dim: DataFrame): DataFrame =
    status
      .drop("station_name")
      .join(broadcast(dim.select(
          col("station_id").as("station_code"),
          col("name").as("station_name"))),
        Seq("station_code"), "left")
}
