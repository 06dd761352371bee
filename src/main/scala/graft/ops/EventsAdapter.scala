package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Maps the driver's `events` table (FIXTURES.md §B) onto the canonical
  * velib silver shape so the whole velib pipeline (EnrichJob / GoldAlerts /
  * Serving) runs unmodified over driver testdata:
  * user_id -> station_code, value -> bikes_available, ts -> last_reported,
  * props.$.k -> docks_available (also exercises JSON extraction, P2-analog),
  * event_id -> seq (deterministic tiebreaker, SURVEY.md §7 risk register).
  */
object EventsAdapter {

  def silver(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).select(
      col("user_id").as("station_code"),
      col("event_type").as("station_name"),
      col("value").as("bikes_available"),
      get_json_object(col("props"), "$.k").cast("long").as("docks_available"),
      col("ts").as("last_reported"),
      col("event_id").as("seq"))

  /** The same adapter as a DuckDB CTE, shared by every oracle query. */
  val silverSql: String =
    """silver AS (
      |  SELECT user_id AS station_code,
      |         event_type AS station_name,
      |         value AS bikes_available,
      |         CAST(json_extract_string(props, '$.k') AS BIGINT) AS docks_available,
      |         ts AS last_reported,
      |         event_id AS seq
      |  FROM events
      |)""".stripMargin

  /** Enrichment (EnrichJob.enrich) as a DuckDB CTE: identical window
    * definitions — microsecond RANGE frame, exact decimal sum for the
    * trailing mean (bit-identical double across engines).
    */
  val enrichedSql: String =
    """enriched AS (
      |  SELECT *,
      |    bikes_available - lag(bikes_available) OVER
      |      (PARTITION BY station_code ORDER BY last_reported, seq) AS net_flow,
      |    CAST(SUM(CAST(bikes_available AS DECIMAL(28,6))) OVER w1h AS DOUBLE)
      |      / COUNT(bikes_available) OVER w1h AS moving_avg_1h,
      |    CAST(SUM(CAST(bikes_available AS DECIMAL(28,6))) OVER wall AS DOUBLE)
      |      / COUNT(bikes_available) OVER wall AS baseline_avg,
      |    CAST(last_reported AS DATE) AS date
      |  FROM silver
      |  WINDOW w1h AS (PARTITION BY station_code ORDER BY epoch_us(last_reported)
      |                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW),
      |         wall AS (PARTITION BY station_code ORDER BY epoch_us(last_reported)
      |                 RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |)""".stripMargin

  /** GoldAlerts.alerts (72h horizon) as DuckDB CTEs (needs silver+enriched). */
  val goldSql: String =
    """m AS (SELECT max(last_reported) AS as_of FROM silver),
      |recent AS (
      |  SELECT e.* FROM enriched e, m
      |  WHERE e.last_reported >= m.as_of - INTERVAL 72 HOURS
      |),
      |latest AS (
      |  SELECT * FROM (
      |    SELECT *, row_number() OVER (PARTITION BY station_code
      |      ORDER BY last_reported DESC, seq DESC) AS rnk
      |    FROM recent) WHERE rnk = 1
      |),
      |gold AS (
      |  SELECT station_code, station_name, bikes_available AS bikes,
      |         net_flow AS trend, moving_avg_1h AS avg_1h, baseline_avg,
      |         last_reported,
      |         CASE WHEN bikes_available <= 0.5 * baseline_avg
      |              THEN 'CRITICAL_EMPTY' ELSE 'WARNING_LOW' END AS alert_level
      |  FROM latest WHERE bikes_available < baseline_avg AND net_flow <= 0
      |)""".stripMargin
}
