package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Relational extensions beyond the reference's own surface (SURVEY.md §2.7
  * notes set ops absent; §2.3 notes as-of joins absent; §2.8 T5 notes no
  * streaming windows): event-time tumbling windows, gap sessionization,
  * as-of join, rollup grouping sets, and set-operation composition —
  * each with a DuckDB oracle.
  */
object RelOps {

  /** Event-time tumbling window aggregation: Spark's `window()` operator
    * (the batch twin of the streaming T5 upgrade; same function runs under
    * readStream+watermark — see StreamJobs). 1-hour buckets are
    * epoch-aligned in both engines, so the oracle is date_trunc.
    */
  def w01TumblingAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(28, 6))).cast("double")
          .as("sum_value"))
      .select(col("window.start").as("bucket_start"), col("event_type"),
        col("n"), col("sum_value"))
      .orderBy("bucket_start", "event_type")

  /** Gap sessionization (gaps-and-islands): a session breaks after a
    * 30-minute silence per user. One window shuffle on user_id; the
    * session id is a running sum of break flags — the standard
    * scale-friendly formulation (same partitioning serves both windows
    * and the final aggregation).
    */
  def w02Sessionization(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val gapUs = unix_micros(col("ts")) -
      unix_micros(lag(col("ts"), 1).over(w))
    val newSession = when(gapUs.isNull || gapUs > 1800L * 1000000L, 1)
      .otherwise(0)
    Tables.events(spark, dir)
      .withColumn("sess_id",
        sum(newSession).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("sess_id"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(28, 6))).cast("double")
          .as("total_value"))
      .orderBy("user_id", "sess_id")
  }

  /** As-of join: each event picks the latest order of the same user with
    * o_orderdate <= ts. Implemented with the union+window trick — tag both
    * sides, sort by event time within user, carry the last non-null order
    * key forward — ONE shuffle on user_id instead of an exploding
    * inequality join (the plan that survives 100 TB; the oracle states the
    * same semantics as a rank-1 inequality join).
    */
  def w03AsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(
      col("user_id"), col("ts"), col("event_id"),
      lit(null).cast("long").as("okey"),
      lit(null).cast("timestamp").as("odate"),
      lit(0).as("is_order"))
    val od = Tables.orders(spark, dir).select(
      col("o_custkey").as("user_id"), col("o_orderdate").as("ts"),
      lit(null).cast("long").as("event_id"),
      col("o_orderkey").as("okey"), col("o_orderdate").as("odate"),
      lit(1).as("is_order"))
    // orders sort before events at equal ts (is_order desc) => an order
    // dated exactly at the event time is visible; max okey wins date ties.
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("is_order").desc, col("okey"))
      .rowsBetween(Window.unboundedPreceding, 0)
    ev.union(od)
      .withColumn("asof_orderkey", last(col("okey"), ignoreNulls = true).over(w))
      .withColumn("asof_orderdate", last(col("odate"), ignoreNulls = true).over(w))
      .filter(col("is_order") === 0)
      .select("event_id", "user_id", "ts", "asof_orderkey", "asof_orderdate")
      .orderBy("event_id")
  }

  /** Rollup grouping sets over lineitem with grouping flags. */
  def w04Rollup(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        grouping(col("l_returnflag")).cast("long").as("g_rf"),
        grouping(col("l_linestatus")).cast("long").as("g_ls"),
        count(lit(1)).as("n"),
        sum(col("l_quantity").cast(DecimalType(28, 4))).cast("double")
          .as("sum_qty"))
      .select(col("l_returnflag"), col("l_linestatus"),
        col("g_rf"), col("g_ls"), col("n"), col("sum_qty"))
      .orderBy(col("g_rf"), col("g_ls"), col("l_returnflag"),
        col("l_linestatus"))

  /** Set-operation composition: INTERSECT -> UNION ALL -> EXCEPT.
    * (DataFrame.union is UNION ALL; except/intersect are DISTINCT — the
    * oracle mirrors exactly that.)
    */
  def w05SetOps(spark: SparkSession, dir: String): DataFrame = {
    val building = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("custkey"))
    val bigSpenders = Tables.orders(spark, dir)
      .filter(col("o_totalprice") > 200000)
      .select(col("o_custkey").as("custkey"))
    val urgent = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT" && col("o_totalprice") > 300000)
      .select(col("o_custkey").as("custkey"))
    val inDebt = Tables.customer(spark, dir)
      .filter(col("c_acctbal") < 0)
      .select(col("c_custkey").as("custkey"))
    building.intersect(bigSpenders)
      .union(urgent)
      .except(inDebt)
      .orderBy("custkey")
  }

  /** Distinct-cardinality sketch (HLL++): the shuffle-light scale path for
    * A4's COUNT(DISTINCT) (SURVEY.md §2.4). No oracle — sketch estimates
    * are engine-specific, so the driver records a rows-only check; the
    * exact answer rides along for in-result sanity comparison.
    */
  def w06ApproxDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        approx_count_distinct(col("user_id"), 0.02).as("approx_users"),
        countDistinct(col("user_id")).as("exact_users"),
        count(lit(1)).as("n"))
      .orderBy("event_type")

  /** Skew-salted aggregation: the manual two-stage plan for a hot
    * grouping key — stage 1 aggregates on (key, salt) spreading a skewed
    * key over 16 reducers, stage 2 merges partials per key. Results are
    * identical to a direct groupBy (the oracle states the direct form);
    * at 100 TB this is the fallback when AQE skew handling can't split a
    * single monster hash-agg key.
    */
  def w07SaltedAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("salt", pmod(col("event_id"), lit(16)))
      .groupBy(col("event_type"), col("salt"))
      .agg(
        count(lit(1)).as("pn"),
        sum(col("value").cast(DecimalType(28, 6))).as("psum"),
        min(col("value")).as("pmin"),
        max(col("value")).as("pmax"))
      .groupBy(col("event_type"))
      .agg(
        sum(col("pn")).cast("long").as("n"),
        sum(col("psum")).cast("double").as("sum_value"),
        min(col("pmin")).as("min_value"),
        max(col("pmax")).as("max_value"))
      .orderBy("event_type")

  /** Exact distributed median per group via rank selection (row_number +
    * pick the middle row(s), average the two middles on even counts) —
    * deterministic across engines, unlike percentile_approx sketches.
    * One shuffle for the window, reused by the aggregation.
    */
  def w08ExactMedian(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("value"), col("event_id"))
    Tables.events(spark, dir)
      .withColumn("rn", row_number().over(w))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy(col("event_type"))))
      // `div` (integer division): Spark's `/` on integers yields DOUBLE
      .filter(col("rn") === expr("(cnt + 1) div 2") ||
        col("rn") === expr("(cnt + 2) div 2"))
      .groupBy(col("event_type"))
      .agg(
        (sum(col("value").cast(DecimalType(28, 6))).cast("double") /
          count(lit(1))).as("median_value"),
        max(col("cnt")).as("n"))
      .orderBy("event_type")
  }

  /** Exact rank-based quantiles (p25/p50/p75 as the value at rank
    * ceil(q*n), no interpolation — deterministic across engines, unlike
    * percentile sketches or interpolating quantile_cont).
    */
  def w09Quantiles(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("value"), col("event_id"))
    val ranked = Tables.events(spark, dir)
      .withColumn("rn", row_number().over(w))
      .withColumn("cnt",
        count(lit(1)).over(Window.partitionBy(col("event_type"))))
    def pick(q: Double, name: String) =
      max(when(col("rn") === expr(s"CAST(ceil(cnt * $q) AS BIGINT)"),
        col("value"))).as(name)
    ranked.groupBy(col("event_type"))
      .agg(pick(0.25, "p25"), pick(0.5, "p50"), pick(0.75, "p75"),
        max(col("cnt")).as("n"))
      .orderBy("event_type")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "w06_approx_distinct" -> (w06ApproxDistinct _),
    "w07_salted_agg" -> (w07SaltedAgg _),
    "w08_exact_median" -> (w08ExactMedian _),
    "w09_quantiles" -> (w09Quantiles _),
    "w01_tumbling_agg" -> (w01TumblingAgg _),
    "w02_sessionization" -> (w02Sessionization _),
    "w03_asof_join" -> (w03AsofJoin _),
    "w04_rollup" -> (w04Rollup _),
    "w05_set_ops" -> (w05SetOps _)
  )

  val oracle: Map[String, String] = Map(
    "w07_salted_agg" ->
      """SELECT event_type, count(*) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE)
        |         AS sum_value,
        |       min(value) AS min_value, max(value) AS max_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "w09_quantiles" ->
      """WITH r AS (
        |  SELECT event_type, value, event_id,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY value, event_id) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS cnt
        |  FROM events
        |)
        |SELECT event_type,
        |  max(CASE WHEN rn = CAST(ceil(cnt * 0.25) AS BIGINT)
        |      THEN value END) AS p25,
        |  max(CASE WHEN rn = CAST(ceil(cnt * 0.5) AS BIGINT)
        |      THEN value END) AS p50,
        |  max(CASE WHEN rn = CAST(ceil(cnt * 0.75) AS BIGINT)
        |      THEN value END) AS p75,
        |  CAST(max(cnt) AS BIGINT) AS n
        |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin,

    "w08_exact_median" ->
      """WITH r AS (
        |  SELECT event_type, value,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY value, event_id) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS cnt
        |  FROM events
        |)
        |SELECT event_type,
        |       CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) / count(*)
        |         AS median_value,
        |       CAST(max(cnt) AS BIGINT) AS n
        |FROM r
        |WHERE rn = (cnt + 1) // 2 OR rn = (cnt + 2) // 2
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "w01_tumbling_agg" ->
      """SELECT date_trunc('hour', ts) AS bucket_start, event_type,
        |       count(*) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY bucket_start, event_type""".stripMargin,

    "w02_sessionization" ->
      """WITH x AS (
        |  SELECT user_id, ts, event_id, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
        |         THEN 1 ELSE 0 END AS ns
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |),
        |y AS (
        |  SELECT *, CAST(SUM(ns) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
        |    AS sess_id
        |  FROM x
        |)
        |SELECT user_id, sess_id, min(ts) AS session_start,
        |       max(ts) AS session_end, count(*) AS n_events,
        |       CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE)
        |         AS total_value
        |FROM y GROUP BY user_id, sess_id ORDER BY user_id, sess_id""".stripMargin,

    "w03_asof_join" ->
      """WITH j AS (
        |  SELECT e.event_id, o.o_orderkey, o.o_orderdate,
        |    row_number() OVER (PARTITION BY e.event_id
        |      ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        |  FROM events e
        |  JOIN orders o ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
        |)
        |SELECT e.event_id, e.user_id, e.ts,
        |       j.o_orderkey AS asof_orderkey, j.o_orderdate AS asof_orderdate
        |FROM events e
        |LEFT JOIN (SELECT * FROM j WHERE rn = 1) j USING (event_id)
        |ORDER BY event_id""".stripMargin,

    "w04_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
        |       CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls,
        |       count(*) AS n,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE)
        |         AS sum_qty
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY g_rf, g_ls, l_returnflag, l_linestatus""".stripMargin,

    "w05_set_ops" ->
      """SELECT custkey FROM (
        |  (SELECT c_custkey AS custkey FROM customer
        |   WHERE c_mktsegment = 'BUILDING'
        |   INTERSECT
        |   SELECT o_custkey FROM orders WHERE o_totalprice > 200000)
        |  UNION ALL
        |  SELECT o_custkey FROM orders
        |  WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 300000
        |  EXCEPT
        |  SELECT c_custkey FROM customer WHERE c_acctbal < 0
        |) ORDER BY custkey""".stripMargin
  )
}
