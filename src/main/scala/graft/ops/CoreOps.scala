package graft.ops

import graft.Tables
import graft.velib.{EnrichJob, GoldAlerts, Serving}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Parity operators (SURVEY.md §2) as driver-checkable queries over the
  * testdata. Naming: q<nn>_<operator>. Every query ends in a deterministic
  * global ORDER BY mirrored in the oracle; every floating-point aggregate
  * uses the exact-decimal-sum idiom so Spark and DuckDB produce
  * bit-identical doubles regardless of addition order.
  */
object CoreOps {

  private val seq_ = col("seq")

  /** W1: latest-per-key dedup (reference `velib_alerte.py:44-49`). */
  def q01LatestPerStation(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("station_code"))
      .orderBy(col("last_reported").desc, seq_.desc)
    EventsAdapter.silver(spark, dir)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") === 1)
      .select("station_code", "station_name", "bikes_available",
        "docks_available", "last_reported")
      .orderBy("station_code")
  }

  /** W3+W4: the latent enrichment — lag net_flow + trailing-1h mean. */
  def q03NetFlowMovingAvg(spark: SparkSession, dir: String): DataFrame =
    EnrichJob.enrich(EventsAdapter.silver(spark, dir), seq_)
      .select("station_code", "last_reported", "bikes_available", "net_flow",
        "moving_avg_1h", "baseline_avg", "seq")
      .orderBy("station_code", "last_reported", "seq")

  /** Gold alerts job (P6-P9, W1 over enrichment). */
  def q05GoldAlerts(spark: SparkSession, dir: String): DataFrame =
    GoldAlerts.alerts(
        EnrichJob.enrich(EventsAdapter.silver(spark, dir), seq_),
        seq_, "INTERVAL 72 HOURS", GoldAlerts.relativeRule)
      .orderBy(col("bikes").asc, col("station_code").asc)

  /** Flagship serving query `/alerts/critical`: J1+J2+W2+A1+A2+O1. */
  def criticalChain(spark: SparkSession, dir: String, horizon: String): DataFrame = {
    val silver = EventsAdapter.silver(spark, dir)
    val enriched = EnrichJob.enrich(silver, seq_)
    val gold = GoldAlerts.alerts(enriched, seq_, horizon, GoldAlerts.relativeRule)
    Serving.criticalAlerts(gold, enriched, seq_,
      targetFilter = col("bikes") <= col("baseline_avg"))
  }

  def q02CriticalSparklines(spark: SparkSession, dir: String): DataFrame =
    criticalChain(spark, dir, "INTERVAL 72 HOURS")

  /** A4+J3+A6: `/health/pipeline` global stats + zombie reconciliation. */
  def q08Health(spark: SparkSession, dir: String): DataFrame = {
    val silver = EventsAdapter.silver(spark, dir)
    val enriched = EnrichJob.enrich(silver, seq_)
    // GBFS-shaped nested dimension built from `customer` (P14 explode path).
    val nested = Tables.customer(spark, dir)
      .agg(collect_list(struct(col("c_custkey").as("station_id"),
        col("c_name").as("name"))).as("stations"))
      .select(struct(col("stations")).as("data"))
    val asOfDate = to_date(lit("2024-01-30"))
    Serving.healthPipeline(enriched, nested, asOfDate)
  }

  /** J1: semi-join reduction (IN-subquery, reference `api.py:54`). */
  def q06SemiJoin(spark: SparkSession, dir: String): DataFrame = {
    val targets = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("o_custkey"))
    Tables.orders(spark, dir)
      .join(broadcast(targets), Seq("o_custkey"), "left_semi")
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
      .orderBy("o_orderkey")
  }

  /** J2+A2: inner equi-join + multi-key hash agg with exact decimal sums. */
  def q07JoinAgg(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    c.join(o, c("c_custkey") === o("o_custkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast(DecimalType(28, 2))).cast("double")
          .as("total_spent"),
        max(col("o_orderdate")).as("last_order"))
      .orderBy("c_custkey")
  }

  /** J4: broadcast dimension enrichment (events x customer). */
  def q09DimJoin(spark: SparkSession, dir: String): DataFrame = {
    val dim = Tables.customer(spark, dir)
      .select(col("c_custkey").as("user_id"), col("c_name"),
        col("c_mktsegment"))
    Tables.events(spark, dir)
      .join(broadcast(dim), Seq("user_id"), "left")
      .select("event_id", "user_id", "c_name", "c_mktsegment", "value")
      .orderBy("event_id")
  }

  /** A6: conditional aggregation (reference `api.py:72-74` folded in). */
  def q10ConditionalAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("value") <= 1, 1).otherwise(0)).as("n_low"),
        sum(when(col("value") > 10, 1).otherwise(0)).as("n_high"),
        sum(col("value").cast(DecimalType(28, 6))).cast("double")
          .as("sum_value"))
      .orderBy("event_type")

  /** P2-analog: JSON field extraction + aggregation over `events.props`. */
  def q11JsonExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      .orderBy("event_type")

  /** P14: explode/unnest — whitespace tokenization + global word counts. */
  def q12ExplodeTokens(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token").asc)

  /** O1/O4: global sort + top-k limit. */
  def q16TopKGlobal(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select("event_id", "user_id", "event_type", "value")
      .orderBy(col("value").desc, col("event_id").asc)
      .limit(50)

  /** TPC-H Q1-shaped pricing summary over lineitem (A2-A4 at bench scale). */
  def q13PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val dec = DecimalType(18, 4)
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("2001-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast(dec)).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast(dec)).cast("double").as("sum_base_price"),
        sum((col("l_extendedprice").cast(dec) *
          (lit(1).cast(dec) - col("l_discount").cast(dec)))).cast("double")
          .as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** TPC-H Q3-shaped: 3-way join, grouped revenue, global top-10. */
  def q14ShippingPriority(spark: SparkSession, dir: String): DataFrame = {
    val dec = DecimalType(18, 4)
    val cutoff = lit("1998-06-15").cast("timestamp")
    val c = Tables.customer(spark, dir).filter(col("c_mktsegment") === "AUTOMOBILE")
    val o = Tables.orders(spark, dir).filter(col("o_orderdate") < cutoff)
    val l = Tables.lineitem(spark, dir).filter(col("l_shipdate") > cutoff)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum((col("l_extendedprice").cast(dec) *
        (lit(1).cast(dec) - col("l_discount").cast(dec)))).cast("double")
        .as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey").asc)
      .limit(10)
  }

  /** TPC-H Q5-shaped: 5-way join through region->nation->customer->orders->
    * lineitem, revenue per nation. Dims broadcast; fact joins shuffle on
    * their keys.
    */
  def q15RevenueByNation(spark: SparkSession, dir: String): DataFrame = {
    val dec = DecimalType(18, 4)
    val r = Tables.region(spark, dir)
    val n = Tables.nation(spark, dir)
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    val l = Tables.lineitem(spark, dir)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        sum((col("l_extendedprice").cast(dec) *
          (lit(1).cast(dec) - col("l_discount").cast(dec)))).cast("double")
          .as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("r_name", "n_name")
  }

  /** Anti join: customers with no URGENT order (left_anti; Catalyst
    * plans the oracle's NOT EXISTS identically — the filtered side
    * broadcasts). "No order at all" would be vacuously empty in this
    * data: every customer orders.
    */
  def q17AntiJoin(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey").as("c_custkey"))
    Tables.customer(spark, dir)
      .join(o, Seq("c_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_mktsegment", "c_acctbal")
      .orderBy("c_custkey")
  }

  /** Correlated-aggregate subquery (TPC-H Q17 shape): lineitems below
    * 20% of their part's average quantity. Decorrelated Spark-first as a
    * per-part aggregate joined back — the plan Catalyst's
    * RewriteCorrelatedScalarSubquery would produce, stated explicitly.
    */
  def q18AvgQuantityCorr(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    val perPart = l.groupBy(col("l_partkey").as("pk"))
      .agg((sum(col("l_quantity").cast(DecimalType(28, 6))).cast("double") /
        count(lit(1))).as("avg_qty"))
    l.join(perPart, l("l_partkey") === perPart("pk"))
      .filter(col("l_quantity") < col("avg_qty") * 0.2)
      .groupBy(col("l_partkey"))
      .agg(
        count(lit(1)).as("n_small"),
        sum(col("l_extendedprice").cast(DecimalType(28, 4))).cast("double")
          .as("below_avg_revenue"))
      .orderBy("l_partkey")
  }

  /** TPC-H Q22-shaped composite (global scalar subquery + anti join +
    * grouped rollup of the survivors): customers whose balance exceeds
    * the average POSITIVE balance and who have no URGENT order, counted
    * per nation. The scalar average is a 1-row broadcast (never a
    * shuffle); the anti join broadcasts the filtered order keys; the
    * final agg is a tiny hash shuffle on nationkey. (Phone-prefix
    * country codes from the original Q22 map to c_nationkey here —
    * the fixture has no phone column.)
    */
  def q20GlobalFilterAnti(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val avgPos = c.filter(col("c_acctbal") > 0)
      .agg((sum(col("c_acctbal").cast(DecimalType(28, 6))).cast("double") /
        count(lit(1))).as("avg_bal"))
    val urgent = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey").as("c_custkey"))
    c.crossJoin(broadcast(avgPos))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(urgent, Seq("c_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("numcust"),
        sum(col("c_acctbal").cast(DecimalType(28, 4))).cast("double")
          .as("totacctbal"))
      .orderBy("c_nationkey")
  }

  /** MapType surface (the one Spark type family the suite hadn't
    * exercised): parse the JSON props column to `map<string,bigint>`,
    * explode to (key, value) pairs, aggregate per key — nothing
    * hardcodes 'k'. Per-row parse + explode then one hash agg on the
    * (small) key space.
    *
    * Fixture contract (like the media ASCII contract): props is clean
    * machine-generated JSON with integer values and keys free of `"`.
    * The oracle quotes each key into its JSON path (so '.' in keys is
    * safe), but a malformed-JSON row would hard-error DuckDB's CAST
    * while Spark's PERMISSIVE from_json nulls the row, and a
    * non-integer value nulls Spark's whole map vs DuckDB's per-key
    * cast — on dirty data the Spark results are the spec.
    */
  def q21MapSurface(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(explode(expr("from_json(props, 'map<string,bigint>')"))
        .as(Seq("key", "value")))
      .groupBy(col("key"))
      .agg(count(lit(1)).as("n"),
        sum(col("value")).cast("long").as("sum_value"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))
      .orderBy("key")

  /** ANSI SQL shared verbatim by Spark and DuckDB: the q13 pricing
    * summary as one dialect-neutral text.
    */
  val sharedPricingSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
      |    AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) *
      |    (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))))
      |    AS DOUBLE) AS sum_disc_price,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** The `spark.sql` entry path (SURVEY.md §1.1 "ad-hoc SQL views"):
    * register the table as a temp view and execute the SAME ANSI SQL
    * text the DuckDB oracle runs — one query, two engines, byte-equal
    * results.
    */
  def q19SqlSurface(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir).createOrReplaceTempView("lineitem")
    spark.sql(sharedPricingSql)
  }

  /** Subquery SQL surface: one query exercising correlated EXISTS,
    * correlated NOT EXISTS, a correlated scalar aggregate subquery, and
    * an uncorrelated scalar subquery — the four shapes Catalyst's
    * RewritePredicateSubquery / RewriteCorrelatedScalarSubquery turn
    * into semi-join, anti-join, left-outer-join+agg and a broadcast
    * scalar. Like q19, the SAME text runs in both engines: the surface
    * under test is the rewrite, not the SQL dialect. Deterministic:
    * integer counts until two IEEE divisions.
    */
  val sharedSubquerySql: String =
    """WITH base AS (
      |  SELECT c_custkey, c_name,
      |    (SELECT count(*) FROM orders o
      |      WHERE o.o_custkey = c.c_custkey
      |        AND o.o_orderpriority = '1-URGENT') AS n_urgent
      |  FROM customer c
      |  WHERE EXISTS (SELECT 1 FROM orders o
      |                WHERE o.o_custkey = c.c_custkey
      |                  AND o.o_orderpriority = '1-URGENT')
      |    AND NOT EXISTS (SELECT 1 FROM orders o
      |                    WHERE o.o_custkey = c.c_custkey
      |                      AND o.o_orderstatus = 'F')
      |)
      |SELECT c_custkey, c_name, n_urgent,
      |  CAST(n_urgent AS DOUBLE) /
      |    (SELECT CAST(sum(n_urgent) AS DOUBLE) / count(*) FROM base)
      |    AS urgency_ratio
      |FROM base ORDER BY c_custkey""".stripMargin

  def q22SubquerySurface(spark: SparkSession, dir: String): DataFrame = {
    Tables.customer(spark, dir).createOrReplaceTempView("customer")
    Tables.orders(spark, dir).createOrReplaceTempView("orders")
    spark.sql(sharedSubquerySql)
  }

  /** Recursive-CTE reachability (Spark 4's WITH RECURSIVE, SPARK-24497)
    * over the d03 near-dup pair graph: pairs are oriented doc_a < doc_b,
    * so the edge set is a DAG and the recursion provably terminates in
    * both engines; each source doc (never a doc_b) expands to every doc
    * reachable through ascending near-dup edges. The data-DEPENDENT
    * iteration d07 had to fix at 4 unrolled rounds (and
    * propagateToFixpoint drives from the driver) runs here entirely
    * inside the SQL engine — the third, declarative form of the same
    * graph computation, recursion depth bounded by the longest ascending
    * chain (family diameter, not corpus size).
    */
  def q23Reachability(spark: SparkSession, dir: String): DataFrame = {
    // The recursion re-scans this view once per iteration; it is a scan
    // of the write-once materialized pair graph (DedupOps.pairGraph), so
    // each round costs a tiny parquet read — no recompute, no pin needed.
    DedupOps.pairGraph(spark, dir).select("doc_a", "doc_b")
      .createOrReplaceTempView("neardup_edges")
    // DISTINCT inside the recursive step: the working table at depth k
    // is then the DISTINCT (root, node) pairs reachable in exactly k
    // steps — bounded by the pair count — instead of one row per WALK.
    // Near-dup families are cliques, and a k-clique has ~2^(k-2) walks
    // root->member; per-step dedup caps the blow-up at depth x pairs
    // (k^3-ish for a clique) while leaving the result set unchanged
    // (the final DISTINCT already collapsed duplicate pairs).
    spark.sql(
      """WITH RECURSIVE reach(root, node) AS (
        |  SELECT doc_a, doc_a FROM (
        |    SELECT DISTINCT doc_a FROM neardup_edges
        |    WHERE doc_a NOT IN (SELECT doc_b FROM neardup_edges))
        |  UNION ALL
        |  SELECT DISTINCT r.root, e.doc_b
        |  FROM reach r JOIN neardup_edges e ON e.doc_a = r.node
        |)
        |SELECT DISTINCT root, node FROM reach ORDER BY root, node""".stripMargin)
  }

  /** Correlated LATERAL subquery: per-customer top-2 orders by price.
    * The subquery references the outer row AND carries ORDER BY + LIMIT —
    * the shape Catalyst decorrelates into a window-rank rewrite
    * (DecorrelateInnerQuery): one hash shuffle on the join key, a
    * per-key rank, never a per-customer probe. The same text runs in
    * DuckDB (q19 discipline) modulo nothing — identical SQL.
    *
    * Scale posture: the rewrite is exactly W2's per-group top-k plan
    * (partial rank pushdown via WindowGroupLimit), so a billion
    * customers cost one shuffle; a nested-loop per outer row — what a
    * naive LATERAL executor does — would be a per-row subquery storm.
    */
  val sharedLateralSql: String =
    """SELECT c.c_custkey, c.c_mktsegment, t.o_orderkey, t.o_totalprice
      |FROM customer c, LATERAL (
      |  SELECT o_orderkey, o_totalprice
      |  FROM orders o
      |  WHERE o.o_custkey = c.c_custkey
      |  ORDER BY o_totalprice DESC, o_orderkey
      |  LIMIT 2
      |) t
      |ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey""".stripMargin

  def q24LateralTopK(spark: SparkSession, dir: String): DataFrame = {
    Tables.customer(spark, dir).createOrReplaceTempView("customer")
    Tables.orders(spark, dir).createOrReplaceTempView("orders")
    spark.sql(sharedLateralSql)
  }

  /** NULL-semantics surface: NULLIF-planted nulls, count(*) vs
    * count(col), a null-grouping key, and a null-safe equi-join
    * (Spark `<=>` / DuckDB IS NOT DISTINCT FROM) against a 3-row dim
    * whose key includes NULL. Spark keeps EqualNullSafe as a HASH join
    * key (no nested loop for the null bucket); explicit NULLS FIRST on
    * both sides because the engines' default null sort order differs.
    */
  def q25NullSurface(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"),
        nullif(col("o_orderstatus"), lit("O")).as("status_nn"),
        when(col("o_orderkey") % 10 === 0, lit(null))
          .otherwise(col("o_totalprice")).as("price_nn"))
    val dim = o.sparkSession.createDataFrame(Seq(
        (Option("F"), "finished"), (Option("P"), "pending"),
        (Option.empty[String], "open"))).toDF("s", "status_label")
    o.join(broadcast(dim), col("status_nn") <=> col("s"), "left")
      .groupBy(col("status_nn"), col("status_label"))
      .agg(count(lit(1)).cast("long").as("n_rows"),
        count(col("price_nn")).cast("long").as("n_price"),
        sum(when(col("price_nn").isNull, 1L).otherwise(0L))
          .cast("long").as("n_null_price"),
        countDistinct(col("o_custkey")).cast("long").as("n_cust"))
      .orderBy(asc_nulls_first("status_nn"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q24_lateral_topk" -> (q24LateralTopK _),
    "q25_null_surface" -> (q25NullSurface _),
    "q23_reachability" -> (q23Reachability _),
    "q22_subquery_surface" -> (q22SubquerySurface _),
    "q21_map_surface" -> (q21MapSurface _),
    "q20_global_filter_anti" -> (q20GlobalFilterAnti _),
    "q17_anti_join" -> (q17AntiJoin _),
    "q18_avg_quantity_corr" -> (q18AvgQuantityCorr _),
    "q19_sql_surface" -> (q19SqlSurface _),
    "q01_latest_per_station" -> (q01LatestPerStation _),
    "q02_critical_sparklines" -> (q02CriticalSparklines _),
    "q03_net_flow_moving_avg" -> (q03NetFlowMovingAvg _),
    "q05_gold_alerts" -> (q05GoldAlerts _),
    "q06_semi_join" -> (q06SemiJoin _),
    "q07_join_agg" -> (q07JoinAgg _),
    "q08_health" -> (q08Health _),
    "q09_dim_join" -> (q09DimJoin _),
    "q10_conditional_agg" -> (q10ConditionalAgg _),
    "q11_json_extract" -> (q11JsonExtract _),
    "q12_explode_tokens" -> (q12ExplodeTokens _),
    "q13_pricing_summary" -> (q13PricingSummary _),
    "q14_shipping_priority" -> (q14ShippingPriority _),
    "q15_revenue_by_nation" -> (q15RevenueByNation _),
    "q16_topk_global" -> (q16TopKGlobal _)
  )

  import EventsAdapter.{silverSql, enrichedSql, goldSql}

  val oracle: Map[String, String] = Map(
    "q23_reachability" ->
      s"""WITH RECURSIVE edges AS (
         |  SELECT doc_a, doc_b FROM (${DedupOps.d03Sql})
         |),
         |roots AS (
         |  SELECT DISTINCT doc_a FROM edges
         |  WHERE doc_a NOT IN (SELECT doc_b FROM edges)
         |),
         |reach(root, node) AS (
         |  SELECT doc_a, doc_a FROM roots
         |  UNION ALL
         |  SELECT DISTINCT r.root, e.doc_b
         |  FROM reach r JOIN edges e ON e.doc_a = r.node
         |)
         |SELECT DISTINCT root, node FROM reach ORDER BY root, node""".stripMargin,

    "q19_sql_surface" -> sharedPricingSql,
    "q22_subquery_surface" -> sharedSubquerySql,
    "q24_lateral_topk" -> sharedLateralSql,

    "q25_null_surface" ->
      """WITH o AS (
        |  SELECT o_orderkey, o_custkey,
        |    NULLIF(o_orderstatus, 'O') AS status_nn,
        |    CASE WHEN o_orderkey % 10 = 0 THEN NULL
        |         ELSE o_totalprice END AS price_nn
        |  FROM orders
        |),
        |dim(s, status_label) AS (
        |  VALUES ('F', 'finished'), ('P', 'pending'), (NULL, 'open')
        |)
        |SELECT status_nn, status_label,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(count(price_nn) AS BIGINT) AS n_price,
        |  CAST(sum(CASE WHEN price_nn IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_null_price,
        |  CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_cust
        |FROM o LEFT JOIN dim ON status_nn IS NOT DISTINCT FROM s
        |GROUP BY status_nn, status_label
        |ORDER BY status_nn NULLS FIRST""".stripMargin,

    "q21_map_surface" ->
      """WITH m AS (
        |  SELECT CAST(props AS JSON) AS j FROM events
        |),
        |kv AS (
        |  SELECT unnest(json_keys(j)) AS key, j FROM m
        |),
        |v AS (
        |  SELECT key,
        |    CAST(json_extract(j, '$."' || key || '"') AS BIGINT) AS value
        |  FROM kv
        |)
        |SELECT key, count(*) AS n,
        |       CAST(SUM(value) AS BIGINT) AS sum_value,
        |       min(value) AS min_value, max(value) AS max_value
        |FROM v GROUP BY key ORDER BY key""".stripMargin,

    "q20_global_filter_anti" ->
      """SELECT c_nationkey, count(*) AS numcust,
        |       CAST(SUM(CAST(c_acctbal AS DECIMAL(28,4))) AS DOUBLE)
        |         AS totacctbal
        |FROM customer c
        |WHERE c_acctbal > (
        |    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(28,6))) AS DOUBLE)
        |             / count(*)
        |    FROM customer WHERE c_acctbal > 0)
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_orderpriority = '1-URGENT')
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,

    "q17_anti_join" ->
      """SELECT c_custkey, c_name, c_mktsegment, c_acctbal
        |FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,

    "q18_avg_quantity_corr" ->
      """WITH pa AS (
        |  SELECT l_partkey AS pk,
        |         CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE)
        |           / count(*) AS avg_qty
        |  FROM lineitem GROUP BY l_partkey
        |)
        |SELECT l_partkey, count(*) AS n_small,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE)
        |         AS below_avg_revenue
        |FROM lineitem JOIN pa ON l_partkey = pk
        |WHERE l_quantity < avg_qty * 0.2
        |GROUP BY l_partkey ORDER BY l_partkey""".stripMargin,

    "q01_latest_per_station" ->
      s"""WITH $silverSql
         |SELECT station_code, station_name, bikes_available, docks_available,
         |       last_reported
         |FROM (SELECT *, row_number() OVER (PARTITION BY station_code
         |        ORDER BY last_reported DESC, seq DESC) AS rnk FROM silver)
         |WHERE rnk = 1 ORDER BY station_code""".stripMargin,

    "q02_critical_sparklines" ->
      s"""WITH $silverSql, $enrichedSql, $goldSql,
         |targets AS (
         |  SELECT station_code, station_name, bikes, alert_level FROM gold
         |  WHERE bikes <= baseline_avg
         |),
         |hist AS (
         |  SELECT * FROM enriched
         |  WHERE station_code IN (SELECT station_code FROM targets)
         |),
         |trends AS (
         |  SELECT * FROM (
         |    SELECT *, row_number() OVER (PARTITION BY station_code
         |      ORDER BY last_reported DESC, seq DESC) AS rnk
         |    FROM hist) WHERE rnk <= 5
         |)
         |SELECT t.station_code, tg.station_name, tg.bikes AS current_bikes,
         |       tg.alert_level,
         |       string_agg(CAST(CAST(t.bikes_available AS DECIMAL(28,6))
         |           AS VARCHAR), ','
         |         ORDER BY t.last_reported ASC, t.rnk ASC) AS sparkline_data
         |FROM trends t JOIN targets tg ON t.station_code = tg.station_code
         |GROUP BY t.station_code, tg.station_name, tg.bikes, tg.alert_level
         |ORDER BY current_bikes ASC, t.station_code ASC""".stripMargin,

    "q03_net_flow_moving_avg" ->
      s"""WITH $silverSql, $enrichedSql
         |SELECT station_code, last_reported, bikes_available, net_flow,
         |       moving_avg_1h, baseline_avg, seq
         |FROM enriched
         |ORDER BY station_code, last_reported, seq""".stripMargin,

    "q05_gold_alerts" ->
      s"""WITH $silverSql, $enrichedSql, $goldSql
         |SELECT station_code, station_name, bikes, trend, avg_1h,
         |       baseline_avg, last_reported, alert_level
         |FROM gold ORDER BY bikes ASC, station_code ASC""".stripMargin,

    "q06_semi_join" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
        |FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer
        |                    WHERE c_mktsegment = 'BUILDING')
        |ORDER BY o_orderkey""".stripMargin,

    "q07_join_agg" ->
      """SELECT c_custkey, c_name, c_mktsegment,
        |       count(*) AS n_orders,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE)
        |         AS total_spent,
        |       max(o_orderdate) AS last_order
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey, c_name, c_mktsegment
        |ORDER BY c_custkey""".stripMargin,

    "q08_health" ->
      s"""WITH $silverSql, $enrichedSql,
         |s AS (
         |  SELECT max(last_reported) AS latest_data_point,
         |         count(DISTINCT station_code) AS active_stations_today,
         |         CAST(SUM(CAST(bikes_available AS DECIMAL(28,6))) AS DOUBLE)
         |           AS total_bikes_available,
         |         CAST(SUM(CAST(docks_available AS DECIMAL(28,6))) AS DOUBLE)
         |           AS total_docks_available,
         |         CAST(SUM(CASE WHEN bikes_available = 0 THEN 1 ELSE 0 END)
         |           AS BIGINT) AS empty_readings,
         |         CAST(SUM(CASE WHEN bikes_available > 0
         |             AND bikes_available <= 3
         |             THEN 1 ELSE 0 END) AS BIGINT) AS low_readings
         |  FROM enriched WHERE date = DATE '2024-01-30'
         |),
         |r AS (SELECT count(*) AS total_expected_stations FROM customer)
         |SELECT s.*, r.total_expected_stations,
         |       r.total_expected_stations - s.active_stations_today
         |         AS zombie_stations
         |FROM s CROSS JOIN r""".stripMargin,

    "q09_dim_join" ->
      """SELECT event_id, user_id, c_name, c_mktsegment, value
        |FROM events LEFT JOIN (SELECT c_custkey AS user_id, c_name,
        |    c_mktsegment FROM customer) USING (user_id)
        |ORDER BY event_id""".stripMargin,

    "q10_conditional_agg" ->
      """SELECT event_type, count(*) AS n,
        |       CAST(SUM(CASE WHEN value <= 1 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_low,
        |       CAST(SUM(CASE WHEN value > 10 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_high,
        |       CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q11_json_extract" ->
      """SELECT event_type, count(*) AS n,
        |       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
        |         AS BIGINT) AS sum_k,
        |       MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
        |       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q12_explode_tokens" ->
      """SELECT token, count(*) AS n
        |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |GROUP BY token ORDER BY n DESC, token ASC""".stripMargin,

    "q16_topk_global" ->
      """SELECT event_id, user_id, event_type, value FROM events
        |ORDER BY value DESC, event_id ASC LIMIT 50""".stripMargin,

    "q13_pricing_summary" -> sharedPricingSql,

    "q14_shipping_priority" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) *
        |    (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))))
        |    AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'AUTOMOBILE'
        |  AND o_orderdate < TIMESTAMP '1998-06-15 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1998-06-15 00:00:00'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey ASC LIMIT 10""".stripMargin,

    "q15_revenue_by_nation" ->
      """SELECT r_name, n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) *
        |    (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))))
        |    AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin
  )
}
