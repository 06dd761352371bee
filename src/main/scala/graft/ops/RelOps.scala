package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** Nearest-event join — the both-directions completion of w03's
    * backward as-of: each event pairs with the SAME-user order closest
    * in time, in either direction. Two window passes over one union
    * (backward = w03's last-non-null machinery; forward = its mirror
    * with an unbounded-following frame), then a per-row arbitration on
    * exact integer microsecond distances — no all-pairs join anywhere;
    * the oracle states the all-pairs form declaratively.
    *
    * Ties, all integer-exact: equal distance prefers the BACKWARD
    * candidate (earlier date); within a side, equal dates prefer the
    * smaller orderkey (both window sorts are arranged so last()/first()
    * land on the minimum okey). Events whose user has no orders keep a
    * null match.
    */
  def w22NearestJoin(spark: SparkSession, dir: String): DataFrame =
    nearestJoin(
      Tables.events(spark, dir).select("event_id", "user_id", "ts"),
      Tables.orders(spark, dir).select(
        col("o_custkey").as("user_id"),
        col("o_orderkey").as("okey"),
        col("o_orderdate").as("odate")))

  /** The w22 core over any (event_id, user_id, ts) / (user_id, okey,
    * odate) frames — exposed so the spec can plant exact tie cases
    * (equidistant both-directions, equal-date multi-key, orderless
    * user), which the fixture's timestamps hit only by accident.
    */
  private[ops] def nearestJoin(events: DataFrame, orders: DataFrame): DataFrame = {
    val ev = events.select(
      col("user_id"), col("ts"), col("event_id"),
      lit(null).cast("long").as("okey"),
      lit(null).cast("timestamp").as("odate"),
      lit(0).as("is_order"))
    val od = orders.select(
      col("user_id"), col("odate").cast("timestamp").as("ts"),
      lit(null).cast("long").as("event_id"),
      col("okey"), col("odate").cast("timestamp").as("odate"),
      lit(1).as("is_order"))
    // backward: latest date <= ts; okey DESC so last() = MIN okey there
    val wB = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("is_order").desc, col("okey").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    // forward: earliest date >= ts; okey ASC so first() = MIN okey there
    val wF = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("is_order").asc, col("okey").asc)
      .rowsBetween(0, Window.unboundedFollowing)
    val useB = col("bdate").isNotNull &&
      (col("fdate").isNull || col("bdist") <= col("fdist"))
    ev.union(od)
      .withColumn("bkey", last(col("okey"), ignoreNulls = true).over(wB))
      .withColumn("bdate", last(col("odate"), ignoreNulls = true).over(wB))
      .withColumn("fkey", first(col("okey"), ignoreNulls = true).over(wF))
      .withColumn("fdate", first(col("odate"), ignoreNulls = true).over(wF))
      .filter(col("is_order") === 0)
      .withColumn("bdist", unix_micros(col("ts")) - unix_micros(col("bdate")))
      .withColumn("fdist", unix_micros(col("fdate")) - unix_micros(col("ts")))
      .select(col("event_id"), col("user_id"), col("ts"),
        when(useB, col("bkey")).otherwise(col("fkey"))
          .as("nearest_orderkey"),
        when(useB, col("bdate")).otherwise(col("fdate"))
          .as("nearest_orderdate"),
        when(useB, col("bdist")).otherwise(col("fdist")).as("dist_us"))
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

  /** Bag-semantics set operations (EXCEPT ALL / INTERSECT ALL) — the
    * multiset twins w05's DISTINCT forms can't express: duplicate
    * CARDINALITY matters (a customer with 3 qualifying orders and 1
    * urgent one keeps 2 copies under EXCEPT ALL, where EXCEPT keeps
    * none). One query emits both ops tagged, totally ordered.
    *
    * Plan at scale: Spark compiles exceptAll/intersectAll to per-key
    * count aggregation + replicated-row generation — one hash shuffle
    * per side on the key, output rows regenerated from counts; never a
    * row-by-row comparison. The same shape holds at any duplication
    * factor.
    */
  def w18SetOpsAll(spark: SparkSession, dir: String): DataFrame = {
    val a = Tables.orders(spark, dir)
      .filter(col("o_totalprice") > 150000)
      .select(col("o_custkey").as("custkey"))
    val b = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey").as("custkey"))
    a.exceptAll(b).select(lit("except_all").as("op"), col("custkey"))
      .union(a.intersectAll(b)
        .select(lit("intersect_all").as("op"), col("custkey")))
      .orderBy("op", "custkey")
  }

  /** Two-sided interval-OVERLAP join via bin replication — the
    * generalization of w12's point-in-interval range join. Left side:
    * per-user 30-min-gap sessions (the w02 derivation) as closed
    * [s_start, s_end] microsecond intervals. Right side: "spike hours"
    * — hour buckets whose event count exceeds 1.1x the mean bucket
    * count (integer cross-multiplied: cnt*n_buckets*10 > total*11 — no
    * division, scale-free, deterministic). Overlap pairs = session x
    * spike hour they intersect.
    *
    * Scale mechanics: each session EXPLODES into the hour bins it
    * touches (`sequence(start div H, end div H)` — replication bounded
    * by interval length / bin width), spikes are keyed by their bin,
    * and the join is pure EQUALITY on the bin — a hash join, never the
    * inequality nested-loop a naive overlap predicate compiles to. A
    * spike spans exactly one bin so no pair-dedup pass is needed;
    * general right-side intervals would bin-replicate too and dedup on
    * the pair key. This is THE standard temporal/spatial overlap plan
    * at 100 TB (bin width trades replication factor vs join fanout).
    */
  def w19IntervalOverlap(spark: SparkSession, dir: String): DataFrame = {
    val H = 3600000000L // 1h in microseconds
    val ev = Tables.events(spark, dir)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val gapUs = unix_micros(col("ts")) -
      unix_micros(lag(col("ts"), 1).over(w))
    val newSession = when(gapUs.isNull || gapUs > 1800L * 1000000L, 1)
      .otherwise(0)
    val sessions = ev
      .withColumn("sess_id",
        sum(newSession).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("sess_id"))
      .agg(min(unix_micros(col("ts"))).as("s_start"),
        max(unix_micros(col("ts"))).as("s_end"))
    val buckets = ev
      .select(expr(s"unix_micros(ts) div $H").as("h"))
      .groupBy("h").agg(count(lit(1)).as("cnt"))
    val tot = buckets.agg(sum(col("cnt")).as("total"),
      count(lit(1)).as("n_buckets"))
    val spikes = buckets.crossJoin(broadcast(tot))
      .filter(col("cnt") * col("n_buckets") * 10 > col("total") * 11)
      .select(col("h"), col("cnt").as("n_spike_events"))
    val binned = sessions.select(col("user_id"), col("sess_id"),
      col("s_start"), col("s_end"),
      explode(expr(s"sequence(s_start div $H, s_end div $H)")).as("h"))
    binned.join(spikes, Seq("h"))
      .select(col("user_id"), col("sess_id"), col("s_start"), col("s_end"),
        (col("h") * H).as("spike_start_us"), col("n_spike_events"),
        (least(col("s_end"), col("h") * H + (H - 1)) -
          greatest(col("s_start"), col("h") * H)).as("overlap_us"))
      .orderBy("user_id", "sess_id", "spike_start_us")
  }

  /** Z-order (Morton-curve) clustering stats — the arithmetic core of
    * Delta/Iceberg `OPTIMIZE ZORDER BY(a, b)`: min-max scale two
    * dimensions (user_id, event hour) to 16-bit rank space, interleave
    * their bits into a 32-bit z-value, bucket on the top 6 z-bits (an
    * 8x8 grid) and report each bucket's 2-D bounding box. The payoff
    * the stats exhibit: every z-bucket is TIGHT IN BOTH dimensions
    * (~1/8 of each global range, spec-pinned), so files written in
    * z-bucket order let min/max file stats prune scans with predicates
    * on EITHER dimension — a 1-D sort gives tight bounds on one
    * dimension and useless full-range bounds on the other.
    *
    * All-integer pipeline (scale, interleave, bucket are exact bit/÷
    * arithmetic — bit-identical across engines); the only shuffles are
    * the 1-row min/max agg (broadcast back) and the O(64)-group bucket
    * agg. At 100 TB the same z column feeds repartitionByRange +
    * sortWithinPartitions before the write — the layout step itself is
    * I/O, not compute.
    */
  def w20ZorderStats(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id").as("u"),
        expr("unix_micros(ts) div 3600000000").as("h"))
    val stats = ev.agg(min(col("u")).as("min_u"), max(col("u")).as("max_u"),
      min(col("h")).as("min_h"), max(col("h")).as("max_h"))
    ev.crossJoin(broadcast(stats))
      .select(col("u"), col("h"),
        expr("(u - min_u) * 65535 div greatest(max_u - min_u, 1)").as("a"),
        expr("(h - min_h) * 65535 div greatest(max_h - min_h, 1)").as("b"))
      .withColumn("z", graft.sources.ZOrder.zCol(col("a"), col("b"), 16))
      .withColumn("z_bucket", graft.sources.ZOrder.bucket(col("z"), 16, 3))
      .groupBy("z_bucket")
      .agg(count(lit(1)).as("n"),
        min(col("u")).as("min_user"), max(col("u")).as("max_user"),
        min(col("h")).as("min_hour"), max(col("h")).as("max_hour"))
      .orderBy("z_bucket")
  }

  /** Distinct-cardinality sketch (HLL++): the shuffle-light scale path for
    * A4's COUNT(DISTINCT) (SURVEY.md §2.4). The raw estimate is
    * engine-specific (no cross-engine oracle can state it), so the
    * OUTPUT ships the exact count plus a deterministic exact-integer
    * in-band CHECK of the estimate — |approx - exact| * 20 <= exact,
    * i.e. relative error within 5% at rsd = 0.02 — which a DuckDB
    * oracle CAN state (the flag must be 1 for every group). An HLL
    * drift out of band now fails the hash gate instead of hiding in a
    * rows-only row (VERDICT r11 item 3); the estimate itself is
    * additionally pinned against exact counts at both dev SFs in
    * OpsSpec.
    */
  def w06ApproxDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        approx_count_distinct(col("user_id"), 0.02).as("approx_users"),
        countDistinct(col("user_id")).as("exact_users"),
        count(lit(1)).as("n"))
      .select(col("event_type"), col("exact_users"), col("n"),
        when(abs(col("approx_users") - col("exact_users")) * 20L
          <= col("exact_users"), 1L).otherwise(0L)
          .as("hll_within_5pct"))
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

  /** Presentation sort for a provably group-cardinality frame (a few
    * rows per event_type): one partition + a local sort. A global
    * `orderBy` would range-partition, and RangePartitioner runs a
    * separate SAMPLING JOB over the input first — measurable fixed
    * latency on a 5-row result, pure waste when the frame fits one
    * partition by construction.
    */
  private def sortTiny(df: DataFrame, cols: String*): DataFrame =
    df.coalesce(1).sortWithinPartitions(cols.head, cols.tail: _*)

  // ---- Exact rank selection without a full-group sort (w08/w09) --------
  //
  // The naive plan (row_number over Window.partitionBy(event_type)) sorts
  // EVERY row of a group on ONE task — with ~5 distinct event_types that is
  // 5 mega-partitions at 100 TB, a single-reducer scale-killer. The oracle
  // SQL states rank semantics over ORDER BY (value, event_id), but the
  // SELECTED VALUE at any rank depends only on the value ordering (rows
  // tied on value share it), so exact rank lookup needs only per-distinct-
  // value counts, never a row-level sort:
  //
  //   1. one hash-agg pass   -> per-group (min, max, count)        [tiny]
  //   2. one hash-agg pass   -> fixed-width value-bucket histogram [tiny]
  //      + cumulative bucket offsets (window over G*B rows)
  //   3. locate, per target rank, the single bucket containing it  [tiny]
  //   4. one hash-agg pass over ONLY the candidate buckets
  //      (broadcast semi-reduction) -> per-distinct-value counts,
  //      running sum within each (group, bucket)                   [small]
  //   5. rank r's value = the distinct value v whose cumulative range
  //      (off + cum - ec, off + cum] contains r.
  //
  // Big-side work is 3 scan+hash-agg passes (map-side combine, no sort);
  // the only windows run over the G*B-row histogram and over the distinct
  // values inside <=4 candidate buckets per group (ties collapse in step 4,
  // so an all-equal group contributes ONE row). A value-skewed bucket could
  // still concentrate distinct values; a second histogram level inside the
  // candidate bucket would bound that too — not needed at current scale.

  private val RankBuckets = 1024

  /** Per-group stats that both drive the bucket bounds and ride along as
    * the output `n` column. Exact min/max make the bucket function
    * deterministic across engines and partitionings.
    */
  private[ops] def rankStats(ev: DataFrame): DataFrame =
    ev.groupBy("event_type").agg(
      min(col("value")).as("vmin"), max(col("value")).as("vmax"),
      count(lit(1)).as("cnt"))

  /** Given tiny `targets` (event_type, r, extra columns...), return the
    * target rows + `value`, where value is the value at ascending
    * 1-based rank r within the group (value-ordered; ties share the
    * selected value). Extra target columns (quantile labels, the group
    * count) ride through untouched — callers that need them in the
    * output thread them here instead of re-joining `stats` afterwards,
    * which would re-run the big-side scan+agg a second time.
    */
  private[ops] def valuesAtRanks(ev: DataFrame, stats: DataFrame,
      targets: DataFrame): DataFrame = {
    val targetCols = targets.columns.toSeq
    val b = lit(RankBuckets)
    // Cached: BOTH downstream passes (histogram, candidate-bucket
    // reduction) consume this frame — uncached, each one re-scans the
    // source and codegens its own copy of the scan+join+bucketize
    // pipeline (2x Janino for the big-side stage, the dominant solo-cold
    // cost of the w08/w09/p08 family).
    val bucketed = graft.Caches.cache(
      ev.join(broadcast(stats), Seq("event_type"))
        .withColumn("bucket",
          when(col("vmax") > col("vmin"),
            least(b - 1, floor((col("value") - col("vmin")) /
              (col("vmax") - col("vmin")) * b)).cast("long"))
            .otherwise(lit(0L)))
        .select("event_type", "bucket", "value"))
    val hist = bucketed.groupBy("event_type", "bucket")
      .agg(count(lit(1)).as("bn"))
    val wOff = Window.partitionBy(col("event_type")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = hist.withColumn("off",
      coalesce(sum(col("bn")).over(wOff), lit(0L)))
    // the single bucket whose cumulative range contains each target rank
    val candBuckets = targets.join(offsets, Seq("event_type"))
      .filter(col("r") > col("off") && col("r") <= col("off") + col("bn"))
    val bucketKeys = candBuckets
      .select("event_type", "bucket", "off").distinct()
    // reduce the big side to candidate buckets, then collapse ties
    val vals = bucketed
      .join(broadcast(bucketKeys), Seq("event_type", "bucket"))
      .groupBy("event_type", "bucket", "off", "value")
      .agg(count(lit(1)).as("ec"))
    val wCum = Window.partitionBy(col("event_type"), col("bucket"))
      .orderBy(col("value")).rowsBetween(Window.unboundedPreceding, 0)
    val ranked = vals.withColumn("cum_end",
      col("off") + sum(col("ec")).over(wCum))
    ranked.join(
        broadcast(candBuckets.select("bucket", targetCols: _*)),
        Seq("event_type", "bucket"))
      .filter(col("r") > col("cum_end") - col("ec") &&
        col("r") <= col("cum_end"))
      .select(targetCols.head, targetCols.tail :+ "value": _*)
  }

  /** Exact distributed median per group via two-phase rank selection
    * (values at ranks (n+1)/2 and (n+2)/2, averaged — identical semantics
    * to the row_number formulation the oracle states, without its
    * single-task-per-group sort; see the plan note above).
    * Deterministic across engines, unlike percentile_approx sketches.
    */
  def w08ExactMedian(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select("event_type", "value")
    val stats = rankStats(ev)
    // `div` (integer division): Spark's `/` on integers yields DOUBLE.
    // distinct: odd counts hit one rank — the oracle's OR filter also
    // picks one row there, two on even counts. `cnt` rides through
    // valuesAtRanks as the output `n` — joining stats back instead
    // would re-run the big-side scan+agg.
    val targets = stats
      .select(col("event_type"), col("cnt"),
        explode(array(expr("(cnt + 1) div 2"), expr("(cnt + 2) div 2")))
          .as("r"))
      .distinct()
    sortTiny(valuesAtRanks(ev, stats, targets)
      .groupBy(col("event_type"), col("cnt"))
      .agg((sum(col("value").cast(DecimalType(28, 6))).cast("double") /
        count(lit(1))).as("median_value"))
      .select(col("event_type"), col("median_value"), col("cnt").as("n")),
      "event_type")
  }

  /** Exact rank-based quantiles (p25/p50/p75 as the value at rank
    * ceil(q*n), no interpolation — deterministic across engines, unlike
    * percentile sketches or interpolating quantile_cont). Same two-phase
    * rank selection as w08; one rank can serve several quantiles.
    */
  def w09Quantiles(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select("event_type", "value")
    val stats = rankStats(ev)
    val qs = Seq(0.25 -> "p25", 0.5 -> "p50", 0.75 -> "p75")
    // The quantile label q and the group count ride through
    // valuesAtRanks (a rank shared by two quantiles just yields two
    // target rows in the same candidate bucket) — no join-back of the
    // labels and no second stats scan for the output `n`.
    val wanted = stats
      .select(col("event_type"), col("cnt"),
        explode(array(qs.map { case (q, name) =>
          struct(lit(name).as("q"),
            expr(s"CAST(ceil(cnt * $q) AS BIGINT)").as("r"))
        }: _*)).as("t"))
      .select(col("event_type"), col("cnt"),
        col("t.q").as("q"), col("t.r").as("r"))
    sortTiny(valuesAtRanks(ev, stats, wanted)
      .groupBy(col("event_type"), col("cnt"))
      .agg(
        max(when(col("q") === "p25", col("value"))).as("p25"),
        max(when(col("q") === "p50", col("value"))).as("p50"),
        max(when(col("q") === "p75", col("value"))).as("p75"))
      .select(col("event_type"), col("p25"), col("p50"), col("p75"),
        col("cnt").as("n")),
      "event_type")
  }

  /** Median absolute deviation per group — the robust-statistics
    * companion to w08/w09, and the operator that proves the two-phase
    * rank machinery COMPOSES: pass 1 selects the exact median (w08's
    * decimal-exact form), the corpus re-derives |value - median| as a
    * new value column, pass 2 selects the LOWER median of the
    * deviations (rank (n+1) div 2 — a single rank, so no two-value
    * averaging and no decimal re-cast of derived doubles, which is
    * what keeps the result bit-identical across engines: the deviation
    * is one IEEE subtraction + abs in both).
    *
    * Scale: both passes are the w08 plan — scan + hash-agg passes with
    * a 1024-bucket histogram, no per-group sort; the deviation column
    * is a map-side derivation off a broadcast of G median rows.
    */
  def w23Mad(spark: SparkSession, dir: String): DataFrame =
    sortTiny(madStats(spark, dir), "event_type")

  // Write-once MAD-stats materialization, the pairGraph discipline
  // (DedupOps.materializedRoot) applied to the w23/w29 common prefix:
  // both queries need the SAME G-row (event_type, median_value, mad,
  // n) table, and the two-phase rank machinery that derives it costs
  // ~2s of fixed plan/stage overhead per execution (measured
  // data-independent, sf0.01 == sf0.1 — r8 VERDICT item 4). Built on
  // first access per dataset dir per JVM (rebuilt if the dir's content
  // fingerprint moves — the ADVICE r9 staleness fix, via Materialized);
  // every consumer scans the G-row parquet. Values are identical by
  // construction (the build IS madOf), so oracle hashes are untouched.
  private[graft] def madBuildCount = graft.Materialized.buildCount

  /** The raw (unmaterialized) madstats build plan — exposed so
    * PlanAuditSpec can audit the write-once build the query sweep never
    * sees (it executes during DataFrame construction; see Materialized).
    */
  private[graft] def madStatsBuild(
      spark: SparkSession, dir: String): DataFrame =
    madOf(Tables.events(spark, dir).select("event_type", "value"))

  private[graft] def madStats(spark: SparkSession, dir: String): DataFrame =
    graft.Materialized.table(spark, s"madstats:$dir", dir)(
      madStatsBuild(spark, dir))

  /** The w23 core over any (event_type, value) frame — exposed so the
    * spec can pin hand-computed odd/even-count and outlier cases.
    */
  private[ops] def madOf(ev: DataFrame): DataFrame = {
    val stats = rankStats(ev)
    val medTargets = stats
      .select(col("event_type"), col("cnt"),
        explode(array(expr("(cnt + 1) div 2"), expr("(cnt + 2) div 2")))
          .as("r"))
      .distinct()
    // cached: G rows, but its lineage is the WHOLE pass-1 rank
    // selection — consumed by the deviation join and the final output
    // join, which would otherwise each re-run pass 1
    val med = graft.Caches.cache(valuesAtRanks(ev, stats, medTargets)
      .groupBy(col("event_type"), col("cnt"))
      .agg((sum(col("value").cast(DecimalType(28, 6))).cast("double") /
        count(lit(1))).as("median_value")))
    // cached: the deviation frame feeds its own rankStats AND pass 2's
    // bucketize — uncached, the events scan + median join re-run per
    // consumer (and pass 1's whole median selection re-runs with them,
    // since `med` sits under `dev` in the plan)
    val dev = graft.Caches.cache(ev
      .join(broadcast(med.select("event_type", "median_value")),
        Seq("event_type"))
      .select(col("event_type"),
        abs(col("value") - col("median_value")).as("value")))
    val dstats = rankStats(dev)
    val madTargets = dstats
      .select(col("event_type"), expr("(cnt + 1) div 2").as("r"))
    val mad = valuesAtRanks(dev, dstats, madTargets)
      .select(col("event_type"), col("value").as("mad"))
    sortTiny(med
      .join(mad, Seq("event_type"))
      .select(col("event_type"), col("median_value"), col("mad"),
        col("cnt").as("n")),
      "event_type")
  }

  /** CUBE grouping sets over orders: all four (status, priority)
    * grouping combinations in one pass — Catalyst expands the cube into
    * a single Expand + hash agg, so the plan stays one shuffle no matter
    * how many grouping sets (vs one scan per set if hand-unioned).
    */
  def w10Cube(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        grouping(col("o_orderstatus")).cast("long").as("g_st"),
        grouping(col("o_orderpriority")).cast("long").as("g_pr"),
        count(lit(1)).as("n"),
        sum(col("o_totalprice").cast(DecimalType(28, 4))).cast("double")
          .as("sum_price"))
      .select(col("o_orderstatus"), col("o_orderpriority"),
        col("g_st"), col("g_pr"), col("n"), col("sum_price"))
      .orderBy(col("g_st"), col("g_pr"), col("o_orderstatus"),
        col("o_orderpriority"))

  /** Pivot event_type counts into columns, one row per user. The value
    * list is EXPLICIT — the form that scales: without it Spark runs a
    * driver-side distinct over the pivot column first (collect + an
    * extra job over the full input) and the output schema depends on
    * the data. The oracle states the equivalent conditional aggregation.
    */
  /** The pivot core WITHOUT the presentation sort — w15's melt composes
    * on this (its own final orderBy supersedes any inner ordering, and
    * an inherited global sort would be a wasted single-task funnel).
    */
  private def pivotCore(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .select(col("user_id"), col("click").as("n_click"),
        col("error").as("n_error"), col("purchase").as("n_purchase"),
        col("signup").as("n_signup"), col("view").as("n_view"))

  def w11Pivot(spark: SparkSession, dir: String): DataFrame =
    pivotCore(spark, dir).orderBy("user_id")

  /** Range join: for each click, aggregate the same user's errors in
    * [ts, ts+1h). The naive inequality join is a broadcast-nested-loop
    * (O(clicks x errors) comparisons — dead at 100 TB); instead both
    * sides are binned to the 1-hour grid and each click probes bins
    * (b, b+1) via EQUALITY join on (user_id, bin) — any error within
    * the hour lands in one of the two bins, the residual range filter
    * is exact, and a click's two probe bins never double-count (an
    * error row sits in exactly one bin). Shuffle-hash-joinable, skew
    * bounded by per-(user, hour) density.
    */
  def w12RangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val binUs = 3600L * 1000000L
    val ev = Tables.events(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"),
        unix_micros(col("ts")).as("cus"))
      .withColumn("probe_bin",
        explode(array(expr(s"unix_micros(ts) div $binUs"),
          expr(s"unix_micros(ts) div $binUs + 1"))))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), unix_micros(col("ts")).as("eus"),
        col("value"),
        expr(s"unix_micros(ts) div $binUs").as("probe_bin"))
    clicks.join(errors, Seq("user_id", "probe_bin"))
      .filter(col("eus") >= col("cus") && col("eus") < col("cus") + binUs)
      .groupBy(col("event_id"), col("user_id"), col("ts"))
      .agg(count(lit(1)).as("n_errors"),
        sum(col("value").cast(DecimalType(28, 6))).cast("double")
          .as("sum_error_value"))
      .orderBy("event_id")
  }

  /** Analytic window-function suite over each user's event timeline:
    * row_number / ntile / percent_rank / cume_dist / lag in ONE window
    * spec, so Catalyst evaluates them in a single WindowExec pass after
    * one shuffle+sort on user_id. Partitioning by user_id (high
    * cardinality) is the scale-safe choice — a low-cardinality partition
    * key like event_type would put whole groups on single tasks (the
    * exact trap w08/w09 were re-planned out of). percent_rank/cume_dist
    * are ratios of integer counts — bit-identical across engines.
    */
  def w13WindowSuite(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir).select(
      col("event_id"), col("user_id"), col("ts"),
      row_number().over(w).cast("long").as("seq"),
      ntile(4).over(w).cast("long").as("quartile"),
      percent_rank().over(w).as("pct_rank"),
      cume_dist().over(w).as("cume"),
      (unix_micros(col("ts")) -
        unix_micros(lag(col("ts"), 1).over(w))).as("gap_us"))
      .orderBy("event_id")
  }

  /** FULL OUTER reconciliation: hourly click totals vs hourly error
    * totals — hours with only one side present survive with nulls on
    * the other (the daily-ops "what happened in hours with errors but
    * no traffic" question). Full outer can't broadcast (both sides must
    * be complete), so the plan is a shuffle join on the hour key after
    * two partial aggs — the right shape: the join runs over O(hours)
    * aggregated rows, never raw events.
    */
  def w14FullOuter(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    def hourly(t: String, cname: String): DataFrame =
      ev.filter(col("event_type") === t)
        .groupBy(date_trunc("hour", col("ts")).as("hour"))
        .agg(count(lit(1)).as(cname))
    hourly("click", "n_clicks")
      .join(hourly("error", "n_errors"), Seq("hour"), "full_outer")
      .orderBy("hour")
  }

  /** Unpivot (melt): w11's pivoted per-user counts back to long form —
    * the round trip proves pivot and unpivot are inverses (the oracle
    * states the direct GROUP BY, which the melt must reproduce exactly
    * once zero-count fill rows are dropped). Unpivot is a zero-shuffle
    * projection (each row expands to 5), so the plan cost is w11's.
    */
  def w15Unpivot(spark: SparkSession, dir: String): DataFrame =
    pivotCore(spark, dir)
      .unpivot(
        Array(col("user_id")),
        Array(col("n_click"), col("n_error"), col("n_purchase"),
          col("n_signup"), col("n_view")),
        "metric", "n")
      .withColumn("event_type", expr("substring(metric, 3)"))
      .filter(col("n") > 0)
      .select("user_id", "event_type", "n")
      .orderBy("user_id", "event_type")

  /** Explicit GROUPING SETS — the third member of the grouped-analytics
    * family next to w04 (ROLLUP) and w10 (CUBE): an arbitrary set list
    * that neither rollup nor cube can express without waste — here
    * (status, priority), (priority), and grand total, deliberately
    * SKIPPING the (status) set cube would force. Catalyst expands the
    * sets into one Expand + a single hash agg: one shuffle regardless of
    * how many sets, vs one scan per set if hand-unioned.
    */
  def w16GroupingSets(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("graft_w16_orders")
    spark.sql(
      """SELECT o_orderstatus, o_orderpriority,
        |       CAST(grouping(o_orderstatus) AS BIGINT) AS g_st,
        |       CAST(grouping(o_orderpriority) AS BIGINT) AS g_pr,
        |       count(*) AS n,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE)
        |         AS sum_price
        |FROM graft_w16_orders
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
        |                        (o_orderpriority), ())
        |ORDER BY g_st, g_pr, o_orderstatus, o_orderpriority""".stripMargin)
  }

  /** Running COUNT(DISTINCT) over an ordered window — an aggregate Spark's
    * window operator does not support directly (`count(distinct ...)
    * OVER` is rejected by the analyzer) and a naive per-row set would be
    * O(n^2) state. The scalable formulation: flag each row that is the
    * FIRST occurrence of its (user, event_type) (row_number over the
    * composite key == 1), then running-sum the flags over the per-user
    * time order. Two window shuffles, both partition-local sorts over
    * bounded user partitions — no distinct-set state anywhere, so the
    * same plan holds when one user has a million events. Order is total
    * ((ts, event_id) tiebreak), so both engines agree row-for-row.
    */
  def w17RunningDistinct(spark: SparkSession, dir: String): DataFrame = {
    val wFirst = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    val wRun = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .withColumn("first_seen",
        when(row_number().over(wFirst) === 1, 1L).otherwise(0L))
      .withColumn("n_distinct_types", sum(col("first_seen")).over(wRun))
      .select("event_id", "user_id", "ts", "event_type", "n_distinct_types")
      .orderBy("event_id")
  }

  /** SCD2 (slowly-changing-dimension type 2) build: turn a change log
    * (orders = "customer's priority changed to X at date D") into the
    * versioned dimension table — one row per (key, version) with
    * [valid_from, valid_to) half-open validity, valid_to = next
    * change's date (NULL on the current version), version_no dense per
    * key, is_current flag. This is the table Delta's MERGE-based SCD2
    * recipe maintains incrementally; facts then join by key + as-of
    * (w03's union trick) — the build itself is the missing half.
    *
    * One window shuffle on the dimension key (lead + row_number share
    * the same sort); the dimension is key-population-sized, never
    * fact-sized. Ties within a date break on o_orderkey so versions
    * are totally ordered in both engines.
    */
  def w21Scd2Build(spark: SparkSession, dir: String): DataFrame =
    scd2Dim(spark, dir)
      .withColumn("is_current",
        when(col("valid_to").isNull, 1L).otherwise(0L))
      .orderBy("custkey", "version_no")

  /** The SCD2 dimension body (w21 without presentation columns/sort),
    * shared by the build (w21) and the point-in-time consume (w24).
    */
  private def scd2Dim(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(spark, dir)
      .select(col("o_custkey").as("custkey"),
        col("o_orderpriority").as("priority"),
        col("o_orderdate").as("valid_from"),
        lead(col("o_orderdate"), 1).over(w).as("valid_to"),
        row_number().over(w).cast("long").as("version_no"))
  }

  /** Point-in-time (as-of) consume of the w21 SCD2 dimension: every
    * lineitem is joined to the customer-priority version that was valid
    * at its ship date — the feature-store "point-in-time correct join"
    * that keeps a training pipeline from reading future dimension state
    * (the temporal twin of p13's leakage-safe split).
    *
    * No inequality join anywhere: version-boundary rows union with fact
    * rows and ONE window pass per custkey picks, for each fact, the last
    * boundary at or before its timestamp (w03's last-non-null machinery).
    * Tie rules are total: a version starting ON the ship date applies
    * (boundaries sort before facts at equal ts), and same-date versions
    * resolve to the highest version_no — exactly the rows the oracle's
    * half-open [valid_from, valid_to) inequality join keeps, empty
    * intervals skipped on both engines. The oracle's inequality form is
    * the declarative statement; per-customer it is quadratic, while this
    * plan is one shuffle + sort of facts+boundaries on the dimension key.
    */
  def w24Scd2Asof(spark: SparkSession, dir: String): DataFrame = {
    val facts = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate"))
      .join(Tables.orders(spark, dir)
        .select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("custkey"), col("l_orderkey"),
        col("l_linenumber"), col("l_shipdate"))
    scd2AsofCore(scd2Dim(spark, dir), facts)
  }

  /** The w24 core over any SCD2 dim (custkey, priority, valid_from,
    * version_no) and fact (custkey, l_orderkey, l_linenumber,
    * l_shipdate) frames — exposed so the spec can plant the tie cases
    * (version starting ON the ship date, same-date versions, a fact
    * before the first version) the fixture hits only by accident.
    */
  private[graft] def scd2AsofCore(
      dimIn: DataFrame, factsIn: DataFrame): DataFrame = {
    val dim = dimIn.select(
      col("custkey"), col("valid_from").as("ts"),
      lit(0).as("kind"), col("version_no"), col("priority"),
      lit(null).cast("long").as("l_orderkey"),
      lit(null).cast("int").as("l_linenumber"))
    val facts = factsIn.select(
      col("custkey"), col("l_shipdate").as("ts"),
      lit(1).as("kind"), lit(null).cast("long").as("version_no"),
      lit(null).cast("string").as("priority"),
      col("l_orderkey"), col("l_linenumber"))
    // boundaries before facts at equal ts (valid_from inclusive); among
    // same-date boundaries the highest version_no wins — both via the
    // window sort, so last-non-null lands on exactly the oracle's row
    val w = Window.partitionBy(col("custkey"))
      .orderBy(col("ts"), col("kind"), col("version_no"))
      .rowsBetween(Window.unboundedPreceding, 0)
    dim.union(facts)
      .withColumn("v_at", last(col("version_no"), ignoreNulls = true).over(w))
      .withColumn("p_at", last(col("priority"), ignoreNulls = true).over(w))
      .filter(col("kind") === 1 && col("v_at").isNotNull)
      .select(col("l_orderkey"), col("l_linenumber"), col("custkey"),
        col("ts").as("l_shipdate"), col("p_at").as("priority_at_ship"),
        col("v_at").as("version_no"))
      // the synthetic lineitem has duplicate (orderkey, linenumber)
      // keys, so the presentation sort carries shipdate too
      .orderBy("l_orderkey", "l_linenumber", "l_shipdate")
  }

  /** Hourly gap-fill + last-observation-carried-forward (LOCF) over the
    * events stream: every user gets a COMPLETE hourly spine from their
    * first to their last active hour; hours with events carry that
    * hour's latest reading (ties totally ordered by (ts desc, event_id
    * desc)); empty hours are materialized with n_events = 0 and the
    * previous reading carried forward — the time-series repair step in
    * front of any fixed-cadence model (and the batch twin of E114's
    * trailing-window state). `value` is a pure pass-through double: no
    * arithmetic touches it, so LOCF is bit-identical across engines.
    *
    * 100 TB posture: the spine is sequence()-generated per key (rows
    * bounded by span/cadence, never a calendar cross join), the
    * per-hour pick and the LOCF are ONE user-keyed shuffle each —
    * where the naive form as-of-joins every empty slot against the
    * observation history (quadratic per user). First spine hour always
    * has an observation (it IS min(hour)), so no leading-null branch.
    */
  def w25GapFill(spark: SparkSession, dir: String): DataFrame =
    gapFillCore(Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("value")))

  /** The w25 body over any (user_id, ts, event_id, value) frame —
    * exposed so ScalingProbe can measure the user-count axis (VERDICT
    * r7 item 6: the suite's biggest output had no 10x probe).
    */
  private[graft] def gapFillCore(raw: DataFrame): DataFrame = {
    val e = raw
      .select(col("user_id"), date_trunc("hour", col("ts")).as("h"),
        col("ts"), col("event_id"), col("value"))
    val wPick = Window.partitionBy(col("user_id"), col("h"))
      .orderBy(col("ts").desc, col("event_id").desc)
    val obs = e
      .withColumn("rn", row_number().over(wPick))
      .withColumn("n", count(lit(1)).over(
        Window.partitionBy(col("user_id"), col("h"))))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("h"), col("value").as("obs_value"),
        col("n"))
    val spine = e.groupBy("user_id")
      .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
      .select(col("user_id"),
        explode(expr("sequence(h0, h1, interval 1 hour)")).as("hour"))
    val wFill = Window.partitionBy(col("user_id")).orderBy(col("hour"))
      .rowsBetween(Window.unboundedPreceding, 0)
    spine
      .join(obs, spine("user_id") === obs("user_id") &&
        spine("hour") === obs("h"), "left")
      .select(spine("user_id"), col("hour"),
        coalesce(col("n"), lit(0L)).as("n_events"),
        col("obs_value"),
        when(col("h").isNull, 1L).otherwise(0L).as("is_gap"))
      .withColumn("value",
        last(col("obs_value"), ignoreNulls = true).over(wFill))
      .select("user_id", "hour", "n_events", "value", "is_gap")
      .orderBy("user_id", "hour")
  }

  /** Ordered conversion-funnel analysis: for each user, the earliest
    * witness of the sequence view -> click -> purchase with each stage
    * STRICTLY after the previous one (greedy-earliest is optimal for
    * sequence existence: any valid witness's click is >= the earliest
    * click after the earliest view, etc. — so greedy reaches stage 3
    * iff ANY ordered triple exists). Emits per user the three stage
    * timestamps (pass-through, no arithmetic), the stage reached (0-3)
    * and the integer-microsecond view->purchase latency — the
    * behavioral-analytics query (Amplitude/Mixpanel funnels) over the
    * same events the sessionization family reads.
    *
    * 100 TB posture: three hash aggs + two left joins, ALL keyed on
    * user_id — one logical shuffle key end-to-end, no window sort and
    * no per-user event-list materialization (the collect_list/UDF
    * formulation ships every user's full history into one buffer; this
    * never does). Stage count extends by one agg+join per stage.
    */
  def w26Funnel(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts"))
    val v = e.groupBy("user_id")
      .agg(min(when(col("event_type") === "view", col("ts"))).as("t_view"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"))
    val c = v.join(clicks, Seq("user_id"), "left")
      .groupBy("user_id", "t_view")
      .agg(min(when(col("ts") > col("t_view"), col("ts"))).as("t_click"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"))
    val p = c.join(purchases, Seq("user_id"), "left")
      .groupBy("user_id", "t_view", "t_click")
      .agg(min(when(col("ts") > col("t_click"), col("ts"))).as("t_purchase"))
    p.select(col("user_id"), col("t_view"), col("t_click"), col("t_purchase"),
        when(col("t_view").isNull, 0L)
          .when(col("t_click").isNull, 1L)
          .when(col("t_purchase").isNull, 2L)
          .otherwise(3L).as("stage_reached"),
        when(col("t_purchase").isNotNull,
          unix_micros(col("t_purchase")) - unix_micros(col("t_view")))
          .as("funnel_us"))
      .orderBy("user_id")
  }

  /** k-anonymity audit (E244) — the privacy-risk readout a data release
    * runs BEFORE events leave the lakehouse: rows grouped by their
    * quasi-identifier tuple (event_type, hour of day, value decade —
    * the attributes an adversary can observe externally); a group with
    * fewer than k = 5 distinct users re-identifies its members. Per
    * event type: group counts, risky-group counts, the events exposed
    * in risky groups, the DISTINCT users those groups expose, and the
    * exposed-event share. Counts exact; the share one division.
    *
    * 100 TB posture: one (type, hour, bucket) hash agg with a
    * countDistinct over the event scan (quasi-group cardinality is
    * types x 24 x value-decades — tiny); the user-exposure pass is a
    * LEFT SEMI of the cached narrow events against the risky-group
    * keys (broadcast — risky groups are a subset of the tiny group
    * frame) + one distinct-user agg; the rollup is |types| rows.
    */
  def w51KAnonymity(spark: SparkSession, dir: String): DataFrame = {
    val ev = graft.Caches.cache(Tables.events(spark, dir)
      .select(col("event_type"), col("user_id"),
        hour(col("ts")).cast("long").as("hr"),
        floor(col("value") / 10.0).cast("long").as("vb")))
    val grp = graft.Caches.cache(ev.groupBy("event_type", "hr", "vb")
      .agg(countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events")))
    val risky = grp.filter(col("n_users") < 5)
      .select("event_type", "hr", "vb")
    val exposed = ev.join(broadcast(risky),
        Seq("event_type", "hr", "vb"), "left_semi")
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n_users_exposed"))
    grp.groupBy("event_type")
      .agg(count(lit(1)).as("n_groups"),
        sum(when(col("n_users") < 5, 1L).otherwise(0L))
          .as("n_risky_groups"),
        sum(col("n_events")).as("n_events"),
        sum(when(col("n_users") < 5, col("n_events")).otherwise(0L))
          .as("n_events_exposed"))
      .join(exposed, Seq("event_type"), "left")
      .select(col("event_type"), col("n_groups"), col("n_risky_groups"),
        col("n_events"), col("n_events_exposed"),
        coalesce(col("n_users_exposed"), lit(0L)).as("n_users_exposed"),
        (col("n_events_exposed").cast("double") / col("n_events"))
          .as("exposed_share"))
      .orderBy("event_type")
  }

  /** l-diversity audit (E248) — w51's companion on the SECOND privacy
    * failure mode (Machanavajjhala et al., ICDE 2006): a
    * quasi-identifier group can be k-anonymous — many users — yet
    * still leak every member's SENSITIVE attribute if all of them
    * share it (the homogeneity attack k-anonymity cannot see). Here
    * the adversary-observable QI tuple is (hour of day, value decade)
    * and the protected attribute is event_type: per QI group, the
    * count of DISTINCT sensitive values; fewer than l = 3 is weak,
    * exactly 1 is homogeneous (the pure attack case). Rolled up per
    * hour: group counts, homogeneous/weak counts, events and DISTINCT
    * users inside weak groups, and the weak-event share. Counts
    * exact; the share one division.
    *
    * 100 TB posture: one (hr, vb) hash agg with a countDistinct over
    * the narrow cached event scan (QI-group cardinality is 24 x
    * value-decades — tiny at any corpus size); the user-exposure pass
    * is a LEFT SEMI of the same cached events against the broadcast
    * weak-group keys (a subset of the tiny group frame) + one
    * distinct-user agg; the rollup is <= 24 rows.
    */
  def w52LDiversity(spark: SparkSession, dir: String): DataFrame = {
    val ev = graft.Caches.cache(Tables.events(spark, dir)
      .select(col("event_type"), col("user_id"),
        hour(col("ts")).cast("long").as("hr"),
        floor(col("value") / 10.0).cast("long").as("vb")))
    val grp = graft.Caches.cache(ev.groupBy("hr", "vb")
      .agg(countDistinct(col("event_type")).as("n_sens"),
        count(lit(1)).as("n_events")))
    val weak = grp.filter(col("n_sens") < 3).select("hr", "vb")
    val exposed = ev.join(broadcast(weak), Seq("hr", "vb"), "left_semi")
      .groupBy("hr")
      .agg(countDistinct(col("user_id")).as("n_users_weak"))
    grp.groupBy("hr")
      .agg(count(lit(1)).as("n_groups"),
        sum(when(col("n_sens") === 1, 1L).otherwise(0L))
          .as("n_homogeneous"),
        sum(when(col("n_sens") < 3, 1L).otherwise(0L))
          .as("n_weak_groups"),
        sum(col("n_events")).as("n_events"),
        sum(when(col("n_sens") < 3, col("n_events")).otherwise(0L))
          .as("n_events_weak"))
      .join(exposed, Seq("hr"), "left")
      .select(col("hr"), col("n_groups"), col("n_homogeneous"),
        col("n_weak_groups"), col("n_events"), col("n_events_weak"),
        coalesce(col("n_users_weak"), lit(0L)).as("n_users_weak"),
        (col("n_events_weak").cast("double") / col("n_events"))
          .as("weak_share"))
      .orderBy("hr")
  }

  /** t-closeness audit (E253) — the third privacy failure mode after
    * w51's k-anonymity and w52's l-diversity (Li, Li &
    * Venkatasubramanian, ICDE 2007): a QI group can be k-anonymous AND
    * l-diverse yet still leak by SKEW — when its sensitive-value
    * distribution differs sharply from the corpus-wide one, observing
    * the group updates an adversary's posterior (the skewness attack).
    * Per QI group (hour, value decade) with event_type as the
    * sensitive attribute: the group's distance to the global
    * distribution, flagged when it exceeds t = 0.2. For a categorical
    * attribute the EMD under uniform ground distance IS the total
    * variation distance, and d27's discipline makes it exact: over the
    * FULL type roster (absent types contribute their global mass),
    * tvd_num = sum_t |n_gt*N - N_t*n_g| is an exact integer, tvd the
    * ONE division tvd_num / (2*n_g*N), and the t-flag the exact cross
    * multiplication 5*tvd_num >= 2*n_g*N — no per-term float sum whose
    * order could drift between engines.
    *
    * Arithmetic width (VERDICT r13 item 3): the products n_gt*N and
    * n_t*n_g overflow signed 64-bit near ~3e9 events, so every product
    * and the numerator sum run in DECIMAL(38,0) — exact to 1e38, i.e.
    * any corpus (the d21/m13/t26 widen-the-representation convention);
    * the oracle mirrors with HUGEINT. `tvd_num` is PUBLISHED as DOUBLE
    * (exact below 2^53, correctly rounded beyond — a published DECIMAL
    * fails the driver's row hash while rows+schema stay green, VERDICT
    * r14); the flag/tvd still read the exact decimal internals. Counts
    * stay BIGINT (bounded by corpus row count, not its square).
    * `TClosenessSpec` pins a planted ~6e9-event cell frame whose
    * numerator exceeds Long.MaxValue.
    *
    * 100 TB posture: ONE (hr, vb, event_type) hash agg over the narrow
    * event scan (cell cardinality = 24 x decades x |types| — tiny at
    * any corpus size); the global roster and the 1-row total ride
    * broadcasts; the roster cross join is cell-spine-sized. Nothing
    * corpus-sized shuffles twice.
    */
  def w53TCloseness(spark: SparkSession, dir: String): DataFrame =
    tClosenessOf(Tables.events(spark, dir)
      .select(col("event_type"),
        hour(col("ts")).cast("long").as("hr"),
        floor(col("value") / 10.0).cast("long").as("vb")))

  /** w53's body over any (event_type, hr, vb) frame (spec-shared). */
  private[graft] def tClosenessOf(ev: DataFrame): DataFrame =
    tClosenessFromCells(ev.groupBy("hr", "vb", "event_type")
      .agg(count(lit(1)).as("n_gt")))

  /** w53's fold from pre-counted (hr, vb, event_type, n_gt) cells —
    * shared with the streaming twin's board (E254), whose update table
    * folds to exactly these cells via a monotone max.
    */
  private[graft] def tClosenessFromCells(cellRaw: DataFrame): DataFrame = {
    val cell = graft.Caches.cache(cellRaw)
    val glob = graft.Caches.cache(
      cell.groupBy("event_type").agg(sum(col("n_gt")).as("n_t")))
    val grp = cell.groupBy("hr", "vb")
      .agg(sum(col("n_gt")).as("n_g"),
        count(lit(1)).as("n_types"))
    val total = glob.agg(sum(col("n_t")).as("n_total"))
    // full roster per group: a type absent from the group contributes
    // |0*N - N_t*n_g| — skipping it would under-state the distance.
    // All products run in DECIMAL(38,0): n_gt*N overflows longs near
    // ~3e9 events (scaladoc bound), and an overflowed-yet-wrapped
    // numerator is the one wrong answer the twin-engine compare is
    // blind to (both engines would wrap identically in 64-bit).
    val dec = (c: Column) => c.cast(DecimalType(38, 0))
    val denom = dec(lit(2L)) * dec(col("n_g")) * dec(col("n_total"))
    grp.crossJoin(broadcast(glob))
      .join(cell, Seq("hr", "vb", "event_type"), "left")
      .crossJoin(broadcast(total))
      .groupBy(col("hr"), col("vb"), col("n_g"), col("n_types"),
        col("n_total"))
      .agg(sum(abs(dec(coalesce(col("n_gt"), lit(0L))) * dec(col("n_total")) -
        dec(col("n_t")) * dec(col("n_g")))).as("tvd_num"))
      .select(col("hr"), col("vb"),
        col("n_g").as("n_events"), col("n_types"),
        col("tvd_num").cast("double").as("tvd_num"),
        (col("tvd_num").cast("double") / denom.cast("double")).as("tvd"),
        when(dec(lit(5L)) * col("tvd_num") >= denom, 1L).otherwise(0L)
          .as("t_fail"))
      .orderBy("hr", "vb")
  }

  /** Event-time disorder audit (E259) — the watermark-delay
    * calibrator: per registered stream (a table read as ingest order =
    * its sequence column, event time = its timestamp column), how many
    * rows arrived AFTER a later-timestamped row already had, and by
    * how much? `n_late` is exactly the row count a watermark of zero
    * delay would drop from a windowed aggregate; `max_late_us` is the
    * smallest `withWatermark` delay that drops nothing — the number a
    * streaming deployment of T4/T5 reads BEFORE picking its delay
    * (blind delays either drop events or hold state open for hours).
    * The registry exercises both verdicts on real data: the events
    * stream is perfectly in-order (n_late = 0 — the audit proves the
    * fixture's ingest order is trustworthy), while orders read as a
    * CDC stream in o_orderkey order is ~99.6% disordered with ~2,400
    * DAYS of lateness — the audit correctly reports that o_orderkey is
    * NOT an arrival order anyone can watermark on. Lateness is exact
    * integer microseconds (unix_micros/epoch_us — the w30 convention);
    * late_share is the one IEEE division of exact longs.
    *
    * 100 TB posture: the running max over ingest order is NOT one
    * global window (a per-stream sort in ONE task): the m08/p15
    * two-phase form — contiguous seq ranges bucket each stream, a
    * bucket-count-sized prefix-max window computes what each bucket
    * inherits, and the in-bucket exclusive running max runs
    * partition-parallel; identical to the global statement because
    * buckets partition the seq order. The oracle states the single
    * declarative window. Offsets ride a broadcast; the fold is one
    * |streams|-row agg.
    */
  def w54OutOfOrder(spark: SparkSession, dir: String): DataFrame =
    outOfOrderOf(Seq(
      ("events", "event_id", "ts",
        Tables.events(spark, dir).select(
          col("event_id").cast("long").as("seq"),
          unix_micros(col("ts")).as("tus"))),
      ("orders", "o_orderkey", "o_orderdate",
        Tables.orders(spark, dir).select(
          col("o_orderkey").cast("long").as("seq"),
          // o_orderdate is TIMESTAMP_NTZ: the cast reads it in the
          // session zone (pinned UTC), matching DuckDB's naive-as-UTC
          // epoch_us
          unix_micros(col("o_orderdate").cast("timestamp"))
            .as("tus")))))

  /** w54's body over any (stream, seq_column, ts_column, frame with
    * (seq, tus)) registry — exposed for the planted-disorder spec.
    * `seq` must be unique per stream (it IS the ingest order).
    */
  private[graft] def outOfOrderOf(
      streams: Seq[(String, String, String, DataFrame)]): DataFrame = {
    val spark = streams.head._4.sparkSession
    import spark.implicits._
    // the column-name labels join back onto the |streams|-row fold —
    // carrying them as per-row literals through the bucket shuffle
    // widens every shuffled row for nothing (measured in the 50M
    // disorder probe)
    val names = streams.map { case (st, sc, tc, _) => (st, sc, tc) }
      .toDF("stream", "seq_column", "ts_column")
    // Bucket width bound (ADVICE r14): the offsets frame is
    // ceil(seq_range/width) rows per stream, and it must stay
    // broadcast-sized (phase 1's per-stream prefix window is also a
    // single-task sort of that frame). The default 4096 keeps offsets
    // under ~2.5e5 rows per 1e9-row stream; past ~1e12 rows/stream the
    // frame outgrows broadcast/driver limits, so deployments set
    // `graft.w54.bucketWidth` ~ seq_range/2^20 (e.g. 2^24 buckets a
    // 1.7e13-seq stream into 1M offset rows). The statistic is
    // width-invariant: buckets partition the seq order, so any width
    // reproduces the single declarative window bit-for-bit (the
    // planted-disorder spec pins 4096 vs a prime width equal).
    val width = math.max(1L,
      spark.conf.getOption("graft.w54.bucketWidth")
        .flatMap(w => scala.util.Try(w.toLong).toOption).getOrElse(4096L))
    val s = streams.map { case (st, _, _, df) =>
      df.select(lit(st).as("stream"), col("seq"), col("tus"))
    }.reduce(_.unionAll(_))
      .withColumn("bucket", expr(s"seq div $width"))
    // phase 1: per-bucket max, then what each bucket inherits from all
    // earlier buckets (bucket-count-sized frame, keyed by stream)
    val wOff = Window.partitionBy(col("stream")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = s.groupBy("stream", "bucket")
      .agg(max(col("tus")).as("bmax"))
      .withColumn("pmax", max(col("bmax")).over(wOff))
      .select("stream", "bucket", "pmax")
    // phase 2: in-bucket EXCLUSIVE running max, partition-parallel;
    // greatest() skips nulls (first row of the first bucket has no
    // predecessor on either side)
    val wIn = Window.partitionBy(col("stream"), col("bucket"))
      .orderBy(col("seq"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val late = col("prev_max") > col("tus")
    disorderFinish(
      s.join(broadcast(offsets), Seq("stream", "bucket"))
        .withColumn("prev_max",
          greatest(max(col("tus")).over(wIn), col("pmax")))
        .groupBy("stream")
        .agg(count(lit(1)).as("n_events"),
          sum(when(late, 1L).otherwise(0L)).as("n_late"),
          coalesce(max(when(late, col("prev_max") - col("tus"))),
            lit(0L)).as("max_late_us")),
      names)
  }

  /** w54's finisher from per-stream totals (stream, n_events, n_late,
    * max_late_us) plus the |streams|-row label frame — shared with the
    * streaming twin's board (E260), whose update table collapses to
    * exactly these totals via monotone maxes.
    */
  private[graft] def disorderFinish(totals: DataFrame,
      names: DataFrame): DataFrame =
    totals.join(broadcast(names), Seq("stream"))
      .select(col("stream"), col("seq_column"), col("ts_column"),
        col("n_events"), col("n_late"),
        (col("n_late").cast("double") / col("n_events"))
          .as("late_share"),
        col("max_late_us"))
      .orderBy("stream")

  /** Churn hazard table (E240) — the Kaplan-Meier INPUT table over
    * user lifetimes (churn = last observed activity, the
    * product-analytics convention): per observed lifetime t (days
    * between a user's first and last event), the risk set n_at_risk =
    * users surviving >= t, the churn count n_churned = users whose
    * lifetime is exactly t, and the discrete hazard d_t/n_t. w27
    * answers "how many came back each week"; this answers "GIVEN you
    * survived to day t, what's the chance you die there" — the curve a
    * survival model or LTV forecast consumes. Lifetimes with zero
    * churn emit no row (at-risk is unchanged there, hazard 0).
    *
    * Exactness: lifetimes are integer day-diffs; the risk set is a
    * suffix sum over the lifetime histogram (exact longs); hazard the
    * one division. Deliberately NO survival-curve column: Kaplan-Meier
    * S(t) is a cumulative PRODUCT, and neither a float cumprod nor
    * exp(sum(ln)) is bit-stable across engines — consumers fold the
    * hazard table themselves (the same contract as w42's readout).
    *
    * 100 TB posture: one (user)-keyed agg over the event scan (map-side
    * combinable min/max), one histogram agg over users, then the
    * suffix-sum window on the O(distinct lifetimes)-row histogram —
    * the single-partition window never sees users, only lifetimes.
    */
  def w50ChurnHazard(spark: SparkSession, dir: String): DataFrame = {
    val life = Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .groupBy("user_id")
      .agg(datediff(max(col("day")), min(col("day"))).cast("long")
        .as("lifetime"))
    val hist = life.groupBy("lifetime").agg(count(lit(1)).as("n_churned"))
    val w = Window.orderBy(col("lifetime"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    hist
      .withColumn("n_at_risk", sum(col("n_churned")).over(w))
      .select(col("lifetime").as("t_days"), col("n_at_risk"),
        col("n_churned"),
        (col("n_churned").cast("double") / col("n_at_risk")).as("hazard"))
      .orderBy("t_days")
  }

  /** Cohort retention triangle: users cohorted by the ISO week of
    * their FIRST event; for every (cohort_week, weeks_since) cell, the
    * distinct users still active that week and the retention rate
    * against the cohort's size. The product-analytics staple
    * (週-over-week retention) as one declarative plan — every count is
    * an exact integer, week arithmetic is integer day-diff div 7, and
    * the rate is the one IEEE division both engines share.
    *
    * 100 TB posture: first-event extraction is a hash agg on user_id
    * (NOT a window over the raw event stream — the min-per-key agg is
    * map-side combinable, the window form sorts every event); activity
    * dedups to (user, week) before any join, so the cohort join and
    * the cell agg touch user-week rows, never raw events; offset-0
    * cells double as cohort sizes (no second pass).
    */
  def w27RetentionCohorts(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
    val firsts = e.groupBy("user_id").agg(min(col("wk")).as("cohort_week"))
    val activity = e.select("user_id", "wk").distinct()
    // activity is distinct (user, week) and a user has ONE cohort, so
    // count(*) per cell already counts distinct users — no second
    // distinct pass
    val cells = graft.Caches.cache(activity.join(firsts, Seq("user_id"))
      .select(col("cohort_week"),
        (datediff(col("wk"), col("cohort_week")) / 7).cast("long")
          .as("weeks_since"))
      .groupBy("cohort_week", "weeks_since")
      .agg(count(lit(1)).as("n_active")))
    val sizes = cells.filter(col("weeks_since") === 0L)
      .select(col("cohort_week"), col("n_active").as("cohort_size"))
    cells.join(sizes, Seq("cohort_week"))
      // DATE, not timestamp: DuckDB's date_trunc('week') yields DATE
      .select(col("cohort_week").cast("date").as("cohort_week"),
        col("weeks_since"), col("n_active"), col("cohort_size"),
        (col("n_active").cast("double") / col("cohort_size"))
          .as("retention_rate"))
      .orderBy("cohort_week", "weeks_since")
  }

  /** First-order behavioral transition matrix: within each user's
    * event stream (totally ordered by (ts, event_id) — the w02
    * precedent), every consecutive (event_type -> next event_type)
    * step, aggregated to a Markov transition estimate. n and n_from are
    * exact integers; p is the one shared IEEE division. The bigram
    * model over user journeys — anomaly detection (improbable
    * transitions), next-action features, and the sanity audit behind
    * any sequence model trained on this stream.
    *
    * 100 TB posture: ONE user-keyed window pass (the lead), then a hash
    * agg on the type pair — |types|^2 cells; nothing after the window
    * touches event-sized data. No self-join formulation anywhere (the
    * e1.seq+1 = e2.seq join form shuffles the stream twice).
    */
  def w28TransitionMatrix(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val cells = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val tot = cells.groupBy("from_type").agg(sum(col("n")).as("n_from"))
    cells.join(tot, Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n"), col("n_from"),
        (col("n").cast("double") / col("n_from")).as("p"))
      .orderBy("from_type", "to_type")
  }

  /** Robust per-group anomaly detection: every event scored against
    * its type's MEDIAN and MAD (w23's exact two-phase rank machinery —
    * mean/stddev z-scores break down exactly when outliers are present,
    * since outliers inflate their own baseline; the median/MAD pair is
    * the standard robust fix). dev = |value - median| is one
    * subtraction + abs of identically-computed doubles; the flag is
    * dev > 3*mad (multiply + compare, no division), and the
    * consistency-scaled score dev/mad is emitted only when mad > 0 (a
    * type where more than half the values tie has MAD 0 — every
    * deviation is then infinitely surprising, and the flag still
    * works). All rows emitted, flagged or not: an audit needs the
    * clean rows (the t12 discipline).
    *
    * 100 TB posture: the baseline is G rows broadcast back onto the
    * stream — one scan + the w23 rank passes, then pure map work; no
    * window over raw events anywhere.
    */
  def w29RobustOutliers(spark: SparkSession, dir: String): DataFrame = {
    val mad = madStats(spark, dir)
      .select(col("event_type"), col("median_value"), col("mad"))
    Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"), col("value"))
      .join(broadcast(mad), Seq("event_type"))
      .withColumn("dev", abs(col("value") - col("median_value")))
      .select(col("event_id"), col("event_type"), col("value"),
        col("median_value"), col("mad"),
        when(col("mad") > 0, col("dev") / col("mad")).as("robust_score"),
        when(col("dev") > col("mad") * 3, 1L).otherwise(0L)
          .as("is_outlier"))
      .orderBy("event_id")
  }

  /** Inter-arrival-gap tail quantiles per event type — the SLO/latency
    * query over a behavioral stream: gaps are integer microseconds
    * between consecutive events of the same (user, type) (lag over the
    * (ts, event_id) total order — cross-user boundaries yield no gap),
    * then p50/p90/p99 of those gaps selected EXACTLY by the shared
    * two-phase rank machinery (percentile_disc semantics: rank
    * ceil(q*n); no interpolation, no per-group sort). A p99 pulling
    * away from p50 is burstiness — the signal behind session-gap
    * tuning (w02's 30-minute threshold) and bot detection.
    *
    * 100 TB posture: one user-keyed window (the lag) + the w08-family
    * histogram rank selection — no global or per-group full sort
    * anywhere; gaps are exact integers so the selected quantiles are
    * bit-identical across engines.
    */
  def w30GapQuantiles(spark: SparkSession, dir: String): DataFrame =
    // Write-once per dataset dir (the madStats/rfmcuts discipline, r10
    // VERDICT item 6): the gaps window + two-phase rank machinery is a
    // data-independent ~2s stage constant producing a G-row table;
    // sessions after the first scan the parquet. Values identical by
    // construction (the build IS the derivation; longs round-trip
    // bit-exactly), so the oracle hash is untouched.
    sortTiny(graft.Materialized.table(spark, s"gapstats:$dir", dir)(
      gapStatsBuild(spark, dir)), "event_type")

  /** The raw (unmaterialized) w30 quantile-table build — exposed so
    * PlanAuditSpec can audit the write-once build directly (see
    * [[madStatsBuild]]).
    */
  private[graft] def gapStatsBuild(
      spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    val gaps = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("gap_us",
        unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)))
      .filter(col("gap_us").isNotNull)
      .select(col("event_type"), col("gap_us").cast("double").as("value"))
    val stats = rankStats(gaps)
    val qs = Seq(0.5 -> "p50", 0.9 -> "p90", 0.99 -> "p99")
    val wanted = stats
      .select(col("event_type"), col("cnt"),
        explode(array(qs.map { case (q, name) =>
          struct(lit(name).as("q"),
            expr(s"CAST(ceil(cnt * $q) AS BIGINT)").as("r"))
        }: _*)).as("t"))
      .select(col("event_type"), col("cnt"),
        col("t.q").as("q"), col("t.r").as("r"))
    valuesAtRanks(gaps, stats, wanted)
      .groupBy(col("event_type"), col("cnt"))
      .agg(
        max(when(col("q") === "p50", col("value"))).cast("long").as("p50_us"),
        max(when(col("q") === "p90", col("value"))).cast("long").as("p90_us"),
        max(when(col("q") === "p99", col("value"))).cast("long").as("p99_us"))
      .select(col("event_type"), col("p50_us"), col("p90_us"), col("p99_us"),
        col("cnt").as("n_gaps"))
  }

  /** CUSUM change-point detection over hourly event rates, exact and
    * integer: for each event type, the hour where the cumulative
    * deviation from the mean rate peaks — the classic single
    * level-shift estimator (where did the rate change?). The mean
    * never appears as a float: with n hours and T total events, the
    * scaled statistic S'_h = cumsum(n*x_h - T) equals n * the
    * classical CUSUM, is integer-exact, telescopes to 0 at the last
    * hour, and ARGMAX |S'| is the same hour — so the change-point,
    * its score and its direction (sign at the peak: positive = the
    * early segment ran HOT, the rate dropped there; negative = it
    * rose) are all bit-identical across engines and partitionings.
    * Empty hours count as zero via the w25 spine (a gap IS a rate
    * observation; skipping it would blind the detector to outages).
    *
    * 100 TB posture: hourly pre-aggregation first (events collapse to
    * type x hour cells before any window), then ONE type-keyed window
    * cumsum over span-bounded spine rows; ties break to the earliest
    * hour via the (abs desc, hour asc) rank order.
    */
  /** Zero-filled hourly (event_type, h, x) cells over each type's span —
    * the w25/w31 real-zero spine, shared by w31 and w36.
    */
  private def hourlyCells(spark: SparkSession, dir: String): DataFrame =
    hourlyCellsOf(Tables.events(spark, dir).select("event_type", "ts"))

  private def hourlyCellsOf(raw: DataFrame): DataFrame =
    spineFillCells(raw
      .select(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .groupBy("event_type", "h").agg(count(lit(1)).as("x")))

  /** Zero-fill a sparse (event_type, h, x) hourly count frame onto each
    * type's [min, max] hour spine — shared by the batch cells builder
    * and the streaming-accumulated form (a tumbling-window count table
    * has exactly this shape).
    */
  private[graft] def spineFillCells(counts: DataFrame): DataFrame = {
    // fresh attribute ids for the spine branch: both join sides
    // descend from `counts`, and some sources (a streaming memory
    // table) defeat Spark's implicit self-join dedup ("conflicting
    // references" INTERNAL_ERROR); explicit Aliases break the tie
    val left = counts.select(col("event_type").as("event_type"),
      col("h").as("h"))
    val span = left.groupBy("event_type")
      .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
    val spine = span.select(col("event_type"),
      explode(expr("sequence(h0, h1, interval 1 hour)")).as("h"))
    spine.join(counts, Seq("event_type", "h"), "left")
      .select(col("event_type"), col("h"),
        coalesce(col("x"), lit(0L)).as("x"))
  }

  def w31Changepoint(spark: SparkSession, dir: String): DataFrame = {
    val cells = hourlyCells(spark, dir)
    val tot = cells.groupBy("event_type")
      .agg(count(lit(1)).as("n_hours"), sum(col("x")).as("total"))
    val wCum = Window.partitionBy(col("event_type")).orderBy(col("h"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wPick = Window.partitionBy(col("event_type"))
      .orderBy(abs(col("s")).desc, col("h").asc)
    // the CUSUM terms are x*n_hours (count x span): past ~3e9 events
    // over ~1e5 hourly slots the running sum overflows signed 64-bit
    // identically in both engines, so it runs in DECIMAL(38,0) /
    // HUGEINT (the w53 convention); cp_score PUBLISHES as DOUBLE
    // (exact below 2^53 — the driver's row hash only proves
    // BIGINT/DOUBLE/VARCHAR/DATE/TIMESTAMP surfaces, VERDICT r14).
    // direction compares the exact decimal to zero.
    val dec = (c: Column) => c.cast(DecimalType(38, 0))
    cells.join(tot, Seq("event_type"))
      .withColumn("s",
        sum(dec(col("x")) * dec(col("n_hours")) - dec(col("total")))
          .over(wCum))
      .withColumn("rk", row_number().over(wPick))
      .filter(col("rk") === 1)
      .select(col("event_type"), col("n_hours"), col("total"),
        col("h").as("cp_hour"),
        abs(col("s")).cast("double").as("cp_score"),
        when(col("s") > 0, 1L).when(col("s") < 0, -1L).otherwise(0L)
          .as("direction"))
      .orderBy("event_type")
  }

  /** Week-over-week movers: per (event type, ISO week), the event
    * count, the previous week's count, the integer delta and the
    * growth ratio — the trend report every operational review reads
    * (which behaviors accelerated, which collapsed). A week with no
    * events is a REAL zero via the spine (the w25/w31 discipline), so
    * a type that stops firing shows -100% instead of vanishing from
    * the report; growth is NULL on a zero base (an exact integer
    * test, never a float divide), and the first week has no base row.
    *
    * 100 TB posture: events pre-aggregate to type x week cells before
    * the single type-keyed lag window; spine rows are span-bounded.
    */
  def w32TopMovers(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("event_type"), date_trunc("week", col("ts")).as("wk"))
    val counts = e.groupBy("event_type", "wk").agg(count(lit(1)).as("x"))
    val span = e.groupBy("event_type")
      .agg(min(col("wk")).as("w0"), max(col("wk")).as("w1"))
    val spine = span.select(col("event_type"),
      explode(expr("sequence(w0, w1, interval 1 week)")).as("wk"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("wk"))
    spine.join(counts, Seq("event_type", "wk"), "left")
      .select(col("event_type"), col("wk"),
        coalesce(col("x"), lit(0L)).as("n"))
      .withColumn("prev_n", lag(col("n"), 1).over(w))
      .filter(col("prev_n").isNotNull)
      .select(col("event_type"), col("wk").cast("date").as("week"),
        col("n"), col("prev_n"),
        (col("n") - col("prev_n")).as("delta"),
        when(col("prev_n") > 0,
          (col("n") - col("prev_n")).cast("double") / col("prev_n"))
          .as("growth"))
      .orderBy("event_type", "week")
  }

  /** OHLC bars (open/high/low/close + exact volume) per event type per
    * hour — the time-series bar aggregation every metrics/market stack
    * runs as its first compaction step. Open/close are the earliest/
    * latest reading by the (ts, event_id) total order via the struct-
    * min/max idiom (A1's ordered-pick discipline as a pure AGGREGATE —
    * no window, no sort of the raw stream); high/low are plain min/max
    * over value; volume uses the exact-decimal-sum idiom (w01) so the
    * float total is order-independent. NULL readings stay faithful:
    * they count in n_events, a NULL open/close means the boundary
    * reading itself was NULL, and high/low skip NULLs in both engines.
    *
    * 100 TB posture: ONE hash aggregate, fully map-side combinable
    * (struct min/max and decimal sums all merge associatively) — the
    * shuffle carries type x hour cells, never events. The window
    * formulation the oracle states (row_number to find the boundary
    * rows) would sort every partition of the raw stream instead.
    */
  def w33OhlcBars(spark: SparkSession, dir: String): DataFrame =
    ohlcBars(Tables.events(spark, dir)
      .select("event_type", "ts", "event_id", "value"))

  /** The w33 body over any (event_type, ts, event_id, value) frame —
    * exposed for the NULL-boundary and tie-order spec cases.
    */
  private[graft] def ohlcBars(raw: DataFrame): DataFrame =
    raw
      .select(col("event_type"), date_trunc("hour", col("ts")).as("hour"),
        col("ts"), col("event_id"), col("value"))
      .groupBy("event_type", "hour")
      .agg(
        count(lit(1)).as("n_events"),
        min(struct(col("ts"), col("event_id"), col("value")))
          .getField("value").as("open_v"),
        max(col("value")).as("high_v"),
        min(col("value")).as("low_v"),
        max(struct(col("ts"), col("event_id"), col("value")))
          .getField("value").as("close_v"),
        sum(col("value").cast(DecimalType(28, 6))).cast("double")
          .as("sum_value"))
      .orderBy("event_type", "hour")

  /** Within-session conversion funnel: w02's gaps-and-islands session
    * assignment composed with w26's greedy-earliest view -> click ->
    * purchase witness, PER (user, session) — the strict form of funnel
    * analytics (a purchase in tomorrow's session does not convert
    * today's view; w26 answers "ever converted", this answers
    * "converted in-session", the number a checkout flow is judged on).
    * Greedy-earliest stays optimal inside a session for the same
    * reason as w26 (any valid witness dominates pointwise), and all
    * stage picks are exact MIN timestamps with integer-microsecond
    * latency — no arithmetic touches a float.
    *
    * 100 TB posture: ONE user-keyed window sort assigns sessions
    * (w02's plan), then the three stage aggs and two joins are all
    * keyed on (user_id, sess_id) — a single logical shuffle key
    * end-to-end, no per-session event-list materialization; stage
    * count extends by one agg+join per stage as in w26.
    */
  def w34SessionFunnel(spark: SparkSession, dir: String): DataFrame =
    sessionFunnel(Tables.events(spark, dir)
      .select("user_id", "ts", "event_id", "event_type"))

  /** The w34 body over any (user_id, ts, event_id, event_type) frame —
    * exposed so the spec can plant the cross-session purchase that
    * must NOT convert the earlier session.
    */
  private[graft] def sessionFunnel(raw: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val gapUs = unix_micros(col("ts")) -
      unix_micros(lag(col("ts"), 1).over(w))
    val newSession = when(gapUs.isNull || gapUs > 1800L * 1000000L, 1)
      .otherwise(0)
    val e = graft.Caches.cache(raw
      .withColumn("sess_id",
        sum(newSession).over(w.rowsBetween(Window.unboundedPreceding, 0))
          .cast("long")))
    val v = e.groupBy("user_id", "sess_id")
      .agg(min(col("ts")).as("sess_start"),
        min(when(col("event_type") === "view", col("ts"))).as("t_view"))
    val c = v.join(
        e.filter(col("event_type") === "click")
          .select(col("user_id"), col("sess_id"), col("ts")),
        Seq("user_id", "sess_id"), "left")
      .groupBy("user_id", "sess_id", "sess_start", "t_view")
      .agg(min(when(col("ts") > col("t_view"), col("ts"))).as("t_click"))
    val p = c.join(
        e.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("sess_id"), col("ts")),
        Seq("user_id", "sess_id"), "left")
      .groupBy("user_id", "sess_id", "sess_start", "t_view", "t_click")
      .agg(min(when(col("ts") > col("t_click"), col("ts"))).as("t_purchase"))
    p.select(col("user_id"), col("sess_id"), col("sess_start"),
        col("t_view"), col("t_click"), col("t_purchase"),
        when(col("t_view").isNull, 0L)
          .when(col("t_click").isNull, 1L)
          .when(col("t_purchase").isNull, 2L)
          .otherwise(3L).as("stage_reached"),
        when(col("t_purchase").isNotNull,
          unix_micros(col("t_purchase")) - unix_micros(col("t_view")))
          .as("funnel_us"))
      .orderBy("user_id", "sess_id")
  }

  /** Rolling engagement: per calendar day, DAU (distinct active users),
    * trailing-7-day WAU, and the DAU/WAU stickiness ratio — the
    * product-analytics headline triple. The naive WAU statement is a
    * per-day distinct over a sliding RANGE window — distinct-over-
    * window doesn't exist in either engine, and a day x user range
    * join explodes. Instead each (user, active-day) row COVERS the 7
    * days it keeps the user active for (a bounded explode of exactly
    * 7), and WAU is a plain distinct + hash agg on the covered day —
    * the w19-style bounded fan-out trick that turns a sliding distinct
    * into two exact integer aggs. Day spine bounds from the data, so
    * zero-activity days inside the span show DAU 0 (the w25/w31 real-
    * zero discipline); stickiness is NULL when WAU is 0 (exact integer
    * test, never a float divide).
    *
    * 100 TB posture: the corpus collapses to DISTINCT (user, day)
    * FIRST (one hash agg); the 7x explode runs on that collapsed
    * frame, never on raw events; everything downstream is day-keyed
    * (spine-bounded). The 1-row bounds frame rides a broadcast.
    */
  def w35RollingActive(spark: SparkSession, dir: String): DataFrame =
    rollingActiveOf(Tables.events(spark, dir).select("user_id", "ts"))

  /** The w35 body over any (user_id, ts) frame — shared with
    * ScalingProbe's user-count axis.
    */
  private[graft] def rollingActiveOf(raw: DataFrame): DataFrame = {
    val ud = graft.Caches.cache(raw
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct())
    val dau = ud.groupBy("day").agg(count(lit(1)).as("dau"))
    val cov = ud
      .select(col("user_id"), explode(expr(
        "sequence(day, date_add(day, 6))")).as("day"))
      .distinct()
    val wau = cov.groupBy("day").agg(count(lit(1)).as("wau7"))
    val bounds = ud.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val spine = bounds.select(
      explode(expr("sequence(d0, d1)")).as("day"))
    spine.join(dau, Seq("day"), "left")
      .join(wau, Seq("day"), "left")
      .select(col("day"),
        coalesce(col("dau"), lit(0L)).as("dau"),
        coalesce(col("wau7"), lit(0L)).as("wau7"))
      .withColumn("stickiness",
        when(col("wau7") > 0, col("dau").cast("double") / col("wau7")))
      .orderBy("day")
  }

  /** Seasonal (hour-of-day) baseline + anomaly flags: every hourly cell
    * is compared against ITS OWN hour-of-day's average across the span —
    * 3am traffic judged against 3am traffic, the diurnal-pattern-aware
    * anomaly rule (a flat 2x-mean threshold fires every rush hour and
    * misses a quiet-hour surge). Cells come from the w31 zero-filled
    * spine, so an hour with NO events both drags its slot's baseline
    * honestly and can never be flagged. The spike test is the exact
    * integer cross-multiplication n * hod_slots > 2 * hod_total (no
    * float threshold can drift across engines); the reported baseline
    * is the one shared IEEE division.
    *
    * 100 TB posture: events pre-aggregate to type x hour cells before
    * anything else; the baseline table is (types x 24)-sized and rides
    * a broadcast-sized join; no window over raw events.
    */
  def w36SeasonalBaseline(spark: SparkSession, dir: String): DataFrame =
    seasonalBaseline(Tables.events(spark, dir).select("event_type", "ts"))

  /** The w36 body over any (event_type, ts) frame — exposed for the
    * hand-computed spike/zero-fill spec.
    */
  private[graft] def seasonalBaseline(raw: DataFrame): DataFrame = {
    val cells = graft.Caches.cache(hourlyCellsOf(raw)
      .withColumn("hod", hour(col("h")).cast("long")))
    val base = cells.groupBy("event_type", "hod")
      .agg(sum(col("x")).as("hod_total"), count(lit(1)).as("hod_slots"))
    cells.join(base, Seq("event_type", "hod"))
      .select(col("event_type"), col("h").as("hour"), col("hod"),
        col("x").as("n"),
        (col("hod_total").cast("double") / col("hod_slots")).as("baseline"),
        when(col("x") * col("hod_slots") > lit(2) * col("hod_total"), 1L)
          .otherwise(0L).as("is_spike"))
      .orderBy("event_type", "hour")
  }

  /** A/B experiment readout over the w26 funnel: users are split into
    * control/treatment by the deterministic user_id parity (the
    * assignment an experiment platform would persist), exposure = the
    * user had a view, conversion = the full ordered view -> click ->
    * purchase witness (w26's stage 3), and the one-row report carries
    * exact integer counts, the two conversion rates, and the lift
    * ratio. Rates and lift are the only doubles — each one division
    * (lift divides the two rates — same operands in both engines),
    * NULL on zero denominators by exact integer tests.
    *
    * 100 TB posture: inherits w26's plan (three user-keyed hash aggs +
    * two joins, one logical shuffle key) and collapses to a single
    * 1-row global aggregate — the report is O(1) regardless of users.
    */
  def w37AbLift(spark: SparkSession, dir: String): DataFrame = {
    val f = w26Funnel(spark, dir).select(col("user_id"),
      col("t_view").isNotNull.as("exposed"),
      (col("stage_reached") === 3L).as("conv"))
    f.agg(
        sum(when(pmod(col("user_id"), lit(2)) === 0 && col("exposed"), 1L)
          .otherwise(0L)).as("exposed_a"),
        sum(when(pmod(col("user_id"), lit(2)) === 0 && col("conv"), 1L)
          .otherwise(0L)).as("converted_a"),
        sum(when(pmod(col("user_id"), lit(2)) === 1 && col("exposed"), 1L)
          .otherwise(0L)).as("exposed_b"),
        sum(when(pmod(col("user_id"), lit(2)) === 1 && col("conv"), 1L)
          .otherwise(0L)).as("converted_b"))
      .withColumn("cvr_a", when(col("exposed_a") > 0,
        col("converted_a").cast("double") / col("exposed_a")))
      .withColumn("cvr_b", when(col("exposed_b") > 0,
        col("converted_b").cast("double") / col("exposed_b")))
      .withColumn("lift",
        when(col("cvr_a") > 0, col("cvr_b") / col("cvr_a")))
  }

  /** Anomaly RUNS over the w36 seasonal flags: consecutive flagged
    * hours per event type collapsed to incident rows (start, end,
    * duration, peak count) — the gaps-and-islands composition (w02's
    * technique) over w36's diurnal-aware spike stream, i.e. what an
    * on-call pager actually receives: "errors ran hot for 3 straight
    * hours peaking at N", not 3 disconnected cell alerts. Island key =
    * integer hour index minus per-type rank — exact on hour-truncated
    * timestamps in both engines; peak/duration are exact integers.
    *
    * 100 TB posture: w36 already reduces events to (types x hours)
    * cells, so the island window and the run agg both operate on the
    * flagged subset of a cell-bounded frame — the event scan is paid
    * once in the w36 prefix and nothing here is corpus-sized.
    */
  def w38AnomalyRuns(spark: SparkSession, dir: String): DataFrame =
    anomalyRunsOf(Tables.events(spark, dir).select("event_type", "ts"))

  /** The w38 body over any (event_type, ts) frame — exposed for the
    * hand-computed consecutive-vs-separated runs spec.
    */
  private[graft] def anomalyRunsOf(raw: DataFrame): DataFrame = {
    val flagged = seasonalBaseline(raw)
      .filter(col("is_spike") === 1L)
      .select(col("event_type"), col("hour"), col("n"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("hour"))
    // integer `div`, not `/` (which is IEEE division on longs)
    val isl = flagged.withColumn("island",
      expr("unix_micros(hour) div 3600000000") - row_number().over(w))
    isl.groupBy("event_type", "island")
      .agg(min(col("hour")).as("run_start"),
        max(col("hour")).as("run_end"),
        count(lit(1)).as("n_hours"),
        max(col("n")).as("peak_n"))
      .select("event_type", "run_start", "run_end", "n_hours", "peak_n")
      .orderBy("event_type", "run_start")
  }

  /** Conversion-latency quantiles per experiment arm: for users who
    * complete the w26 funnel, the exact p50/p90/p99 of (purchase -
    * view) in integer microseconds, split by the w37 parity arms — the
    * readout that answers "did the treatment SPEED UP conversion?",
    * which a rate-only A/B report (w37) cannot see. Latencies are
    * exact integer differences; the quantiles are percentile_disc
    * picks through the shared two-phase rank machinery (w08/w30's
    * plan: scan + hash-agg histogram selection, no per-group sort).
    *
    * 100 TB posture: inherits w26's single-shuffle-key funnel, then
    * the rank machinery sees only converted-user rows (funnel-output-
    * sized); 2 arms x 3 quantiles ride the G-row target frames.
    */
  def w39ConversionLatency(spark: SparkSession, dir: String): DataFrame =
    // Write-once per dataset dir (the gapstats/madStats discipline):
    // the funnel chain + rank machinery is the same data-independent
    // stage constant the w23/w29/w30 fixes eliminated, producing a
    // 2-row table. Values identical by construction; hash verified
    // unchanged at sf0.001 and sf0.01.
    sortTiny(graft.Materialized.table(spark, s"convlat:$dir", dir)(
      convLatencyBuild(spark, dir)), "arm")

  /** The raw (unmaterialized) w39 latency-table build — exposed for
    * PlanAuditSpec's write-once build audit (see [[madStatsBuild]]).
    */
  private[graft] def convLatencyBuild(
      spark: SparkSession, dir: String): DataFrame = {
    // the rank machinery keys on a column literally named event_type;
    // here the "type" is the experiment arm
    val lat = w26Funnel(spark, dir)
      .filter(col("stage_reached") === 3L)
      .select(
        when(pmod(col("user_id"), lit(2)) === 0, "a").otherwise("b")
          .as("event_type"),
        (unix_micros(col("t_purchase")) - unix_micros(col("t_view")))
          .cast("double").as("value"))
    val stats = rankStats(lat)
    val qs = Seq(0.5 -> "p50", 0.9 -> "p90", 0.99 -> "p99")
    val wanted = stats
      .select(col("event_type"), col("cnt"),
        explode(array(qs.map { case (q, name) =>
          struct(lit(name).as("q"),
            expr(s"CAST(ceil(cnt * $q) AS BIGINT)").as("r"))
        }: _*)).as("t"))
      .select(col("event_type"), col("cnt"),
        col("t.q").as("q"), col("t.r").as("r"))
    valuesAtRanks(lat, stats, wanted)
      .groupBy(col("event_type"), col("cnt"))
      .agg(
        max(when(col("q") === "p50", col("value"))).cast("long").as("p50_us"),
        max(when(col("q") === "p90", col("value"))).cast("long").as("p90_us"),
        max(when(col("q") === "p99", col("value"))).cast("long").as("p99_us"))
      .select(col("event_type").as("arm"), col("p50_us"), col("p90_us"),
        col("p99_us"), col("cnt").as("n_conversions"))
  }

  /** Join-key skew audit — the pre-shuffle diagnostic behind w07's
    * salting decision: the top-10 heaviest keys of events.user_id with
    * exact counts, each key's share of all rows, the cumulative share,
    * and the skew ratio n * n_keys / n_rows (how many times the mean
    * key weight this key carries). A skew_ratio in the hundreds on
    * rank 1 is the "one reducer gets the hot key" signal that decides
    * between a plain hash join and salting/AQE skew handling. Counts
    * exact; each reported double is one division of exact integers.
    *
    * 100 TB posture: ONE key-counting hash agg over the corpus, then a
    * map-side graft_topk heap bounds the shuffle to 10 rows per
    * partition; the totals ride the d23 1-row scalar broadcast
    * (allowlisted BNLJ) and the cumulative window runs over 10 rows.
    */
  def w40KeySkew(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val counts = graft.Caches.cache(Tables.events(spark, dir)
      .groupBy("user_id").agg(count(lit(1)).as("n")))
    val tot = counts.agg(sum(col("n")).as("n_rows"),
      count(lit(1)).as("n_keys"))
    val top = counts
      .agg(expr("graft_topk(CAST(n AS DOUBLE), user_id, 10)").as("top"))
      .select(posexplode(col("top")).as(Seq("p0", "s")))
      .select((col("p0") + 1).cast("long").as("rank"),
        col("s.id").as("user_id"), col("s.score").cast("long").as("n"))
    val wCum = Window.orderBy(col("rank"))
      .rowsBetween(Window.unboundedPreceding, 0)
    top.crossJoin(broadcast(tot))
      .select(col("rank"), col("user_id"), col("n"),
        (col("n").cast("double") / col("n_rows")).as("share"),
        (sum(col("n")).over(wCum).cast("double") / col("n_rows"))
          .as("cum_share"),
        ((col("n") * col("n_keys")).cast("double") / col("n_rows"))
          .as("skew_ratio"))
      .orderBy("rank")
  }

  /** Top user-journey paths — w28's transition matrix lifted to order
    * 3: the 10 most common consecutive 3-event sequences within a
    * user's stream (two leads over the same (user, (ts, event_id))
    * total order), with exact counts and the share of all trigrams.
    * The product-analytics "what do users actually do" query; the
    * step count extends by one lead per step on the SAME window, so
    * deeper paths stay one shuffle.
    *
    * 100 TB posture: ONE user-keyed window sort (w28's plan) + a
    * (type^3)-keyed hash agg; top-10 via TakeOrdered on the tiny path
    * frame; the 1-row trigram total rides the d23 scalar broadcast.
    */
  def w41TopPaths(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val tris = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("t2", lead(col("event_type"), 1).over(w))
      .withColumn("t3", lead(col("event_type"), 2).over(w))
      .filter(col("t3").isNotNull)
      .groupBy(col("event_type").as("step1"), col("t2").as("step2"),
        col("t3").as("step3"))
      .agg(count(lit(1)).as("n"))
    val cached = graft.Caches.cache(tris)
    val tot = cached.agg(sum(col("n")).as("n_total"))
    cached.crossJoin(broadcast(tot))
      .select(col("step1"), col("step2"), col("step3"), col("n"),
        (col("n").cast("double") / col("n_total")).as("share"))
      .orderBy(col("n").desc, col("step1"), col("step2"), col("step3"))
      .limit(10)
  }

  /** Exponentially-weighted hourly rate (EWMA, half-life 1 hour) —
    * the trend-smoothing twin of w36's seasonal baseline, made
    * EXACT: classical EWMA is a sequential float recurrence whose
    * parallelization (weights (1-a)^k) drifts across engines and
    * summation orders; with a = 1/2 the weights are DYADIC
    * (2^(23-k) over a 24-hour window), so the smoothed numerator and
    * the weight denominator are both exact integer sums and the
    * reported ewma is ONE division. Window truncation at 24 hours
    * bounds the integers (x * 2^23 per term) and loses < 2^-24 of the
    * mass — below the emitted double's own precision. Each cell also
    * reports n/ewma as the surge ratio.
    *
    * 100 TB posture: cells come from the w31 zero-filled spine
    * ((types x hours)-sized, never raw events); the 24x contribution
    * explode multiplies only that cell frame, and the re-aggregation
    * is a (type, hour)-keyed hash agg.
    */
  def w42Ewma(spark: SparkSession, dir: String): DataFrame =
    w42EwmaOf(Tables.events(spark, dir).select("event_type", "ts"))

  /** The w42 body over any (event_type, ts) frame — exposed for the
    * hand-computed spike-decay spec.
    */
  private[graft] def w42EwmaOf(raw: DataFrame): DataFrame =
    ewmaOfCells(graft.Caches.cache(hourlyCellsOf(raw)))

  /** The EWMA body over an already-spined (event_type, h, x) cell
    * frame — shared with the streaming-accumulated board (the
    * lakehouse-as-accumulator pattern: a tumbling-count table feeds
    * [[spineFillCells]] then this).
    */
  private[graft] def ewmaOfCells(cells: DataFrame): DataFrame = {
    // cell at hour h contributes x * 2^(23-k) to hours h .. h+23
    // wx = x * 2^(23-k): a per-hour count times up to 2^23 — past ~1e12
    // hourly events the weighted sum overflows signed 64-bit in both
    // engines, so wx runs in DECIMAL(38,0) / HUGEINT (the w53
    // convention); the weight denominator (< 2^24 per hour) stays long
    val contrib = cells
      .select(col("event_type"), col("h"), col("x"),
        explode(expr("sequence(0, 23)")).as("k"))
      .select(col("event_type"),
        expr("h + k * interval 1 hour").as("hour"),
        expr("CAST(x AS DECIMAL(38,0)) * shiftleft(1L, 23 - k)").as("wx"),
        expr("shiftleft(1L, 23 - k)").as("w"))
    contrib
      // clip to the observed spine: hours past each type's last cell
      // would otherwise appear with partial (tail-only) windows
      .join(cells.select(col("event_type"), col("h").as("hour"),
        col("x").as("n")), Seq("event_type", "hour"))
      .groupBy("event_type", "hour", "n")
      .agg(sum(col("wx")).as("num"), sum(col("w")).as("den"))
      .select(col("event_type"), col("hour"), col("n"),
        (col("num").cast("double") / col("den")).as("ewma"),
        when(col("num") > 0,
          col("n").cast("double") * col("den") / col("num"))
          .as("surge_ratio"))
      .orderBy("event_type", "hour")
  }

  /** Lag autocorrelation of the hourly count series (lags 1 and 24) —
    * the seasonality-STRENGTH statistic next to w36's seasonal
    * baselines: a high lag-24 Pearson r says the daily cycle dominates
    * (w36's hour-of-day baseline is trustworthy), a high lag-1 with a
    * flat lag-24 says drift/bursts, not seasonality. Cells come from
    * the w31 zero-filled spine (gap hours are REAL zero observations —
    * skipping them would splice non-adjacent hours into fake pairs).
    *
    * Cross-engine exactness: g04's moment form — n, Σx, Σy, Σxy, Σxx,
    * Σyy are exact integer sums over the paired series; r is one
    * division whose numerator is an exact integer cast and whose
    * denominator is the product of two correctly-rounded IEEE sqrts of
    * exact integers — the identical double in both engines. A
    * zero-variance side yields NULL (constant series have no
    * correlation), never a 0/0 NaN.
    *
    * 100 TB posture: raw events collapse to the (types x hours) cell
    * frame first; ONE type-keyed window sort produces both lead
    * columns; `stack` unpivots in-place (no second window); the moment
    * agg is a (type, lag)-keyed hash agg over cell-sized rows.
    */
  def w43Autocorr(spark: SparkSession, dir: String): DataFrame =
    w43AutocorrOf(Tables.events(spark, dir).select("event_type", "ts"))

  /** The w43 body over any (event_type, ts) frame — exposed for the
    * hand-computed periodic-fixture spec.
    */
  private[graft] def w43AutocorrOf(raw: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("h"))
    val lagged = hourlyCellsOf(raw)
      .withColumn("y1", lead(col("x"), 1).over(w))
      .withColumn("y24", lead(col("x"), 24).over(w))
    val pairs = lagged
      .select(col("event_type"), col("x"), expr(
        "stack(2, CAST(1 AS BIGINT), y1, CAST(24 AS BIGINT), y24)")
        .as(Seq("lag", "y")))
      .filter(col("y").isNotNull)
    // moment arithmetic in DECIMAL(38,0) / HUGEINT (the w53
    // convention): x,y are per-hour counts, so the x*y/x²/y² sums and
    // the n_pairs*sxx − sx² cross products overflow signed 64-bit at
    // corpus scale while both engines would wrap identically. sxy
    // PUBLISHES as DOUBLE (exact below 2^53 — published DECIMAL fails
    // the driver's row hash, VERDICT r14).
    val dec = (c: Column) => c.cast(DecimalType(38, 0))
    val m = pairs.groupBy("event_type", "lag")
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(dec(col("x")) * dec(col("y"))).as("sxy"),
        sum(dec(col("x")) * dec(col("x"))).as("sxx"),
        sum(dec(col("y")) * dec(col("y"))).as("syy"))
    val varX = dec(col("n_pairs")) * col("sxx") - dec(col("sx")) * dec(col("sx"))
    val varY = dec(col("n_pairs")) * col("syy") - dec(col("sy")) * dec(col("sy"))
    m.select(col("event_type"), col("lag"), col("n_pairs"),
      col("sxy").cast("double").as("sxy"),
      when(varX > 0 && varY > 0,
        (dec(col("n_pairs")) * col("sxy") - dec(col("sx")) * dec(col("sy")))
          .cast("double") /
          (sqrt(varX.cast("double")) * sqrt(varY.cast("double"))))
        .as("autocorr"))
      .orderBy("event_type", "lag")
  }

  /** Conversion attribution, first-touch vs last-touch (7-day
    * lookback) — the marketing-analytics staple w26/w39 stop short of:
    * WHICH channel (view or click) gets credit for each purchase, under
    * both models, with unattributed purchases kept as an honest 'none'
    * row. Both models come from ONE user-keyed range window
    * (micros-exact bounds [-7d, -1µs] — a same-microsecond touch never
    * attributes): min/max of the null-gated (um, event_id, type) struct
    * pick the first/last touch with the event-id tiebreak, exactly the
    * oracle's row_number order since (um, event_id) is unique.
    *
    * 100 TB posture: one user-keyed window sort over events; everything
    * after runs on the purchases-sized frame (cached — both the count
    * and the channel agg read it); the 6-row model×channel spine and
    * the 1-row purchase total ride broadcasts (BNLJ allowlisted).
    */
  def w44Attribution(spark: SparkSession, dir: String): DataFrame =
    w44AttributionOf(spark, Tables.events(spark, dir)
      .select("event_id", "ts", "user_id", "event_type"))

  /** The w44 body over any (event_id, ts, user_id, event_type) frame —
    * exposed for the hand-computed lookback/tiebreak spec.
    */
  private[graft] def w44AttributionOf(spark: SparkSession, raw: DataFrame)
      : DataFrame = {
    val lookback = 7L * 86400L * 1000000L
    val ev = raw.select(col("event_id"), unix_micros(col("ts")).as("um"),
      col("user_id"), col("event_type"))
    val isTouch = col("event_type").isin("view", "click")
    val w = Window.partitionBy("user_id").orderBy("um")
      .rangeBetween(-lookback, -1L)
    val touch = when(isTouch,
      struct(col("um"), col("event_id"), col("event_type")))
    val attributed = graft.Caches.cache(ev
      .withColumn("first_t", min(touch).over(w))
      .withColumn("last_t", max(touch).over(w))
      .filter(col("event_type") === "purchase")
      .select(
        coalesce(col("first_t.event_type"), lit("none")).as("first_ch"),
        coalesce(col("last_t.event_type"), lit("none")).as("last_ch")))
    w44Report(spark, attributed)
  }

  /** w44's report finisher over a per-purchase (first_ch, last_ch)
    * frame — shared with the streaming twin's accumulated-results fold
    * (the lakehouse-as-accumulator pattern).
    */
  private[graft] def w44Report(spark: SparkSession, perPurchase: DataFrame)
      : DataFrame = {
    val counts = perPurchase
      .select(expr(
        "stack(2, 'first_touch', first_ch, 'last_touch', last_ch)")
        .as(Seq("model", "channel")))
      .groupBy("model", "channel").agg(count(lit(1)).as("n_conversions"))
    val tot = perPurchase.agg(count(lit(1)).as("n_purchases"))
    val spine = spark.createDataFrame(Seq(
      ("first_touch", "view"), ("first_touch", "click"),
      ("first_touch", "none"), ("last_touch", "view"),
      ("last_touch", "click"), ("last_touch", "none")))
      .toDF("model", "channel")
    spine.join(counts, Seq("model", "channel"), "left")
      .crossJoin(broadcast(tot))
      .select(col("model"), col("channel"),
        coalesce(col("n_conversions"), lit(0L)).as("n_conversions"),
        (coalesce(col("n_conversions"), lit(0L)).cast("double") /
          col("n_purchases")).as("share"))
      .orderBy("model", "channel")
  }

  /** Winsorized + trimmed mean per event type — the robust-mean
    * companion to w23's MAD: the raw mean, the mean after clamping
    * values to the exact rank-based p05/p95 cuts (winsorize — tails
    * pulled in, every row still counts), and the mean over only the
    * rows inside the cuts (trim — tails dropped, ties at the cut
    * kept). The number a metrics pipeline quotes when a handful of
    * outliers would otherwise own the average. Cuts are w09's
    * rank-selection (value at rank ceil(q·n), no interpolation —
    * engine-identical); all three means are exact-decimal sums with
    * ONE IEEE division each (the w01 idiom).
    *
    * Scale: cuts ride the shared two-phase rank machinery (scan +
    * histogram, no per-group sort); the clamp/trim pass is one
    * broadcast join of G cut rows + a single map-side-combined agg —
    * two scans of the source total, nothing corpus-sized sorted.
    */
  def w45WinsorizedStats(spark: SparkSession, dir: String): DataFrame =
    winsorizedOf(Tables.events(spark, dir).select("event_type", "value"))

  /** The w45 body over any (event_type, value) frame — exposed so the
    * spec can pin hand-computed cuts and means. */
  private[ops] def winsorizedOf(ev: DataFrame): DataFrame = {
    val stats = rankStats(ev)
    val wanted = stats
      .select(col("event_type"), col("cnt"),
        explode(array(
          struct(lit("lo").as("q"),
            expr("CAST(ceil(cnt * 0.05) AS BIGINT)").as("r")),
          struct(lit("hi").as("q"),
            expr("CAST(ceil(cnt * 0.95) AS BIGINT)").as("r")))).as("t"))
      .select(col("event_type"), col("cnt"),
        col("t.q").as("q"), col("t.r").as("r"))
    val cuts = valuesAtRanks(ev, stats, wanted)
      .groupBy("event_type", "cnt")
      .agg(max(when(col("q") === "lo", col("value"))).as("lo_cut"),
        max(when(col("q") === "hi", col("value"))).as("hi_cut"))
    val kept = col("value") >= col("lo_cut") && col("value") <= col("hi_cut")
    ev.join(broadcast(cuts), Seq("event_type"))
      .groupBy(col("event_type"), col("cnt"),
        col("lo_cut"), col("hi_cut"))
      .agg(
        sum(col("value").cast(DecimalType(28, 6))).cast("double")
          .as("sum_raw"),
        sum(least(greatest(col("value"), col("lo_cut")), col("hi_cut"))
          .cast(DecimalType(28, 6))).cast("double").as("sum_win"),
        sum(when(kept, col("value").cast(DecimalType(28, 6))))
          .cast("double").as("sum_trim"),
        sum(when(kept, 1L).otherwise(0L)).as("n_kept"))
      .select(col("event_type"), col("cnt").as("n"),
        (col("sum_raw") / col("cnt")).as("mean"),
        col("lo_cut"), col("hi_cut"),
        (col("sum_win") / col("cnt")).as("winsorized_mean"),
        when(col("n_kept") > 0, col("sum_trim") / col("n_kept"))
          .as("trimmed_mean"),
        (col("cnt") - col("n_kept")).as("n_trimmed"))
      .orderBy("event_type")
  }

  /** Weekly activity profile — the day-of-week × hour-of-day heatmap
    * behind every ops dashboard, with the zero cells KEPT: the full
    * 7×24 spine per event type (the d23 discipline — a silent hour is
    * a real cell, and the weekend trough is the capacity-planning
    * signal). dow is computed as ((days-since-1970-01-01 + 4) mod 7,
    * 0 = Sunday) — explicit epoch arithmetic instead of the engines'
    * dayofweek builtins, whose numbering conventions disagree (Spark
    * 1=Sunday, DuckDB 0=Sunday); counts exact, share-of-type one
    * division.
    *
    * Scale: one (type, dow, hour)-keyed agg over the events scan
    * (map-side combined; ≤ types × 168 groups), the spine join is
    * types × 168 broadcast rows, per-type totals a broadcast equality
    * join.
    */
  def w46WeeklyProfile(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_type"),
        ((datediff(to_date(col("ts")), lit("1970-01-01")) + 4) % 7)
          .cast("long").as("dow"),
        hour(col("ts")).cast("long").as("hour"))
    val counts = ev.groupBy("event_type", "dow", "hour")
      .agg(count(lit(1)).as("n"))
    val spine = ev.select("event_type").distinct()
      .select(col("event_type"), explode(expr("sequence(0L, 6L)")).as("dow"))
      .select(col("event_type"), col("dow"),
        explode(expr("sequence(0L, 23L)")).as("hour"))
    val totals = ev.groupBy("event_type").agg(count(lit(1)).as("n_type"))
    spine.join(counts, Seq("event_type", "dow", "hour"), "left")
      .join(broadcast(totals), Seq("event_type"))
      .select(col("event_type"), col("dow"), col("hour"),
        coalesce(col("n"), lit(0L)).as("n"),
        (coalesce(col("n"), lit(0L)).cast("double") / col("n_type"))
          .as("share_of_type"))
      .orderBy("event_type", "dow", "hour")
  }

  /** Market-basket association rules over order baskets: the 20 most
    * frequent part co-occurrence pairs with exact support, confidence
    * and lift — the classic "frequently bought together" first pass
    * (the co-occurrence count an FP-growth run would start from).
    * Items are distinct (order, part) so a part listed twice in one
    * order counts once; pairs are canonical part_a < part_b; lift
    * compares the observed pair rate to the independence expectation
    * (lift >> 1 = genuine affinity, << 1 = substitutes). Every double
    * is ONE division of exact integer counts; top-20 has the
    * (n_co DESC, part_a, part_b) total order so the selected SET is
    * engine-identical.
    *
    * 100 TB posture: pairs explode from per-order basket arrays built
    * by ONE orderkey-keyed collect_set (baskets are ≤ a few lines, so
    * the array is bounded and the explode is per-basket size squared —
    * never corpus x corpus, and the corpus-sized frame shuffles
    * exactly once); the (a, b) count agg is map-side combined; top-20
    * is a TakeOrdered, so only 20 rows ever reach the item-count joins
    * (broadcast) and the 1-row basket-total scalar (the d23 broadcast,
    * BNLJ allowlisted).
    */
  def w47MarketBasket(spark: SparkSession, dir: String): DataFrame =
    marketBasketOf(Tables.lineitem(spark, dir))

  /** w47 core on any (l_orderkey, l_partkey) frame — fixture-testable.
    *
    * r15 restructure (guide §2.4 — remove shuffles outright): the
    * original pair stage was items.distinct() (one exchange) + a
    * self-equality-join on l_orderkey (a broadcast build of the WHOLE
    * items frame at bench scale, a second full shuffle of it at
    * cluster scale) + separate itemCounts / countDistinct(l_orderkey)
    * passes (two more exchanges). Baskets are bounded (a few lines per
    * order), so ONE orderkey-keyed collect_set produces the basket
    * array directly — collect_set dedups in place of distinct(), pairs
    * explode from the sorted array (canonical a < b by construction),
    * and item counts + the basket total both derive from the cached
    * baskets frame with no further pass over lineitem. Plan: 5
    * exchanges + full-frame broadcast → 3 exchanges, no broadcast of
    * a corpus-sized side; pair volume is unchanged (per-basket size
    * squared). Result-identical: same pair multiset, same counts.
    */
  def marketBasketOf(lineitem: DataFrame): DataFrame = {
    val baskets = graft.Caches.cache(lineitem
      .groupBy("l_orderkey")
      .agg(sort_array(collect_set(col("l_partkey"))).as("parts")))
    val itemCounts = graft.Caches.cache(baskets
      .select(explode(col("parts")).as("l_partkey"))
      .groupBy("l_partkey").agg(count(lit(1)).as("n_item")))
    val tot = baskets.agg(count(lit(1)).as("n_orders"))
    val co = baskets
      .select(explode(expr(
        "flatten(transform(parts, (a, i) -> " +
          "transform(slice(parts, i + 2, size(parts)), " +
          "b -> struct(a AS part_a, b AS part_b))))")).as("p"))
      .select(col("p.part_a").as("part_a"), col("p.part_b").as("part_b"))
      .groupBy("part_a", "part_b").agg(count(lit(1)).as("n_co"))
    val top = co.orderBy(col("n_co").desc, col("part_a"), col("part_b"))
      .limit(20)
    top
      .join(itemCounts.select(col("l_partkey").as("part_a"),
        col("n_item").as("n_a")), Seq("part_a"))
      .join(itemCounts.select(col("l_partkey").as("part_b"),
        col("n_item").as("n_b")), Seq("part_b"))
      .crossJoin(broadcast(tot))
      .select(col("part_a"), col("part_b"), col("n_co"), col("n_a"),
        col("n_b"), col("n_orders"),
        (col("n_co").cast("double") / col("n_orders")).as("support"),
        (col("n_co").cast("double") / col("n_a")).as("confidence"),
        // lift's cross products (n_co*n_orders, n_a*n_b) are counts x
        // counts — past ~3e9 baskets they overflow signed 64-bit
        // identically in both engines, so they run in DECIMAL(38,0) /
        // HUGEINT (the w53 convention), one double cast per side
        {
          val dec = (c: Column) => c.cast(DecimalType(38, 0))
          ((dec(col("n_co")) * dec(col("n_orders"))).cast("double") /
            (dec(col("n_a")) * dec(col("n_b"))).cast("double")).as("lift")
        })
      .orderBy(col("n_co").desc, col("part_a"), col("part_b"))
  }

  /** Cohort lifetime-value triangle: customers cohorted by first-order
    * month; per (cohort, account-age-in-months) exact order counts,
    * active customers, revenue, decimal-exact cumulative revenue and
    * LTV per cohort member — the retention-economics twin of w27's
    * activity triangle. Ages are zero-filled to the global last month
    * (a quiet month is a real cell; the cumulative line must stay flat
    * through it, not skip it), month arithmetic is explicit
    * (year*12 + month — exact integers in both engines), and the
    * cumulative sum runs over DECIMAL so the running total is
    * order-independent, cast to double once at the edge.
    *
    * 100 TB posture: one custkey-keyed first-order agg + one
    * custkey-equality enrichment join over the orders scan; everything
    * downstream is the (months x months)/2 cell frame. The cumulative
    * window partitions by cohort over <= months rows; the 1-row global
    * max-month scalar rides the d23 broadcast (BNLJ allowlisted).
    */
  def w48CohortLtv(spark: SparkSession, dir: String): DataFrame =
    cohortLtvOf(Tables.orders(spark, dir))

  /** w48 core on any (o_custkey, o_orderdate, o_totalprice) frame. */
  def cohortLtvOf(orders: DataFrame): DataFrame = {
    val o = graft.Caches.cache(orders
      .select(col("o_custkey"), date_trunc("month", col("o_orderdate"))
        .as("m"), col("o_totalprice")))
    val cohort = graft.Caches.cache(
      o.groupBy("o_custkey").agg(min(col("m")).as("cm")))
    def monthsIdx(c: org.apache.spark.sql.Column) =
      year(c) * 12 + month(c)
    val cells = o.join(cohort, Seq("o_custkey"))
      .groupBy(col("cm"),
        (monthsIdx(col("m")) - monthsIdx(col("cm"))).cast("long").as("age"))
      .agg(count(lit(1)).as("n_orders"),
        countDistinct(col("o_custkey")).as("n_active"),
        sum(col("o_totalprice").cast(DecimalType(28, 4))).as("rev"))
    val sizes = cohort.groupBy("cm").agg(count(lit(1)).as("cohort_size"))
    val gm = o.agg(max(col("m")).as("gm"))
    val spine = sizes.crossJoin(broadcast(gm))
      .select(col("cm"), col("cohort_size"),
        explode(sequence(lit(0L),
          (monthsIdx(col("gm")) - monthsIdx(col("cm"))).cast("long")))
          .as("age"))
    val w = Window.partitionBy(col("cm")).orderBy(col("age"))
    val rev0 = coalesce(col("rev"), lit(0).cast(DecimalType(28, 4)))
    spine.join(cells, Seq("cm", "age"), "left")
      .select(col("cm").cast("date").as("cohort_month"),
        col("age").as("age_months"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("n_active"), lit(0L)).as("n_active"),
        rev0.cast("double").as("revenue"),
        sum(rev0).over(w).cast("double").as("cum_revenue"),
        col("cohort_size"),
        (sum(rev0).over(w).cast("double") / col("cohort_size"))
          .as("ltv_per_customer"))
      .orderBy("cohort_month", "age_months")
  }

  /** RFM customer segmentation — the classic CRM cube: per customer,
    * Recency (days since last order, vs the global max date),
    * Frequency (order count) and Monetary (decimal-exact revenue),
    * each scored 1..5 by QUINTILE CUT VALUES (value at rank
    * ceil(q·n), q in {.2,.4,.6,.8} — w09's rank selection, ties share
    * the cut) with score = 1 + (cuts strictly beaten); recency is
    * negated first so "bigger = better" holds for all three
    * dimensions and a tie AT a cut lands in the lower score
    * deterministically. Output = the occupied (r, f, m) segment cells
    * with exact customer counts and one share division — (5,5,5) is
    * the champions cell, (1,1,1) the lost cell.
    *
    * 100 TB posture: the three dimensions ride ONE long frame through
    * the SHARED two-phase rank machinery (histogram + candidate
    * bucket — no global sort, no per-customer rank materialized); the
    * 12-row cut table is then BROADCAST AS PER-DIMENSION ARRAYS and all
    * three scores are one map-side pass over the per-customer frame —
    * zero scoring shuffles (the r9 plan joined a 3n-row long frame and
    * paid two extra n-row shuffles for the same numbers); the cube
    * re-agg sees <= 125 cells. The 1-row customer total rides the d23
    * scalar broadcast. The cut table is write-once per dataset dir per
    * JVM (madStats discipline, r9 VERDICT item 2).
    */
  def w49RfmSegments(spark: SparkSession, dir: String): DataFrame = {
    val base = rfmBase(Tables.orders(spark, dir))
    // Values identical by construction (the build IS rfmCutsOf).
    val cuts = graft.Materialized.table(spark, s"rfmcuts:$dir", dir)(
      rfmCutsBuild(spark, dir))
    rfmSegmentsFrom(base, cuts)
  }

  /** The raw (unmaterialized) rfmcuts build plan — see [[madStatsBuild]]. */
  private[graft] def rfmCutsBuild(
      spark: SparkSession, dir: String): DataFrame =
    rfmCutsOf(rfmLongOf(rfmBase(Tables.orders(spark, dir))))

  /** w49 core over any (o_custkey, o_orderdate, o_totalprice) frame. */
  private[graft] def rfmOf(orders: DataFrame): DataFrame = {
    val base = rfmBase(orders)
    rfmSegmentsFrom(base, rfmCutsOf(rfmLongOf(base)))
  }

  /** Per-customer (o_custkey, recency_days, frequency, monetary). */
  private def rfmBase(orders: DataFrame): DataFrame = {
    val per = orders.groupBy("o_custkey").agg(
      max(col("o_orderdate")).as("last_order"),
      count(lit(1)).as("frequency"),
      sum(col("o_totalprice").cast(DecimalType(28, 4))).cast("double")
        .as("monetary"))
    val gm = per.agg(max(col("last_order")).as("gmax"))
    graft.Caches.cache(per.crossJoin(broadcast(gm))
      .select(col("o_custkey"),
        datediff(col("gmax"), col("last_order")).cast("long")
          .as("recency_days"),
        col("frequency"), col("monetary")))
  }

  /** The long (o_custkey, event_type, value) RFM frame off the base —
    * all three dimensions in one explode so the rank machinery runs
    * once; recency negated: bigger = better in every dimension.
    */
  private def rfmLongOf(base: DataFrame): DataFrame =
    graft.Caches.cache(base
      .select(col("o_custkey"), explode(array(
        struct(lit("recency").as("event_type"),
          (-col("recency_days")).cast("double").as("value")),
        struct(lit("frequency").as("event_type"),
          col("frequency").cast("double").as("value")),
        struct(lit("monetary").as("event_type"),
          col("monetary").cast("double").as("value")))).as("t"))
      .select(col("o_custkey"), col("t.event_type").as("event_type"),
        col("t.value").as("value")))

  /** The 12-row (event_type, cut) quintile cut table off the long RFM
    * frame — the expensive two-phase rank selection, isolated so
    * [[w49RfmSegments]] can materialize it write-once per dataset dir.
    */
  private[graft] def rfmCutsOf(evK: DataFrame): DataFrame = {
    val ev = evK.select("event_type", "value")
    val stats = rankStats(ev)
    val wanted = stats
      .select(col("event_type"), col("cnt"),
        explode(array(Seq(0.2, 0.4, 0.6, 0.8).map(q =>
          struct(lit(q).as("q"),
            expr(s"CAST(ceil(cnt * $q) AS BIGINT)").as("r"))): _*)).as("t"))
      .select(col("event_type"), col("t.q").as("q"), col("t.r").as("r"))
    valuesAtRanks(ev, stats, wanted)
      .select(col("event_type"), col("value").as("cut"))
  }

  /** w49's scoring + segment-cell rollup over the per-customer base and
    * a (event_type, cut) table (4 cuts per dimension): the cuts fold to
    * ONE broadcast row of three 4-element arrays, and score = 1 + (cuts
    * strictly beaten) is a map-side array filter — sum(value > cut) over
    * the joined 12-row form and size(filter(cuts, c -> value > c)) count
    * the same comparisons, so this is value-identical to the long-frame
    * join while shuffling nothing per customer.
    */
  private def rfmSegmentsFrom(base: DataFrame, cuts: DataFrame): DataFrame = {
    def arr(d: String) = sort_array(collect_list(
      when(col("event_type") === d, col("cut")))).as(s"${d}_cuts")
    val cutsW = cuts.groupBy()
      .agg(arr("recency"), arr("frequency"), arr("monetary"))
    def score(v: org.apache.spark.sql.Column, cs: String) =
      (lit(1L) + size(filter(col(cs), c => v > c)).cast("long"))
    // cached: consumed by BOTH the 1-row total and the segment rollup —
    // uncached, the whole base->scores pipeline runs twice
    val wide = graft.Caches.cache(base.crossJoin(broadcast(cutsW))
      .select(col("o_custkey"),
        score((-col("recency_days")).cast("double"), "recency_cuts")
          .as("r_score"),
        score(col("frequency").cast("double"), "frequency_cuts")
          .as("f_score"),
        score(col("monetary"), "monetary_cuts").as("m_score")))
    val tot = wide.agg(count(lit(1)).as("n_total"))
    wide.groupBy("r_score", "f_score", "m_score")
      .agg(count(lit(1)).as("n_customers"))
      .crossJoin(broadcast(tot))
      .select(col("r_score"), col("f_score"), col("m_score"),
        col("n_customers"),
        (col("n_customers").cast("double") / col("n_total"))
          .as("share"))
      .orderBy("r_score", "f_score", "m_score")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "w49_rfm_segments" -> (w49RfmSegments _),
    "w48_cohort_ltv" -> (w48CohortLtv _),
    "w47_market_basket" -> (w47MarketBasket _),
    "w46_weekly_profile" -> (w46WeeklyProfile _),
    "w45_winsorized_stats" -> (w45WinsorizedStats _),
    "w44_attribution" -> (w44Attribution _),
    "w43_autocorr" -> (w43Autocorr _),
    "w42_ewma" -> (w42Ewma _),
    "w41_top_paths" -> (w41TopPaths _),
    "w40_key_skew" -> (w40KeySkew _),
    "w39_conversion_latency" -> (w39ConversionLatency _),
    "w38_anomaly_runs" -> (w38AnomalyRuns _),
    "w37_ab_lift" -> (w37AbLift _),
    "w36_seasonal_baseline" -> (w36SeasonalBaseline _),
    "w35_rolling_active" -> (w35RollingActive _),
    "w34_session_funnel" -> (w34SessionFunnel _),
    "w33_ohlc_bars" -> (w33OhlcBars _),
    "w32_top_movers" -> (w32TopMovers _),
    "w31_changepoint" -> (w31Changepoint _),
    "w30_gap_quantiles" -> (w30GapQuantiles _),
    "w29_robust_outliers" -> (w29RobustOutliers _),
    "w28_transition_matrix" -> (w28TransitionMatrix _),
    "w52_l_diversity" -> (w52LDiversity _),
    "w53_t_closeness" -> (w53TCloseness _),
    "w54_out_of_order" -> (w54OutOfOrder _),
    "w51_k_anonymity" -> (w51KAnonymity _),
    "w50_churn_hazard" -> (w50ChurnHazard _),
    "w27_retention_cohorts" -> (w27RetentionCohorts _),
    "w26_funnel" -> (w26Funnel _),
    "w25_gapfill" -> (w25GapFill _),
    "w21_scd2_build" -> (w21Scd2Build _),
    "w20_zorder_stats" -> (w20ZorderStats _),
    "w19_interval_overlap" -> (w19IntervalOverlap _),
    "w17_running_distinct" -> (w17RunningDistinct _),
    "w18_set_ops_all" -> (w18SetOpsAll _),
    "w16_grouping_sets" -> (w16GroupingSets _),
    "w06_approx_distinct" -> (w06ApproxDistinct _),
    "w15_unpivot" -> (w15Unpivot _),
    "w14_full_outer" -> (w14FullOuter _),
    "w13_window_suite" -> (w13WindowSuite _),
    "w10_cube" -> (w10Cube _),
    "w11_pivot" -> (w11Pivot _),
    "w12_range_join" -> (w12RangeJoin _),
    "w07_salted_agg" -> (w07SaltedAgg _),
    "w08_exact_median" -> (w08ExactMedian _),
    "w09_quantiles" -> (w09Quantiles _),
    "w01_tumbling_agg" -> (w01TumblingAgg _),
    "w02_sessionization" -> (w02Sessionization _),
    "w03_asof_join" -> (w03AsofJoin _),
    "w04_rollup" -> (w04Rollup _),
    "w05_set_ops" -> (w05SetOps _),
    "w22_nearest_join" -> (w22NearestJoin _),
    "w23_mad" -> (w23Mad _),
    "w24_scd2_asof" -> (w24Scd2Asof _)
  )

  private val zSqlExpr = (0 until 16).map(i =>
    s"(((a >> $i) & 1) << ${2 * i}) + (((b >> $i) & 1) << ${2 * i + 1})")
    .mkString(" + ")

  /** w23's exact median+MAD CTE chain (through the `mad` CTE) —
    * shared by the w23 oracle and w29's outlier join.
    */
  private val madSqlCtes: String =
    """WITH s AS (SELECT event_type, value FROM events),
        |n AS (SELECT event_type, count(*) AS cnt FROM s GROUP BY event_type),
        |rk AS (
        |  SELECT event_type, value,
        |    row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn
        |  FROM s
        |),
        |med AS (
        |  SELECT rk.event_type,
        |    CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) / count(*)
        |      AS median_value
        |  FROM rk JOIN n USING (event_type)
        |  WHERE rn IN ((cnt + 1) // 2, (cnt + 2) // 2)
        |  GROUP BY rk.event_type
        |),
        |d AS (
        |  SELECT s.event_type, abs(s.value - m.median_value) AS dv
        |  FROM s JOIN med m USING (event_type)
        |),
        |dr AS (
        |  SELECT event_type, dv,
        |    row_number() OVER (PARTITION BY event_type ORDER BY dv) AS rn
        |  FROM d
        |),
        |mad AS (
        |  SELECT dr.event_type, dv
        |  FROM dr JOIN n USING (event_type)
        |  WHERE rn = (cnt + 1) // 2
        |)""".stripMargin

  val oracle: Map[String, String] = Map(
    // w49: quintile cut VALUES at rank ceil(q*n) (same IEEE ceil(n*q)
    // product in both engines), score = 1 + cuts strictly beaten,
    // recency negated so bigger = better everywhere
    "w49_rfm_segments" ->
      """WITH per AS (
        |  SELECT o_custkey, max(o_orderdate) AS last_order,
        |    CAST(count(*) AS BIGINT) AS frequency,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE)
        |      AS monetary
        |  FROM orders GROUP BY 1
        |),
        |gm AS (SELECT max(last_order) AS gmax FROM per),
        |evk AS (
        |  SELECT o_custkey, 'recency' AS dim,
        |    -CAST(datediff('day', last_order, gmax) AS DOUBLE) AS value
        |  FROM per CROSS JOIN gm
        |  UNION ALL SELECT o_custkey, 'frequency',
        |    CAST(frequency AS DOUBLE) FROM per
        |  UNION ALL SELECT o_custkey, 'monetary', monetary FROM per
        |),
        |ranked AS (
        |  SELECT dim, value,
        |    row_number() OVER (PARTITION BY dim ORDER BY value) AS rn
        |  FROM evk
        |),
        |cnts AS (SELECT dim, count(*) AS cnt FROM evk GROUP BY 1),
        |cutranks AS (
        |  SELECT dim, CAST(ceil(cnt * q) AS BIGINT) AS r
        |  FROM cnts CROSS JOIN (VALUES (0.2), (0.4), (0.6), (0.8)) t(q)
        |),
        |cuts AS (
        |  SELECT c.dim, rk.value AS cut
        |  FROM cutranks c JOIN ranked rk
        |    ON rk.dim = c.dim AND rk.rn = c.r
        |),
        |scores AS (
        |  SELECT e.o_custkey, e.dim,
        |    1 + CAST(sum(CASE WHEN e.value > c.cut THEN 1 ELSE 0 END)
        |      AS BIGINT) AS score
        |  FROM evk e JOIN cuts c ON c.dim = e.dim
        |  GROUP BY 1, 2
        |),
        |wide AS (
        |  SELECT o_custkey,
        |    max(CASE WHEN dim = 'recency' THEN score END) AS r_score,
        |    max(CASE WHEN dim = 'frequency' THEN score END) AS f_score,
        |    max(CASE WHEN dim = 'monetary' THEN score END) AS m_score
        |  FROM scores GROUP BY 1
        |),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM wide)
        |SELECT r_score, f_score, m_score,
        |  CAST(count(*) AS BIGINT) AS n_customers,
        |  CAST(count(*) AS DOUBLE) / t.n_total AS share
        |FROM wide CROSS JOIN tot t
        |GROUP BY r_score, f_score, m_score, t.n_total
        |ORDER BY r_score, f_score, m_score""".stripMargin,

    // w47: canonical a<b pairs on distinct (order, part); every double
    // one division of exact integers; the (n_co DESC, a, b) total
    // order makes the top-20 set engine-identical
    "w47_market_basket" ->
      """WITH items AS (
        |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        |),
        |ic AS (
        |  SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_item
        |  FROM items GROUP BY 1
        |),
        |tot AS (
        |  SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders
        |  FROM items
        |),
        |co AS (
        |  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
        |    CAST(count(*) AS BIGINT) AS n_co
        |  FROM items a JOIN items b ON a.l_orderkey = b.l_orderkey
        |    AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2
        |),
        |top AS (
        |  SELECT * FROM co ORDER BY n_co DESC, part_a, part_b LIMIT 20
        |)
        |SELECT t.part_a, t.part_b, t.n_co,
        |  ia.n_item AS n_a, ib.n_item AS n_b, tot.n_orders,
        |  CAST(t.n_co AS DOUBLE) / tot.n_orders AS support,
        |  CAST(t.n_co AS DOUBLE) / ia.n_item AS confidence,
        |  CAST(CAST(t.n_co AS HUGEINT) * tot.n_orders AS DOUBLE)
        |    / CAST(CAST(ia.n_item AS HUGEINT) * ib.n_item AS DOUBLE)
        |    AS lift
        |FROM top t
        |JOIN ic ia ON ia.l_partkey = t.part_a
        |JOIN ic ib ON ib.l_partkey = t.part_b
        |CROSS JOIN tot
        |ORDER BY t.n_co DESC, t.part_a, t.part_b""".stripMargin,

    // w48: explicit year*12+month age arithmetic, ages zero-filled to
    // the global last month, cumulative revenue summed in DECIMAL and
    // cast to double once
    "w48_cohort_ltv" ->
      """WITH o AS (
        |  SELECT o_custkey, date_trunc('month', o_orderdate) AS m,
        |    CAST(o_totalprice AS DECIMAL(28,4)) AS p
        |  FROM orders
        |),
        |cohort AS (SELECT o_custkey, min(m) AS cm FROM o GROUP BY 1),
        |sizes AS (
        |  SELECT cm, CAST(count(*) AS BIGINT) AS cohort_size
        |  FROM cohort GROUP BY 1
        |),
        |gm AS (SELECT max(m) AS gmax FROM o),
        |cells AS (
        |  SELECT c.cm,
        |    CAST((year(o.m)*12 + month(o.m))
        |      - (year(c.cm)*12 + month(c.cm)) AS BIGINT) AS age,
        |    CAST(count(*) AS BIGINT) AS n_orders,
        |    CAST(count(DISTINCT o.o_custkey) AS BIGINT) AS n_active,
        |    sum(o.p) AS rev
        |  FROM o JOIN cohort c USING (o_custkey)
        |  GROUP BY 1, 2
        |),
        |spine AS (
        |  SELECT s.cm, s.cohort_size,
        |    CAST(unnest(generate_series(0,
        |      (year(gm.gmax)*12 + month(gm.gmax))
        |        - (year(s.cm)*12 + month(s.cm)))) AS BIGINT) AS age
        |  FROM sizes s CROSS JOIN gm
        |)
        |SELECT CAST(s.cm AS DATE) AS cohort_month, s.age AS age_months,
        |  COALESCE(c.n_orders, 0) AS n_orders,
        |  COALESCE(c.n_active, 0) AS n_active,
        |  CAST(COALESCE(c.rev, 0) AS DOUBLE) AS revenue,
        |  CAST(sum(COALESCE(c.rev, 0))
        |    OVER (PARTITION BY s.cm ORDER BY s.age) AS DOUBLE)
        |    AS cum_revenue,
        |  s.cohort_size,
        |  CAST(sum(COALESCE(c.rev, 0))
        |    OVER (PARTITION BY s.cm ORDER BY s.age) AS DOUBLE)
        |    / s.cohort_size AS ltv_per_customer
        |FROM spine s
        |LEFT JOIN cells c ON c.cm = s.cm AND c.age = s.age
        |ORDER BY cohort_month, age_months""".stripMargin,

    // w46: explicit epoch dow arithmetic (engine dayofweek conventions
    // disagree), full 7x24 spine per type, zero cells kept
    "w46_weekly_profile" ->
      """WITH ev AS (
        |  SELECT event_type,
        |    CAST((CAST(ts AS DATE) - DATE '1970-01-01' + 4) % 7
        |      AS BIGINT) AS dow,
        |    CAST(hour(ts) AS BIGINT) AS hour
        |  FROM events
        |),
        |counts AS (
        |  SELECT event_type, dow, hour, CAST(count(*) AS BIGINT) AS n
        |  FROM ev GROUP BY 1, 2, 3
        |),
        |spine AS (
        |  SELECT DISTINCT t.event_type,
        |    CAST(d.d AS BIGINT) AS dow, CAST(h.h AS BIGINT) AS hour
        |  FROM (SELECT DISTINCT event_type FROM ev) t
        |  CROSS JOIN (SELECT unnest(generate_series(0, 6)) AS d) d
        |  CROSS JOIN (SELECT unnest(generate_series(0, 23)) AS h) h
        |),
        |tot AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_type
        |  FROM ev GROUP BY 1
        |)
        |SELECT s.event_type, s.dow, s.hour,
        |  COALESCE(c.n, 0) AS n,
        |  CAST(COALESCE(c.n, 0) AS DOUBLE) / t.n_type AS share_of_type
        |FROM spine s
        |LEFT JOIN counts c ON c.event_type = s.event_type
        |  AND c.dow = s.dow AND c.hour = s.hour
        |JOIN tot t ON t.event_type = s.event_type
        |ORDER BY s.event_type, s.dow, s.hour""".stripMargin,

    // w45: rank-selected p05/p95 cuts (ceil(q*n), no interpolation),
    // decimal-exact sums, one IEEE division per mean
    "w45_winsorized_stats" ->
      """WITH ev AS (SELECT event_type, value FROM events),
        |st AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM ev GROUP BY 1
        |),
        |rk AS (
        |  SELECT event_type, value,
        |    row_number() OVER (PARTITION BY event_type ORDER BY value)
        |      AS r
        |  FROM ev
        |),
        |cuts AS (
        |  SELECT s.event_type, s.cnt,
        |    MAX(CASE WHEN r = CAST(ceil(cnt * 0.05) AS BIGINT)
        |        THEN value END) AS lo_cut,
        |    MAX(CASE WHEN r = CAST(ceil(cnt * 0.95) AS BIGINT)
        |        THEN value END) AS hi_cut
        |  FROM rk JOIN st s USING (event_type) GROUP BY 1, 2
        |)
        |SELECT e.event_type, c.cnt AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) / c.cnt
        |    AS mean,
        |  c.lo_cut, c.hi_cut,
        |  CAST(SUM(CAST(least(greatest(value, lo_cut), hi_cut)
        |    AS DECIMAL(28,6))) AS DOUBLE) / c.cnt AS winsorized_mean,
        |  CASE WHEN SUM(CASE WHEN value >= lo_cut AND value <= hi_cut
        |                THEN 1 ELSE 0 END) > 0 THEN
        |    CAST(SUM(CASE WHEN value >= lo_cut AND value <= hi_cut
        |      THEN CAST(value AS DECIMAL(28,6)) END) AS DOUBLE)
        |    / SUM(CASE WHEN value >= lo_cut AND value <= hi_cut
        |          THEN 1 ELSE 0 END) END AS trimmed_mean,
        |  CAST(c.cnt - SUM(CASE WHEN value >= lo_cut AND value <= hi_cut
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_trimmed
        |FROM ev e JOIN cuts c USING (event_type)
        |GROUP BY e.event_type, c.cnt, c.lo_cut, c.hi_cut
        |ORDER BY e.event_type""".stripMargin,

    // w37: w26's greedy stage chain collapsed to the one-row experiment
    // report
    "w37_ab_lift" ->
      """WITH u AS (
        |  SELECT user_id,
        |    min(CASE WHEN event_type = 'view' THEN ts END) AS t_view
        |  FROM events GROUP BY user_id
        |),
        |c AS (
        |  SELECT u.user_id, u.t_view,
        |    min(CASE WHEN e.ts > u.t_view THEN e.ts END) AS t_click
        |  FROM u LEFT JOIN events e
        |    ON e.user_id = u.user_id AND e.event_type = 'click'
        |  GROUP BY u.user_id, u.t_view
        |),
        |p AS (
        |  SELECT c.user_id, c.t_view, c.t_click,
        |    min(CASE WHEN e.ts > c.t_click THEN e.ts END) AS t_purchase
        |  FROM c LEFT JOIN events e
        |    ON e.user_id = c.user_id AND e.event_type = 'purchase'
        |  GROUP BY c.user_id, c.t_view, c.t_click
        |),
        |agg AS (
        |  SELECT
        |    CAST(count(*) FILTER (((user_id % 2) + 2) % 2 = 0 AND t_view IS NOT NULL)
        |      AS BIGINT) AS exposed_a,
        |    CAST(count(*) FILTER (((user_id % 2) + 2) % 2 = 0 AND t_purchase IS NOT
        |      NULL) AS BIGINT) AS converted_a,
        |    CAST(count(*) FILTER (((user_id % 2) + 2) % 2 = 1 AND t_view IS NOT NULL)
        |      AS BIGINT) AS exposed_b,
        |    CAST(count(*) FILTER (((user_id % 2) + 2) % 2 = 1 AND t_purchase IS NOT
        |      NULL) AS BIGINT) AS converted_b
        |  FROM p
        |)
        |SELECT *,
        |  CASE WHEN cvr_a > 0 THEN cvr_b / cvr_a END AS lift
        |FROM (
        |  SELECT *,
        |    CASE WHEN exposed_a > 0
        |         THEN CAST(converted_a AS DOUBLE) / exposed_a END AS cvr_a,
        |    CASE WHEN exposed_b > 0
        |         THEN CAST(converted_b AS DOUBLE) / exposed_b END AS cvr_b
        |  FROM agg
        |)""".stripMargin,

    // w44: the oracle states the semantics declaratively (purchase x
    // touch range join + row_number picks); the engine's single-window
    // struct-min/max form is plan-equivalent because (um, event_id) is
    // unique per touch
    "w44_attribution" ->
      """WITH e AS (
        |  SELECT event_id, epoch_us(ts) AS um, user_id, event_type
        |  FROM events
        |),
        |p AS (
        |  SELECT event_id AS pid, um, user_id FROM e
        |  WHERE event_type = 'purchase'
        |),
        |t AS (
        |  SELECT event_id AS tid, um, user_id, event_type AS ch FROM e
        |  WHERE event_type IN ('view', 'click')
        |),
        |tp AS (
        |  SELECT p.pid, t.ch, t.um, t.tid FROM p
        |  JOIN t ON t.user_id = p.user_id
        |   AND t.um >= p.um - 604800000000 AND t.um < p.um
        |),
        |fst AS (
        |  SELECT pid, ch FROM (
        |    SELECT pid, ch, row_number() OVER (PARTITION BY pid
        |      ORDER BY um ASC, tid ASC) AS rn FROM tp) WHERE rn = 1
        |),
        |lst AS (
        |  SELECT pid, ch FROM (
        |    SELECT pid, ch, row_number() OVER (PARTITION BY pid
        |      ORDER BY um DESC, tid DESC) AS rn FROM tp) WHERE rn = 1
        |),
        |att AS (
        |  SELECT 'first_touch' AS model, coalesce(f.ch, 'none') AS channel
        |  FROM p LEFT JOIN fst f ON f.pid = p.pid
        |  UNION ALL
        |  SELECT 'last_touch', coalesce(l.ch, 'none')
        |  FROM p LEFT JOIN lst l ON l.pid = p.pid
        |),
        |cnt AS (
        |  SELECT model, channel, CAST(count(*) AS BIGINT) AS n_conversions
        |  FROM att GROUP BY 1, 2
        |),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM p),
        |spine AS (
        |  SELECT m.model, c.channel FROM
        |    (SELECT unnest(['first_touch', 'last_touch']) AS model) m
        |  CROSS JOIN
        |    (SELECT unnest(['view', 'click', 'none']) AS channel) c
        |)
        |SELECT s.model, s.channel,
        |  coalesce(cn.n_conversions, 0) AS n_conversions,
        |  CAST(coalesce(cn.n_conversions, 0) AS DOUBLE) / tot.n AS share
        |FROM spine s
        |LEFT JOIN cnt cn ON cn.model = s.model AND cn.channel = s.channel
        |CROSS JOIN tot
        |ORDER BY s.model, s.channel""".stripMargin,

    // w43: zero-filled cells, two leads on one type-keyed window,
    // g04's exact-moment Pearson per (type, lag)
    "w43_autocorr" ->
      """WITH e AS (
        |  SELECT event_type, date_trunc('hour', ts) AS h FROM events
        |),
        |counts AS (
        |  SELECT event_type, h, count(*) AS x FROM e GROUP BY 1, 2
        |),
        |span AS (
        |  SELECT event_type, min(h) AS h0, max(h) AS h1
        |  FROM e GROUP BY event_type
        |),
        |spine AS (
        |  SELECT event_type,
        |    unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
        |  FROM span
        |),
        |cells AS (
        |  SELECT s.event_type, s.h, coalesce(c.x, 0) AS x
        |  FROM spine s LEFT JOIN counts c
        |    ON c.event_type = s.event_type AND c.h = s.h
        |),
        |lagged AS (
        |  SELECT event_type, x,
        |    lead(x, 1) OVER (PARTITION BY event_type ORDER BY h) AS y1,
        |    lead(x, 24) OVER (PARTITION BY event_type ORDER BY h) AS y24
        |  FROM cells
        |),
        |lf AS (
        |  SELECT event_type, CAST(1 AS BIGINT) AS lag, x, y1 AS y
        |  FROM lagged WHERE y1 IS NOT NULL
        |  UNION ALL
        |  SELECT event_type, CAST(24 AS BIGINT), x, y24
        |  FROM lagged WHERE y24 IS NOT NULL
        |),
        |m AS (
        |  SELECT event_type, lag, CAST(count(*) AS BIGINT) AS n_pairs,
        |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |    SUM(CAST(x AS HUGEINT) * y) AS sxy,
        |    SUM(CAST(x AS HUGEINT) * x) AS sxx,
        |    SUM(CAST(y AS HUGEINT) * y) AS syy
        |  FROM lf GROUP BY 1, 2
        |)
        |SELECT event_type, lag, n_pairs,
        |  CAST(sxy AS DOUBLE) AS sxy,
        |  CASE WHEN n_pairs * sxx - CAST(sx AS HUGEINT) * sx > 0
        |        AND n_pairs * syy - CAST(sy AS HUGEINT) * sy > 0
        |    THEN CAST(n_pairs * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE) /
        |      (sqrt(CAST(n_pairs * sxx - CAST(sx AS HUGEINT) * sx
        |         AS DOUBLE)) *
        |       sqrt(CAST(n_pairs * syy - CAST(sy AS HUGEINT) * sy
        |         AS DOUBLE)))
        |  END AS autocorr
        |FROM m ORDER BY event_type, lag""".stripMargin,

    // w42: zero-filled cells explode 24 dyadic-weight contributions;
    // exact integer numerator/denominator, one division each
    "w42_ewma" ->
      """WITH e AS (
        |  SELECT event_type, date_trunc('hour', ts) AS h FROM events
        |),
        |counts AS (
        |  SELECT event_type, h, count(*) AS x FROM e GROUP BY 1, 2
        |),
        |span AS (
        |  SELECT event_type, min(h) AS h0, max(h) AS h1
        |  FROM e GROUP BY event_type
        |),
        |spine AS (
        |  SELECT event_type,
        |    unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
        |  FROM span
        |),
        |cells AS (
        |  SELECT s.event_type, s.h, CAST(coalesce(c.x, 0) AS BIGINT) AS x
        |  FROM spine s LEFT JOIN counts c
        |    ON c.event_type = s.event_type AND c.h = s.h
        |),
        |contrib AS (
        |  SELECT c.event_type, c.h + t.k * (INTERVAL 1 HOUR) AS hour,
        |    CAST(c.x AS HUGEINT) * (CAST(1 AS BIGINT) << (23 - t.k)) AS wx,
        |    CAST(1 AS BIGINT) << (23 - t.k) AS w
        |  FROM cells c, unnest(generate_series(0, 23)) AS t(k)
        |)
        |SELECT cl.event_type, cl.h AS hour, cl.x AS n,
        |  CAST(SUM(co.wx) AS DOUBLE) / SUM(co.w) AS ewma,
        |  CASE WHEN SUM(co.wx) > 0
        |       THEN CAST(cl.x AS DOUBLE) * SUM(co.w) / SUM(co.wx)
        |  END AS surge_ratio
        |FROM contrib co JOIN cells cl
        |  ON cl.event_type = co.event_type AND cl.h = co.hour
        |GROUP BY cl.event_type, cl.h, cl.x
        |ORDER BY cl.event_type, hour""".stripMargin,

    // w41: two leads on the w28 order -> trigram counts -> top 10
    "w41_top_paths" ->
      """WITH tri AS (
        |  SELECT event_type AS step1,
        |    lead(event_type, 1) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS step2,
        |    lead(event_type, 2) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS step3
        |  FROM events
        |),
        |cnt AS (
        |  SELECT step1, step2, step3, CAST(count(*) AS BIGINT) AS n
        |  FROM tri WHERE step3 IS NOT NULL
        |  GROUP BY step1, step2, step3
        |),
        |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS n_total FROM cnt)
        |SELECT step1, step2, step3, n,
        |  CAST(n AS DOUBLE) / t.n_total AS share
        |FROM cnt CROSS JOIN tot t
        |ORDER BY n DESC, step1, step2, step3
        |LIMIT 10""".stripMargin,

    // w40: key counts -> top-10 by (n DESC, id ASC) -> scalar-total shares
    "w40_key_skew" ->
      """WITH counts AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY user_id
        |),
        |tot AS (
        |  SELECT CAST(SUM(n) AS BIGINT) AS n_rows,
        |         CAST(count(*) AS BIGINT) AS n_keys
        |  FROM counts
        |),
        |top AS (
        |  SELECT user_id, n, CAST(rank AS BIGINT) AS rank FROM (
        |    SELECT *, row_number() OVER (ORDER BY n DESC, user_id ASC)
        |      AS rank
        |    FROM counts)
        |  WHERE rank <= 10
        |)
        |SELECT t.rank, t.user_id, t.n,
        |  CAST(t.n AS DOUBLE) / tt.n_rows AS share,
        |  CAST(SUM(t.n) OVER (ORDER BY t.rank
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    / tt.n_rows AS cum_share,
        |  CAST(t.n * tt.n_keys AS DOUBLE) / tt.n_rows AS skew_ratio
        |FROM top t CROSS JOIN tot tt
        |ORDER BY t.rank""".stripMargin,

    // w39: w37's funnel chain -> per-arm latency -> w30's rank picks
    "w39_conversion_latency" ->
      """WITH u AS (
        |  SELECT user_id,
        |    min(CASE WHEN event_type = 'view' THEN ts END) AS t_view
        |  FROM events GROUP BY user_id
        |),
        |c AS (
        |  SELECT u.user_id, u.t_view,
        |    min(CASE WHEN e.ts > u.t_view THEN e.ts END) AS t_click
        |  FROM u LEFT JOIN events e
        |    ON e.user_id = u.user_id AND e.event_type = 'click'
        |  GROUP BY u.user_id, u.t_view
        |),
        |p AS (
        |  SELECT c.user_id, c.t_view, c.t_click,
        |    min(CASE WHEN e.ts > c.t_click THEN e.ts END) AS t_purchase
        |  FROM c LEFT JOIN events e
        |    ON e.user_id = c.user_id AND e.event_type = 'purchase'
        |  GROUP BY c.user_id, c.t_view, c.t_click
        |),
        |lat AS (
        |  SELECT
        |    CASE WHEN ((user_id % 2) + 2) % 2 = 0 THEN 'a' ELSE 'b' END
        |      AS arm,
        |    CAST(epoch_us(t_purchase) - epoch_us(t_view) AS DOUBLE)
        |      AS value
        |  FROM p WHERE t_purchase IS NOT NULL
        |),
        |n AS (SELECT arm, count(*) AS cnt FROM lat GROUP BY arm),
        |rk AS (
        |  SELECT arm, value,
        |    row_number() OVER (PARTITION BY arm ORDER BY value) AS rn
        |  FROM lat
        |)
        |SELECT rk.arm,
        |  CAST(max(CASE WHEN rn = CAST(ceil(cnt * 0.5) AS BIGINT)
        |       THEN value END) AS BIGINT) AS p50_us,
        |  CAST(max(CASE WHEN rn = CAST(ceil(cnt * 0.9) AS BIGINT)
        |       THEN value END) AS BIGINT) AS p90_us,
        |  CAST(max(CASE WHEN rn = CAST(ceil(cnt * 0.99) AS BIGINT)
        |       THEN value END) AS BIGINT) AS p99_us,
        |  n.cnt AS n_conversions
        |FROM rk JOIN n USING (arm)
        |GROUP BY rk.arm, n.cnt
        |ORDER BY rk.arm""".stripMargin,

    // w38: w36's flagged cells + gaps-and-islands run collapse
    "w38_anomaly_runs" ->
      """WITH e AS (
        |  SELECT event_type, date_trunc('hour', ts) AS h FROM events
        |),
        |counts AS (
        |  SELECT event_type, h, count(*) AS x FROM e GROUP BY 1, 2
        |),
        |span AS (
        |  SELECT event_type, min(h) AS h0, max(h) AS h1
        |  FROM e GROUP BY event_type
        |),
        |spine AS (
        |  SELECT event_type,
        |    unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
        |  FROM span
        |),
        |cells AS (
        |  SELECT s.event_type, s.h,
        |    CAST(date_part('hour', s.h) AS BIGINT) AS hod,
        |    CAST(coalesce(c.x, 0) AS BIGINT) AS x
        |  FROM spine s LEFT JOIN counts c
        |    ON c.event_type = s.event_type AND c.h = s.h
        |),
        |b AS (
        |  SELECT event_type, hod, CAST(SUM(x) AS BIGINT) AS hod_total,
        |    count(*) AS hod_slots
        |  FROM cells GROUP BY event_type, hod
        |),
        |flagged AS (
        |  SELECT c.event_type, c.h AS hour, c.x AS n,
        |    CAST(date_diff('hour', TIMESTAMP '1970-01-01 00:00:00', c.h)
        |      AS BIGINT)
        |      - row_number() OVER (PARTITION BY c.event_type ORDER BY c.h)
        |      AS island
        |  FROM cells c JOIN b
        |    ON b.event_type = c.event_type AND b.hod = c.hod
        |  WHERE c.x * b.hod_slots > 2 * b.hod_total
        |)
        |SELECT event_type, min(hour) AS run_start, max(hour) AS run_end,
        |  CAST(count(*) AS BIGINT) AS n_hours,
        |  CAST(max(n) AS BIGINT) AS peak_n
        |FROM flagged GROUP BY event_type, island
        |ORDER BY event_type, run_start""".stripMargin,

    // w36: the same spine + hour-of-day baseline, stated directly
    "w36_seasonal_baseline" ->
      """WITH e AS (
        |  SELECT event_type, date_trunc('hour', ts) AS h FROM events
        |),
        |counts AS (
        |  SELECT event_type, h, count(*) AS x FROM e GROUP BY 1, 2
        |),
        |span AS (
        |  SELECT event_type, min(h) AS h0, max(h) AS h1
        |  FROM e GROUP BY event_type
        |),
        |spine AS (
        |  SELECT event_type,
        |    unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
        |  FROM span
        |),
        |cells AS (
        |  SELECT s.event_type, s.h,
        |    CAST(date_part('hour', s.h) AS BIGINT) AS hod,
        |    CAST(coalesce(c.x, 0) AS BIGINT) AS x
        |  FROM spine s LEFT JOIN counts c
        |    ON c.event_type = s.event_type AND c.h = s.h
        |),
        |b AS (
        |  SELECT event_type, hod, CAST(SUM(x) AS BIGINT) AS hod_total,
        |    count(*) AS hod_slots
        |  FROM cells GROUP BY event_type, hod
        |)
        |SELECT c.event_type, c.h AS hour, c.hod, c.x AS n,
        |  CAST(b.hod_total AS DOUBLE) / b.hod_slots AS baseline,
        |  CAST(CASE WHEN c.x * b.hod_slots > 2 * b.hod_total
        |       THEN 1 ELSE 0 END AS BIGINT) AS is_spike
        |FROM cells c JOIN b
        |  ON b.event_type = c.event_type AND b.hod = c.hod
        |ORDER BY c.event_type, hour""".stripMargin,

    // w35: the same covering-explode statement of the sliding distinct
    "w35_rolling_active" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE)
        |    AS day
        |  FROM events
        |),
        |dau AS (SELECT day, count(*) AS dau FROM ud GROUP BY day),
        |cov AS (
        |  SELECT DISTINCT user_id, day + u.i AS day
        |  FROM ud, unnest([0, 1, 2, 3, 4, 5, 6]) AS u(i)
        |),
        |wau AS (SELECT day, count(*) AS wau7 FROM cov GROUP BY day),
        |b AS (SELECT min(day) AS d0, max(day) AS d1 FROM ud),
        |spine AS (
        |  SELECT CAST(unnest(generate_series(b.d0, b.d1,
        |    INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM b
        |)
        |SELECT s.day,
        |  COALESCE(d.dau, 0) AS dau,
        |  COALESCE(w.wau7, 0) AS wau7,
        |  CASE WHEN COALESCE(w.wau7, 0) > 0
        |       THEN CAST(COALESCE(d.dau, 0) AS DOUBLE) / w.wau7 END
        |    AS stickiness
        |FROM spine s LEFT JOIN dau d ON d.day = s.day
        |LEFT JOIN wau w ON w.day = s.day
        |ORDER BY s.day""".stripMargin,

    // w34: the w02 session CTE feeding the w26 greedy stage chain
    "w34_session_funnel" ->
      """WITH x AS (
        |  SELECT user_id, ts, event_id, event_type,
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
        |),
        |v AS (
        |  SELECT user_id, sess_id, min(ts) AS sess_start,
        |    min(CASE WHEN event_type = 'view' THEN ts END) AS t_view
        |  FROM y GROUP BY user_id, sess_id
        |),
        |c AS (
        |  SELECT v.user_id, v.sess_id, v.sess_start, v.t_view,
        |    min(CASE WHEN e.ts > v.t_view THEN e.ts END) AS t_click
        |  FROM v LEFT JOIN y e
        |    ON e.user_id = v.user_id AND e.sess_id = v.sess_id
        |    AND e.event_type = 'click'
        |  GROUP BY v.user_id, v.sess_id, v.sess_start, v.t_view
        |),
        |p AS (
        |  SELECT c.user_id, c.sess_id, c.sess_start, c.t_view, c.t_click,
        |    min(CASE WHEN e.ts > c.t_click THEN e.ts END) AS t_purchase
        |  FROM c LEFT JOIN y e
        |    ON e.user_id = c.user_id AND e.sess_id = c.sess_id
        |    AND e.event_type = 'purchase'
        |  GROUP BY c.user_id, c.sess_id, c.sess_start, c.t_view, c.t_click
        |)
        |SELECT user_id, sess_id, sess_start, t_view, t_click, t_purchase,
        |  CAST(CASE WHEN t_view IS NULL THEN 0
        |            WHEN t_click IS NULL THEN 1
        |            WHEN t_purchase IS NULL THEN 2
        |            ELSE 3 END AS BIGINT) AS stage_reached,
        |  CASE WHEN t_purchase IS NOT NULL
        |       THEN epoch_us(t_purchase) - epoch_us(t_view) END AS funnel_us
        |FROM p ORDER BY user_id, sess_id""".stripMargin,

    // w33: boundary rows by row_number in both directions, then one agg
    "w33_ohlc_bars" ->
      """WITH e AS (
        |  SELECT event_type, date_trunc('hour', ts) AS hour, ts, event_id,
        |         value
        |  FROM events
        |),
        |r AS (
        |  SELECT *,
        |    row_number() OVER (PARTITION BY event_type, hour
        |      ORDER BY ts ASC, event_id ASC) AS rn_a,
        |    row_number() OVER (PARTITION BY event_type, hour
        |      ORDER BY ts DESC, event_id DESC) AS rn_z
        |  FROM e
        |)
        |SELECT event_type, hour, count(*) AS n_events,
        |  MAX(CASE WHEN rn_a = 1 THEN value END) AS open_v,
        |  max(value) AS high_v, min(value) AS low_v,
        |  MAX(CASE WHEN rn_z = 1 THEN value END) AS close_v,
        |  CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
        |FROM r GROUP BY event_type, hour
        |ORDER BY event_type, hour""".stripMargin,

    // w32: the same spine + lag statement
    "w32_top_movers" ->
      """WITH e AS (
        |  SELECT event_type, date_trunc('week', ts) AS wk FROM events
        |),
        |counts AS (
        |  SELECT event_type, wk, count(*) AS x FROM e GROUP BY 1, 2
        |),
        |span AS (
        |  SELECT event_type, min(wk) AS w0, max(wk) AS w1
        |  FROM e GROUP BY event_type
        |),
        |spine AS (
        |  SELECT event_type,
        |    unnest(generate_series(CAST(w0 AS TIMESTAMP),
        |      CAST(w1 AS TIMESTAMP), INTERVAL 1 WEEK)) AS wk
        |  FROM span
        |),
        |cells AS (
        |  SELECT s.event_type, s.wk, coalesce(c.x, 0) AS n
        |  FROM spine s LEFT JOIN counts c
        |    ON c.event_type = s.event_type AND c.wk = s.wk
        |),
        |lagged AS (
        |  SELECT event_type, wk, n,
        |    lag(n) OVER (PARTITION BY event_type ORDER BY wk) AS prev_n
        |  FROM cells
        |)
        |SELECT event_type, CAST(wk AS DATE) AS week, n, prev_n,
        |  n - prev_n AS delta,
        |  CASE WHEN prev_n > 0
        |       THEN CAST(n - prev_n AS DOUBLE) / prev_n END AS growth
        |FROM lagged WHERE prev_n IS NOT NULL
        |ORDER BY event_type, week""".stripMargin,

    // w31: the same scaled-integer CUSUM declaratively
    "w31_changepoint" ->
      """WITH e AS (
        |  SELECT event_type, date_trunc('hour', ts) AS h FROM events
        |),
        |counts AS (
        |  SELECT event_type, h, count(*) AS x FROM e GROUP BY 1, 2
        |),
        |span AS (
        |  SELECT event_type, min(h) AS h0, max(h) AS h1
        |  FROM e GROUP BY event_type
        |),
        |spine AS (
        |  SELECT event_type,
        |    unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
        |  FROM span
        |),
        |cells AS (
        |  SELECT s.event_type, s.h, coalesce(c.x, 0) AS x
        |  FROM spine s LEFT JOIN counts c
        |    ON c.event_type = s.event_type AND c.h = s.h
        |),
        |tot AS (
        |  SELECT event_type, count(*) AS n_hours,
        |    CAST(SUM(x) AS BIGINT) AS total
        |  FROM cells GROUP BY event_type
        |),
        |cum AS (
        |  SELECT c.event_type, c.h, t.n_hours, t.total,
        |    SUM(CAST(c.x AS HUGEINT) * t.n_hours - t.total) OVER (
        |      PARTITION BY c.event_type ORDER BY c.h
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
        |  FROM cells c JOIN tot t ON t.event_type = c.event_type
        |)
        |SELECT event_type, n_hours, total, h AS cp_hour,
        |  CAST(abs(s) AS DOUBLE) AS cp_score,
        |  CAST(CASE WHEN s > 0 THEN 1 WHEN s < 0 THEN -1 ELSE 0 END
        |    AS BIGINT) AS direction
        |FROM (
        |  SELECT *, row_number() OVER (PARTITION BY event_type
        |    ORDER BY abs(s) DESC, h ASC) AS rk FROM cum)
        |WHERE rk = 1 ORDER BY event_type""".stripMargin,

    // w30: the same gaps + percentile_disc ranks declaratively
    "w30_gap_quantiles" ->
      """WITH rawgaps AS (
        |  SELECT event_type,
        |    CAST(epoch_us(ts) - epoch_us(lag(ts) OVER (
        |      PARTITION BY user_id, event_type
        |      ORDER BY ts, event_id)) AS DOUBLE) AS gv
        |  FROM events
        |),
        |gaps AS (
        |  SELECT event_type, gv AS value FROM rawgaps WHERE gv IS NOT NULL
        |),
        |n AS (SELECT event_type, count(*) AS cnt FROM gaps
        |      GROUP BY event_type),
        |rk AS (
        |  SELECT event_type, value,
        |    row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn
        |  FROM gaps
        |)
        |SELECT rk.event_type,
        |  CAST(max(CASE WHEN rn = CAST(ceil(cnt * 0.5) AS BIGINT)
        |       THEN value END) AS BIGINT) AS p50_us,
        |  CAST(max(CASE WHEN rn = CAST(ceil(cnt * 0.9) AS BIGINT)
        |       THEN value END) AS BIGINT) AS p90_us,
        |  CAST(max(CASE WHEN rn = CAST(ceil(cnt * 0.99) AS BIGINT)
        |       THEN value END) AS BIGINT) AS p99_us,
        |  n.cnt AS n_gaps
        |FROM rk JOIN n USING (event_type)
        |GROUP BY rk.event_type, n.cnt
        |ORDER BY rk.event_type""".stripMargin,

    // w28: the same lead + two-agg statement
    "w28_transition_matrix" ->
      """WITH steps AS (
        |  SELECT event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS to_type
        |  FROM events
        |),
        |cells AS (
        |  SELECT from_type, to_type, count(*) AS n
        |  FROM steps WHERE to_type IS NOT NULL
        |  GROUP BY from_type, to_type
        |),
        |tot AS (
        |  SELECT from_type, CAST(SUM(n) AS BIGINT) AS n_from
        |  FROM cells GROUP BY from_type
        |)
        |SELECT c.from_type, c.to_type, c.n, t.n_from,
        |  CAST(c.n AS DOUBLE) / t.n_from AS p
        |FROM cells c JOIN tot t ON t.from_type = c.from_type
        |ORDER BY c.from_type, c.to_type""".stripMargin,

    // w53: exact-integer TVD per QI group vs the global sensitive
    // distribution over the FULL type roster; flag = the t = 0.2 cross
    // multiplication (the d27 discipline — no per-term float sums).
    // Products/sum in HUGEINT mirroring Spark's DECIMAL(38,0) widen;
    // tvd_num published as DOUBLE on both engines (exact below 2^53 —
    // published DECIMAL fails the driver's row hash, VERDICT r14).
    // w54: disorder audit — the oracle states the ONE declarative
    // exclusive running-max window the engine computes in two phases;
    // epoch_us/unix_micros exact in both engines (the w30 convention)
    "w54_out_of_order" ->
      """WITH s AS (
        |  SELECT 'events' AS stream, 'event_id' AS seq_column,
        |    'ts' AS ts_column, CAST(event_id AS BIGINT) AS seq,
        |    epoch_us(ts) AS tus
        |  FROM events
        |  UNION ALL
        |  SELECT 'orders', 'o_orderkey', 'o_orderdate',
        |    CAST(o_orderkey AS BIGINT), epoch_us(o_orderdate)
        |  FROM orders
        |),
        |o AS (
        |  SELECT stream, seq_column, ts_column, tus,
        |    max(tus) OVER (PARTITION BY stream ORDER BY seq
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS prev_max
        |  FROM s
        |)
        |SELECT stream, seq_column, ts_column,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(SUM(CASE WHEN prev_max > tus THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_late,
        |  CAST(SUM(CASE WHEN prev_max > tus THEN 1 ELSE 0 END)
        |    AS DOUBLE) / count(*) AS late_share,
        |  CAST(COALESCE(MAX(CASE WHEN prev_max > tus
        |    THEN prev_max - tus END), 0) AS BIGINT) AS max_late_us
        |FROM o
        |GROUP BY 1, 2, 3
        |ORDER BY stream""".stripMargin,

    "w53_t_closeness" ->
      """WITH ev AS (
        |  SELECT event_type,
        |    CAST(hour(ts) AS BIGINT) AS hr,
        |    CAST(floor(value / 10.0) AS BIGINT) AS vb
        |  FROM events
        |),
        |cell AS (
        |  SELECT hr, vb, event_type, CAST(count(*) AS BIGINT) AS n_gt
        |  FROM ev GROUP BY 1, 2, 3
        |),
        |roster AS (
        |  SELECT event_type, CAST(SUM(n_gt) AS BIGINT) AS n_t
        |  FROM cell GROUP BY event_type
        |),
        |grp AS (
        |  SELECT hr, vb, CAST(SUM(n_gt) AS BIGINT) AS n_g,
        |    CAST(count(*) AS BIGINT) AS n_types
        |  FROM cell GROUP BY 1, 2
        |),
        |tot AS (SELECT CAST(SUM(n_t) AS BIGINT) AS n_total FROM roster),
        |folded AS (
        |  SELECT g.hr, g.vb, g.n_g, g.n_types, t.n_total,
        |    SUM(abs(CAST(COALESCE(c.n_gt, 0) AS HUGEINT) * t.n_total
        |      - CAST(gl.n_t AS HUGEINT) * g.n_g)) AS tvd_num
        |  FROM grp g
        |  CROSS JOIN roster gl
        |  CROSS JOIN tot t
        |  LEFT JOIN cell c ON c.hr = g.hr AND c.vb = g.vb
        |    AND c.event_type = gl.event_type
        |  GROUP BY 1, 2, 3, 4, 5
        |)
        |SELECT hr, vb, n_g AS n_events, n_types,
        |  CAST(tvd_num AS DOUBLE) AS tvd_num,
        |  CAST(tvd_num AS DOUBLE)
        |    / CAST(2 * CAST(n_g AS HUGEINT) * n_total AS DOUBLE) AS tvd,
        |  CAST(CASE WHEN 5 * tvd_num >= 2 * CAST(n_g AS HUGEINT) * n_total
        |    THEN 1 ELSE 0 END AS BIGINT) AS t_fail
        |FROM folded
        |ORDER BY hr, vb""".stripMargin,

    // w27: the same cohort triangle stated declaratively
    // w52: distinct-l-diversity cut at l = 3 over (hr, vb) QI groups
    // with event_type sensitive; homogeneous = the n_sens = 1 attack
    "w52_l_diversity" ->
      """WITH ev AS (
        |  SELECT event_type, user_id,
        |    CAST(hour(ts) AS BIGINT) AS hr,
        |    CAST(floor(value / 10.0) AS BIGINT) AS vb
        |  FROM events
        |),
        |grp AS (
        |  SELECT hr, vb,
        |    CAST(count(DISTINCT event_type) AS BIGINT) AS n_sens,
        |    CAST(count(*) AS BIGINT) AS n_events
        |  FROM ev GROUP BY 1, 2
        |),
        |weaku AS (
        |  SELECT e.hr,
        |    CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users_weak
        |  FROM ev e
        |  JOIN grp g ON g.hr = e.hr AND g.vb = e.vb
        |  WHERE g.n_sens < 3
        |  GROUP BY e.hr
        |)
        |SELECT g.hr,
        |  CAST(count(*) AS BIGINT) AS n_groups,
        |  CAST(sum(CASE WHEN g.n_sens = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_homogeneous,
        |  CAST(sum(CASE WHEN g.n_sens < 3 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_weak_groups,
        |  CAST(sum(g.n_events) AS BIGINT) AS n_events,
        |  CAST(sum(CASE WHEN g.n_sens < 3 THEN g.n_events ELSE 0 END)
        |    AS BIGINT) AS n_events_weak,
        |  COALESCE(any_value(w.n_users_weak), 0) AS n_users_weak,
        |  CAST(sum(CASE WHEN g.n_sens < 3 THEN g.n_events ELSE 0 END)
        |    AS DOUBLE) / sum(g.n_events) AS weak_share
        |FROM grp g LEFT JOIN weaku w ON w.hr = g.hr
        |GROUP BY g.hr ORDER BY g.hr""".stripMargin,
    // w51: quasi-identifier groups, k = 5 risk cut, exposure rollup
    "w51_k_anonymity" ->
      """WITH ev AS (
        |  SELECT event_type, user_id,
        |    CAST(hour(ts) AS BIGINT) AS hr,
        |    CAST(floor(value / 10.0) AS BIGINT) AS vb
        |  FROM events
        |),
        |grp AS (
        |  SELECT event_type, hr, vb,
        |    CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        |    CAST(count(*) AS BIGINT) AS n_events
        |  FROM ev GROUP BY 1, 2, 3
        |),
        |exposed AS (
        |  SELECT e.event_type,
        |    CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users_exposed
        |  FROM ev e
        |  JOIN grp g ON g.event_type = e.event_type AND g.hr = e.hr
        |    AND g.vb = e.vb
        |  WHERE g.n_users < 5
        |  GROUP BY e.event_type
        |)
        |SELECT g.event_type,
        |  CAST(count(*) AS BIGINT) AS n_groups,
        |  CAST(sum(CASE WHEN g.n_users < 5 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_risky_groups,
        |  CAST(sum(g.n_events) AS BIGINT) AS n_events,
        |  CAST(sum(CASE WHEN g.n_users < 5 THEN g.n_events ELSE 0 END)
        |    AS BIGINT) AS n_events_exposed,
        |  COALESCE(any_value(x.n_users_exposed), 0) AS n_users_exposed,
        |  CAST(sum(CASE WHEN g.n_users < 5 THEN g.n_events ELSE 0 END)
        |    AS DOUBLE) / sum(g.n_events) AS exposed_share
        |FROM grp g LEFT JOIN exposed x ON x.event_type = g.event_type
        |GROUP BY g.event_type ORDER BY g.event_type""".stripMargin,
    // w50: lifetime histogram + suffix-sum risk set; hazard the one
    // division of exact longs
    "w50_churn_hazard" ->
      """WITH life AS (
        |  SELECT user_id,
        |    CAST(date_diff('day', min(CAST(ts AS DATE)),
        |      max(CAST(ts AS DATE))) AS BIGINT) AS lifetime
        |  FROM events GROUP BY user_id
        |),
        |hist AS (
        |  SELECT lifetime, CAST(count(*) AS BIGINT) AS n_churned
        |  FROM life GROUP BY lifetime
        |)
        |SELECT lifetime AS t_days,
        |  CAST(SUM(n_churned) OVER (ORDER BY lifetime
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        |    AS BIGINT) AS n_at_risk,
        |  n_churned,
        |  CAST(n_churned AS DOUBLE) / SUM(n_churned) OVER (
        |    ORDER BY lifetime
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS hazard
        |FROM hist ORDER BY t_days""".stripMargin,
    "w27_retention_cohorts" ->
      """WITH e AS (
        |  SELECT user_id, date_trunc('week', ts) AS wk FROM events
        |),
        |firsts AS (
        |  SELECT user_id, min(wk) AS cohort_week FROM e GROUP BY user_id
        |),
        |activity AS (SELECT DISTINCT user_id, wk FROM e),
        |cells AS (
        |  SELECT f.cohort_week,
        |    CAST(date_diff('day', f.cohort_week, a.wk) // 7 AS BIGINT)
        |      AS weeks_since,
        |    count(*) AS n_active
        |  FROM activity a JOIN firsts f USING (user_id)
        |  GROUP BY 1, 2
        |),
        |sizes AS (SELECT cohort_week, n_active AS cohort_size
        |          FROM cells WHERE weeks_since = 0)
        |SELECT c.cohort_week, c.weeks_since, c.n_active, s.cohort_size,
        |  CAST(c.n_active AS DOUBLE) / s.cohort_size AS retention_rate
        |FROM cells c JOIN sizes s USING (cohort_week)
        |ORDER BY c.cohort_week, c.weeks_since""".stripMargin,

    // w26: the same greedy-earliest witness chain as CTEs
    "w26_funnel" ->
      """WITH u AS (
        |  SELECT user_id,
        |    min(CASE WHEN event_type = 'view' THEN ts END) AS t_view
        |  FROM events GROUP BY user_id
        |),
        |c AS (
        |  SELECT u.user_id, u.t_view,
        |    min(CASE WHEN e.ts > u.t_view THEN e.ts END) AS t_click
        |  FROM u LEFT JOIN events e
        |    ON e.user_id = u.user_id AND e.event_type = 'click'
        |  GROUP BY u.user_id, u.t_view
        |),
        |p AS (
        |  SELECT c.user_id, c.t_view, c.t_click,
        |    min(CASE WHEN e.ts > c.t_click THEN e.ts END) AS t_purchase
        |  FROM c LEFT JOIN events e
        |    ON e.user_id = c.user_id AND e.event_type = 'purchase'
        |  GROUP BY c.user_id, c.t_view, c.t_click
        |)
        |SELECT user_id, t_view, t_click, t_purchase,
        |  CAST(CASE WHEN t_view IS NULL THEN 0
        |            WHEN t_click IS NULL THEN 1
        |            WHEN t_purchase IS NULL THEN 2
        |            ELSE 3 END AS BIGINT) AS stage_reached,
        |  CASE WHEN t_purchase IS NOT NULL
        |       THEN epoch_us(t_purchase) - epoch_us(t_view) END AS funnel_us
        |FROM p ORDER BY user_id""".stripMargin,

    // w25: same spine + LOCF stated declaratively; value is a pure
    // pass-through double so the fill is bit-identical
    "w25_gapfill" ->
      """WITH e AS (
        |  SELECT user_id, date_trunc('hour', ts) AS h, ts, event_id, value
        |  FROM events
        |),
        |obs AS (
        |  SELECT user_id, h, value AS obs_value, n FROM (
        |    SELECT user_id, h, value,
        |      row_number() OVER (PARTITION BY user_id, h
        |        ORDER BY ts DESC, event_id DESC) AS rn,
        |      count(*) OVER (PARTITION BY user_id, h) AS n
        |    FROM e)
        |  WHERE rn = 1
        |),
        |span AS (SELECT user_id, min(h) AS h0, max(h) AS h1
        |         FROM e GROUP BY user_id),
        |spine AS (
        |  SELECT user_id,
        |    unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
        |  FROM span
        |)
        |SELECT s.user_id, s.hour,
        |  coalesce(o.n, 0) AS n_events,
        |  last_value(o.obs_value IGNORE NULLS) OVER (
        |    PARTITION BY s.user_id ORDER BY s.hour
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value,
        |  CASE WHEN o.h IS NULL THEN CAST(1 AS BIGINT)
        |       ELSE CAST(0 AS BIGINT) END AS is_gap
        |FROM spine s
        |LEFT JOIN obs o ON o.user_id = s.user_id AND o.h = s.hour
        |ORDER BY s.user_id, s.hour""".stripMargin,

    // w24: the declarative half-open-interval statement of the window
    // consume; empty intervals (same-date versions) are skipped by both
    "w24_scd2_asof" ->
      """WITH dim AS (
        |  SELECT o_custkey AS custkey, o_orderpriority AS priority,
        |    o_orderdate AS valid_from, lead(o_orderdate) OVER w AS valid_to,
        |    CAST(row_number() OVER w AS BIGINT) AS version_no
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey
        |               ORDER BY o_orderdate, o_orderkey)
        |),
        |f AS (
        |  SELECT l_orderkey, l_linenumber, o_custkey AS custkey, l_shipdate
        |  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        |)
        |SELECT f.l_orderkey, f.l_linenumber, f.custkey, f.l_shipdate,
        |       d.priority AS priority_at_ship, d.version_no
        |FROM f JOIN dim d ON d.custkey = f.custkey
        |  AND f.l_shipdate >= d.valid_from
        |  AND (d.valid_to IS NULL OR f.l_shipdate < d.valid_to)
        |ORDER BY f.l_orderkey, f.l_linenumber, f.l_shipdate""".stripMargin,

    "w21_scd2_build" ->
      """SELECT o_custkey AS custkey, o_orderpriority AS priority,
        |  o_orderdate AS valid_from,
        |  lead(o_orderdate) OVER w AS valid_to,
        |  CAST(row_number() OVER w AS BIGINT) AS version_no,
        |  CAST(CASE WHEN lead(o_orderdate) OVER w IS NULL
        |       THEN 1 ELSE 0 END AS BIGINT) AS is_current
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |             ORDER BY o_orderdate, o_orderkey)
        |ORDER BY custkey, version_no""".stripMargin,

    "w20_zorder_stats" ->
      s"""WITH ev AS (
         |  SELECT user_id AS u, epoch_us(ts) // 3600000000 AS h FROM events
         |),
         |st AS (
         |  SELECT min(u) AS min_u, max(u) AS max_u,
         |         min(h) AS min_h, max(h) AS max_h
         |  FROM ev
         |),
         |scaled AS (
         |  SELECT u, h,
         |    (u - min_u) * 65535 // greatest(max_u - min_u, 1) AS a,
         |    (h - min_h) * 65535 // greatest(max_h - min_h, 1) AS b
         |  FROM ev, st
         |),
         |z AS (SELECT u, h, ($zSqlExpr) AS z FROM scaled)
         |SELECT z // 67108864 AS z_bucket, CAST(count(*) AS BIGINT) AS n,
         |  min(u) AS min_user, max(u) AS max_user,
         |  min(h) AS min_hour, max(h) AS max_hour
         |FROM z GROUP BY 1 ORDER BY z_bucket""".stripMargin,

    "w19_interval_overlap" ->
      """WITH x AS (
        |  SELECT user_id, ts, event_id,
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
        |),
        |s AS (
        |  SELECT user_id, sess_id,
        |    min(epoch_us(ts)) AS s_start, max(epoch_us(ts)) AS s_end
        |  FROM y GROUP BY user_id, sess_id
        |),
        |b AS (
        |  SELECT epoch_us(ts) // 3600000000 AS h, count(*) AS cnt
        |  FROM events GROUP BY 1
        |),
        |t AS (
        |  SELECT CAST(SUM(cnt) AS BIGINT) AS total, count(*) AS n_buckets
        |  FROM b
        |),
        |sp AS (
        |  SELECT h, cnt AS n_spike_events FROM b, t
        |  WHERE cnt * n_buckets * 10 > total * 11
        |),
        |bin AS (
        |  SELECT user_id, sess_id, s_start, s_end,
        |    unnest(generate_series(s_start // 3600000000,
        |                           s_end // 3600000000)) AS h
        |  FROM s
        |)
        |SELECT bin.user_id, bin.sess_id, bin.s_start, bin.s_end,
        |  CAST(sp.h * 3600000000 AS BIGINT) AS spike_start_us,
        |  CAST(sp.n_spike_events AS BIGINT) AS n_spike_events,
        |  CAST(least(bin.s_end, sp.h * 3600000000 + 3599999999) -
        |       greatest(bin.s_start, sp.h * 3600000000) AS BIGINT)
        |    AS overlap_us
        |FROM bin JOIN sp ON bin.h = sp.h
        |ORDER BY user_id, sess_id, spike_start_us""".stripMargin,

    "w18_set_ops_all" ->
      """WITH a AS (
        |  SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 150000
        |),
        |b AS (
        |  SELECT o_custkey AS custkey FROM orders
        |  WHERE o_orderpriority = '1-URGENT'
        |)
        |SELECT 'except_all' AS op, custkey FROM (
        |  SELECT custkey FROM a EXCEPT ALL SELECT custkey FROM b)
        |UNION ALL
        |SELECT 'intersect_all' AS op, custkey FROM (
        |  SELECT custkey FROM a INTERSECT ALL SELECT custkey FROM b)
        |ORDER BY op, custkey""".stripMargin,

    "w17_running_distinct" ->
      """WITH f AS (
        |  SELECT event_id, user_id, ts, event_type,
        |    CASE WHEN row_number() OVER (
        |        PARTITION BY user_id, event_type ORDER BY ts, event_id) = 1
        |      THEN 1 ELSE 0 END AS first_seen
        |  FROM events
        |)
        |SELECT event_id, user_id, ts, event_type,
        |  CAST(SUM(first_seen) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_distinct_types
        |FROM f ORDER BY event_id""".stripMargin,

    "w16_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority,
        |       CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_st,
        |       CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_pr,
        |       count(*) AS n,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE)
        |         AS sum_price
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
        |                        (o_orderpriority), ())
        |ORDER BY g_st, g_pr, o_orderstatus, o_orderpriority""".stripMargin,

    "w15_unpivot" ->
      """SELECT user_id, event_type, count(*) AS n
        |FROM events GROUP BY user_id, event_type
        |ORDER BY user_id, event_type""".stripMargin,

    "w14_full_outer" ->
      """WITH c AS (
        |  SELECT date_trunc('hour', ts) AS hour, count(*) AS n_clicks
        |  FROM events WHERE event_type = 'click' GROUP BY 1
        |),
        |e AS (
        |  SELECT date_trunc('hour', ts) AS hour, count(*) AS n_errors
        |  FROM events WHERE event_type = 'error' GROUP BY 1
        |)
        |SELECT COALESCE(c.hour, e.hour) AS hour, c.n_clicks, e.n_errors
        |FROM c FULL OUTER JOIN e ON e.hour = c.hour
        |ORDER BY hour""".stripMargin,

    "w13_window_suite" ->
      """SELECT event_id, user_id, ts,
        |  CAST(row_number() OVER w AS BIGINT) AS seq,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |  percent_rank() OVER w AS pct_rank,
        |  cume_dist() OVER w AS cume,
        |  epoch_us(ts) - epoch_us(lag(ts) OVER w) AS gap_us
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY event_id""".stripMargin,

    "w10_cube" ->
      """SELECT o_orderstatus, o_orderpriority,
        |       CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_st,
        |       CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_pr,
        |       count(*) AS n,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE)
        |         AS sum_price
        |FROM orders
        |GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY g_st, g_pr, o_orderstatus, o_orderpriority""".stripMargin,

    "w11_pivot" ->
      """SELECT user_id,
        |  count(*) FILTER (event_type = 'click') AS n_click,
        |  count(*) FILTER (event_type = 'error') AS n_error,
        |  count(*) FILTER (event_type = 'purchase') AS n_purchase,
        |  count(*) FILTER (event_type = 'signup') AS n_signup,
        |  count(*) FILTER (event_type = 'view') AS n_view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "w12_range_join" ->
      """SELECT c.event_id, c.user_id, c.ts, count(*) AS n_errors,
        |       CAST(SUM(CAST(e.value AS DECIMAL(28,6))) AS DOUBLE)
        |         AS sum_error_value
        |FROM events c
        |JOIN events e ON e.user_id = c.user_id
        |  AND e.event_type = 'error'
        |  AND epoch_us(e.ts) >= epoch_us(c.ts)
        |  AND epoch_us(e.ts) < epoch_us(c.ts) + 3600000000
        |WHERE c.event_type = 'click'
        |GROUP BY c.event_id, c.user_id, c.ts
        |ORDER BY c.event_id""".stripMargin,

    // w06: the exact side is plain SQL; the estimate enters only
    // through the in-band flag, which the oracle states as the
    // constant 1 — an out-of-band HLL estimate hash-mismatches
    "w06_approx_distinct" ->
      """SELECT event_type,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(1 AS BIGINT) AS hll_within_5pct
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

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

    // w23: both medians stated with windows (the oracle may single-task
    // per group; the engine runs the two-phase histogram twice)
    "w23_mad" ->
      s"""$madSqlCtes
        |SELECT m.event_type, m.median_value, mad.dv AS mad, n.cnt AS n
        |FROM med m JOIN mad USING (event_type) JOIN n USING (event_type)
        |ORDER BY m.event_type""".stripMargin,

    // w29: the same baseline joined back onto the stream
    "w29_robust_outliers" ->
      s"""$madSqlCtes,
        |base AS (
        |  SELECT m.event_type, m.median_value, mad.dv AS mad
        |  FROM med m JOIN mad USING (event_type)
        |)
        |SELECT e.event_id, e.event_type, e.value,
        |  b.median_value, b.mad,
        |  CASE WHEN b.mad > 0
        |       THEN abs(e.value - b.median_value) / b.mad END
        |    AS robust_score,
        |  CAST(CASE WHEN abs(e.value - b.median_value) > b.mad * 3
        |       THEN 1 ELSE 0 END AS BIGINT) AS is_outlier
        |FROM events e JOIN base b USING (event_type)
        |ORDER BY e.event_id""".stripMargin,

    // the all-pairs declarative statement of w22: per event, rank all
    // same-user orders by |time distance|, earlier date then smaller
    // key on ties — the engine's two window passes must agree exactly
    "w22_nearest_join" ->
      """WITH c AS (
        |  SELECT e.event_id, e.user_id, e.ts, o.o_orderkey,
        |    CAST(o.o_orderdate AS TIMESTAMP) AS odate,
        |    abs(epoch_us(e.ts)
        |        - epoch_us(CAST(o.o_orderdate AS TIMESTAMP))) AS dist,
        |    row_number() OVER (PARTITION BY e.event_id
        |      ORDER BY abs(epoch_us(e.ts)
        |                   - epoch_us(CAST(o.o_orderdate AS TIMESTAMP))),
        |               o.o_orderdate, o.o_orderkey) AS rn
        |  FROM events e JOIN orders o ON o.o_custkey = e.user_id
        |)
        |SELECT e.event_id, e.user_id, e.ts,
        |  c.o_orderkey AS nearest_orderkey, c.odate AS nearest_orderdate,
        |  CAST(c.dist AS BIGINT) AS dist_us
        |FROM events e LEFT JOIN (SELECT * FROM c WHERE rn = 1) c
        |  USING (event_id)
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
