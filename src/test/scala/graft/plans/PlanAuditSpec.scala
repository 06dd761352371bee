package graft.plans

import graft.{PlanAudit, SparkEntry, SparkTestBase}

/** CI gate for the full-inventory plan audit (VERDICT r3 item 2): every
  * registered query's physical plan is swept for scale traps, and the
  * flag map must equal the allowlist below EXACTLY. A new
  * CartesianProduct / BroadcastNestedLoopJoin / repeated
  * SinglePartition in ANY query fails `sbt test`; a flag that
  * disappears fails too, so the allowlist can never go stale.
  *
  * Every allowlisted flag is intentional and plan-documented (NOTES.md
  * "Plan audit"): 1-row scalar broadcasts (the BNLJ is the 1-row cross
  * join), broadcast query-set top-k scans (BNLJ = corpus x broadcast
  * queries — the intended no-big-side-shuffle KNN plan), and windows /
  * unions over tiny aggregated frames plus the final presentation sort
  * (multi-SinglePartition).
  */
class PlanAuditSpec extends SparkTestBase {

  private val allow: Map[String, Set[String]] = Map(
    // 1-row scalar broadcasts
    "p07_domain_mix" -> Set("BroadcastNestedLoopJoin"),
    "p10_epoch_plan" -> Set("BroadcastNestedLoopJoin"),
    "q05_gold_alerts" -> Set("BroadcastNestedLoopJoin"),
    "q20_global_filter_anti" -> Set("BroadcastNestedLoopJoin"),
    "t05_tfidf" -> Set("BroadcastNestedLoopJoin"),
    // t05's scalar pattern: 1-row corpus-total broadcast cross join
    "t08_unigram_surprisal" -> Set("BroadcastNestedLoopJoin"),
    // 1-row bucket-totals broadcast gating the spike filter; the overlap
    // join itself is equality on the hour bin
    "w19_interval_overlap" -> Set("BroadcastNestedLoopJoin"),
    // 1-row dim-bounds broadcast feeding the min-max scaling
    "w20_zorder_stats" -> Set("BroadcastNestedLoopJoin"),
    // broadcast query-set / codebook top-k scans
    "s01_knn_bruteforce" -> Set("BroadcastNestedLoopJoin"),
    // recall audit: contains s01's exact side (the same broadcast
    // query-set scan) by construction
    "s17_recall_report" -> Set("BroadcastNestedLoopJoin"),
    "s04_knn_topk_agg" -> Set("BroadcastNestedLoopJoin"),
    "s08_ivf_ann" -> Set("BroadcastNestedLoopJoin"),
    // SQ8 coarse stage = corpus x broadcast queries, same family as s01
    "s10_quantized_rescore" -> Set("BroadcastNestedLoopJoin"),
    // truncated-prefix coarse stage = corpus x broadcast queries, the
    // s10 shape on the dimension axis
    "s20_truncated_rescore" -> Set("BroadcastNestedLoopJoin"),
    // MIPS scan = corpus x broadcast queries, same family as s01/s04
    "s12_mips_topk" -> Set("BroadcastNestedLoopJoin"),
    // s22: the s08-family codebook scan (corpus x broadcast L-row cells)
    "s22_kmeans_refine" -> Set("BroadcastNestedLoopJoin"),
    // s23: the same codebook scan feeding the bottom-k TakeOrdered
    "s23_coverage_gaps" -> Set("BroadcastNestedLoopJoin"),
    // t18: the t05/t08 1-row n_docs scalar broadcast
    "t18_keyword_extract" -> Set("BroadcastNestedLoopJoin"),
    // p19: the 1-row majority-target scalar broadcast over the
    // language-population-sized counts frame
    "p19_upsample_assign" -> Set("BroadcastNestedLoopJoin"),
    // m09: the 1-row corpus-total broadcast shifting the batch's starts
    // + TWO bucket-count-sized offsets windows (corpus and batch
    // packStarts passes each roll their own)
    "m09_shard_append" ->
      Set("BroadcastNestedLoopJoin", "multi-SinglePartition"),
    // p20: inherits p19's 1-row majority-target broadcast + the p15
    // 64-row bucket-offsets window next to the 1-row target agg
    "p20_training_order" ->
      Set("BroadcastNestedLoopJoin", "multi-SinglePartition"),
    // hybrid RRF: the vector channel is the s01-family broadcast-queries
    // scan; the lexical channel joins on bigram, the fusion join on
    // (qid, doc_id) — both hash
    "s15_rrf_hybrid" -> Set("BroadcastNestedLoopJoin"),
    // PQ: codebook scan (vectors x broadcast 10-row codebook) + ADC scan
    // (code table x broadcast per-query distance tables) — both the
    // intended s01/s08-family broadcast scans
    "s13_pq_adc" -> Set("BroadcastNestedLoopJoin"),
    // IVF+PQ: the two training scans (vectors x broadcast centroids /
    // codebook); the search itself joins on the cell key
    "s14_ivf_pq" -> Set("BroadcastNestedLoopJoin"),
    // s08's codebook scan (vectors x broadcast centroids); the pairwise
    // stage itself is an equality join on the cell key
    "s11_semantic_dedup" -> Set("BroadcastNestedLoopJoin"),
    // the 5-row threshold table broadcast against the pair-sized
    // (never corpus-sized) prefix-join result
    "d23_threshold_sweep" -> Set("BroadcastNestedLoopJoin"),
    // margin mining's all-pairs dot stage: side A x AQE-broadcast side B
    // — the declarative statement; at corpus scale the same mutual+
    // margin rule runs over s07's banded candidates (equality join)
    "s18_margin_mining" -> Set("BroadcastNestedLoopJoin"),
    // frozen-codebook assignment scan (batch x broadcast codebook) —
    // the s08-family broadcast scan on the batch slice only
    "s19_ivf_append" -> Set("BroadcastNestedLoopJoin"),
    // scalar broadcast (the cuts cross join); the rank-machinery windows
    // collapsed to one SinglePartition span once `bucketed` was cached
    // (round 7) — the cache reuses one exchange where two plans each
    // used to carry their own
    "p08_quality_deciles" -> Set("BroadcastNestedLoopJoin"),
    // scalar broadcast + windows over tiny aggregated frames
    "q02_critical_sparklines" ->
      Set("BroadcastNestedLoopJoin", "multi-SinglePartition"),
    "q08_health" -> Set("BroadcastNestedLoopJoin", "multi-SinglePartition"),
    // five 1-row global aggs unioned
    "p03_profile" -> Set("multi-SinglePartition"),
    // two 1-row scalar broadcasts (total, leftover seats) + the global
    // remainder-rank window and final sort — all over the
    // source-population-sized quota frame, never the corpus
    "p17_quota_sample" ->
      Set("BroadcastNestedLoopJoin", "multi-SinglePartition"),
    // distinct-cf histogram window (O(distinct frequencies) rows) + the
    // 1-row global fit agg — both tiny by construction; the vocabulary
    // itself is never globally sorted (two-phase rank)
    "t09_zipf_fit" -> Set("multi-SinglePartition")
  )

  test("companion guard: an Inner join whose condition folds away flags " +
      "at audit time (VERDICT r7 item 5)") {
    // CrossJoinGuard is Cross-only by the scratch-plan constraint; the
    // physical-plan audit is its non-Cross companion. A join condition
    // Catalyst constant-folds to TRUE leaves a condition-free Inner
    // join — physically a cartesian — and must flag.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val a = spark.range(1000).toDF("id")
      val b = spark.range(1000).toDF("id2")
      val dropped = a.join(b,
        org.apache.spark.sql.functions.lit(1) ===
          org.apache.spark.sql.functions.lit(1))
      val fs = PlanAudit.flags(dropped.queryExecution.executedPlan.toString)
      assert(fs.contains("CartesianProduct"),
        s"folded-away equi-condition did not flag: $fs")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
  }

  test("plan audit at sf0.1: flags stay within the sf0.001 allowlist " +
      "(VERDICT r7 item 5 — audit at the bench scale, not just the " +
      "tiny one)") {
    // Stats-driven plan choices can differ with scale (a side that
    // auto-broadcast at sf0.001 may sort-merge at sf0.1 — a flag
    // legitimately DISAPPEARING), but no query may flag a trap the
    // allowlist doesn't document: subset check here, exactness below.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val flagged = PlanAudit
        .sweep(spark, SparkEntry.queries.keys.toSeq.sorted, sf01)
        .map { case (n, fs) => n -> fs.toSet }
      val unexpected = flagged.filter { case (n, fs) =>
        !fs.subsetOf(allow.getOrElse(n, Set.empty))
      }
      assert(unexpected.isEmpty,
        s"queries flagging outside the allowlist at sf0.1: $unexpected")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("plan audit: no query flags a scale trap outside the allowlist") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val flagged = PlanAudit
        .sweep(spark, SparkEntry.queries.keys.toSeq.sorted, sf0001)
        .map { case (n, fs) => n -> fs.toSet }
      val unexpected = flagged.filter { case (n, fs) =>
        fs != allow.getOrElse(n, Set.empty)
      }
      val stale = allow.keySet.diff(flagged.keySet)
      assert(unexpected.isEmpty,
        s"queries flagging outside the allowlist: $unexpected")
      assert(stale.isEmpty,
        s"allowlist entries that no longer flag (remove them): $stale")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
