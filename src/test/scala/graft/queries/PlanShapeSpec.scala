package graft.queries

import graft.SparkSpec

/** Plan-shape regression guard for the ANN / sketch query family:
  * their scale story depends on every join being a broadcast hash
  * join (tiny probe/model side against the streamed corpus) — a
  * silent fallback to SortMergeJoin or a CartesianProduct would still
  * return correct rows while destroying the 100 TB cost model, which
  * the row-level oracle can never catch. Executed (post-AQE) plans
  * are asserted, the same surface the runtime uses.
  */
class PlanShapeSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private val broadcastOnly = Seq(
    "q_ann_lsh_topk", "q_ann_lsh_multiprobe", "q_ann_ivf_topk",
    "q_ann_pq_topk", "q_ann_ivfpq_topk", "q_cosine_topk",
    "q_importance_weights", "q_cardinality_kmv", "q_cardinality_kmv_exact",
    "q_quantile_hist", "q_domain_cap", "q_mixture_temperature",
    "q_heavy_hitters",
    // round 7: the int8 family — per-dim scales and per-query weights
    // are the tiny sides, the exploded corpus streams past them
    "q_int8_quant", "q_ann_sq_topk",
    // round 8: the 1-bit family — packed query blobs broadcast, the
    // candidate blob scan is map-only integer popcount
    "q_ann_hamming_topk", "q_ann_hamming_rerank",
    // filtered search: the label predicate is a broadcast semi-join
    // on the candidate rows, then the same map-only SQ8 scoring
    "q_ann_filtered")

  test("ANN/sketch queries plan broadcast joins only — no SMJ, no cartesian") {
    broadcastOnly.foreach { name =>
      val df = Inventory.byName(name).fn(spark, sfDir)
      // force planning + adaptive finalization
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("SortMergeJoin"),
        s"$name fell back to SortMergeJoin:\n${plan.take(1500)}")
      assert(!plan.contains("CartesianProduct"),
        s"$name planned a CartesianProduct:\n${plan.take(1500)}")
    }
  }

  test("SQ8 scoring is map-only — no aggregate exchange keyed on (query, cand)") {
    // round-8 rewrite: candidates score through one native code_dot_q
    // fold against a broadcast per-query weight array. The former
    // posexplode → join-on-pos → groupBy(query_id, cand_id) shape paid
    // a d×-row aggregate exchange keyed on the PAIR; if it creeps
    // back, this catches it even though the rows stay correct.
    val pairKeyed = """keys=\[[^\]]*(query_id[^\]]*cand_id|cand_id[^\]]*query_id)""".r
    Seq("q_ann_sq_topk", "q_ann_rerank", "q_ann_filtered",
        "q_ann_hamming_topk", "q_ann_hamming_rerank").foreach { name =>
      val df = Inventory.byName(name).fn(spark, sfDir)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(pairKeyed.findFirstIn(plan).isEmpty,
        s"$name re-grew a (query, cand)-keyed aggregate:\n${plan.take(1500)}")
    }
  }

  test("interval join runs as a banded equi-join — never a nested loop") {
    // the whole point of the banding rewrite: a BETWEEN theta-join
    // would plan BroadcastNestedLoopJoin (O(events × windows)); the
    // bucket key must make it a hash join with the BETWEEN as residual
    val df = Inventory.byName("q_interval_join").fn(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"q_interval_join lost its band key:\n${plan.take(1500)}")
  }

  test("as-of join plans ONE exchange — no join operator at all") {
    // the union-window form: no per-pair intermediate exists, so the
    // executed plan must contain a window over user_id and ZERO join
    // nodes (a range-join formulation would show up here)
    val df = Inventory.byName("q_asof_join").fn(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"),
      s"q_asof_join planned a join — union-window form lost:\n${plan.take(1500)}")
    assert(plan.contains("Window"),
      s"q_asof_join lost its window:\n${plan.take(1500)}")
  }

  test("round-11 queries keep their narrow shapes (map-only scrub, keyed window, one agg)") {
    // q_scrub_mask: a regexp_replace chain is a pure projection — no
    // join, no aggregate, nothing but the presentation sort's exchange
    val scrub = Inventory.byName("q_scrub_mask").fn(spark, sfDir)
    scrub.collect()
    val scrubPlan = scrub.queryExecution.executedPlan.toString
    assert(!scrubPlan.contains("Join") && !scrubPlan.contains("HashAggregate"),
      s"q_scrub_mask grew a join/aggregate:\n${scrubPlan.take(1500)}")
    // q_token_budget: the running sum must stay keyed per source —
    // an unpartitioned window would funnel the corpus through one task
    val budget = Inventory.byName("q_token_budget").fn(spark, sfDir)
    budget.collect()
    val budgetPlan = budget.queryExecution.executedPlan.toString
    assert(budgetPlan.contains("Window"),
      s"q_token_budget lost its window:\n${budgetPlan.take(1500)}")
    assert("Window \\[[^\\]]*partitionBy=\\[\\]".r
      .findFirstIn(budgetPlan).isEmpty &&
      !budgetPlan.contains("Join"),
      s"q_token_budget window lost its source key:\n${budgetPlan.take(1500)}")
    // q_dedup_keep_best: one partial+final aggregate, no window/join
    val best = Inventory.byName("q_dedup_keep_best").fn(spark, sfDir)
    best.collect()
    val bestPlan = best.queryExecution.executedPlan.toString
    assert(bestPlan.contains("HashAggregate") ||
      bestPlan.contains("ObjectHashAggregate") ||
      bestPlan.contains("SortAggregate"),
      s"q_dedup_keep_best lost its aggregate:\n${bestPlan.take(1500)}")
    assert(!bestPlan.contains("Join") && !bestPlan.contains("Window "),
      s"q_dedup_keep_best grew a join/window:\n${bestPlan.take(1500)}")
  }

  test("round-12 queries: novelty = gram equi-join, diversity = broadcast-only") {
    // q_ngram_novelty: "first occurrence" must be a min AGGREGATE
    // joined back on the gram key — never a global ordered window (the
    // single-partition funnel a naive first-seen derivation plans)
    val nov = Inventory.byName("q_ngram_novelty").fn(spark, sfDir)
    nov.collect()
    val novPlan = nov.queryExecution.executedPlan.toString
    assert(novPlan.contains("HashAggregate"),
      s"q_ngram_novelty lost its min aggregate:\n${novPlan.take(1500)}")
    assert(!novPlan.contains("CartesianProduct") &&
      !novPlan.contains("BroadcastNestedLoopJoin"),
      s"q_ngram_novelty planned a product join:\n${novPlan.take(1500)}")
    assert("Window \\[[^\\]]*partitionBy=\\[\\]".r.findFirstIn(novPlan).isEmpty,
      s"q_ngram_novelty grew an unpartitioned window:\n${novPlan.take(1500)}")
    // q_embed_diversity: the labels×dims centroid table must come BACK
    // as a broadcast — vectors never shuffle past the first aggregation
    val div = Inventory.byName("q_embed_diversity").fn(spark, sfDir)
    div.collect()
    val divPlan = div.queryExecution.executedPlan.toString
    assert(divPlan.contains("BroadcastHashJoin"),
      s"q_embed_diversity lost the broadcast centroid join:\n${divPlan.take(1500)}")
    assert(!divPlan.contains("SortMergeJoin"),
      s"q_embed_diversity shuffles vectors for the centroid join:\n${divPlan.take(1500)}")
  }
}
