"""Physical-plan assertions — the 100 TB design contract made executable
(SURVEY.md §4; the 'would this survive a 100× scale-up' checklist):

- filters reach the parquet scan (PushedFilters),
- projections prune the scan (ReadSchema),
- dimension joins broadcast (no fact shuffle),
- Top-N uses rank-limit pushdown (WindowGroupLimit — per-group state k),
- ORDER BY+LIMIT avoids a global sort (TakeOrderedAndProject),
- aggregates split partial/final (two HashAggregates).

These run on sf0.01 but assert plan SHAPE, which is scale-invariant.
"""

from __future__ import annotations

import pytest

from training_flink_sql_cc_src_spark.registry import all_queries

QUERIES = all_queries()


def _plan(spark, name, sf_dir) -> str:
    df = QUERIES[name](spark, sf_dir)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


def test_filters_push_down_to_scan(spark, sf_med):
    plan = _plan(spark, "filter_predicates", sf_med)
    assert "PushedFilters" in plan
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l][0]
    assert "In(o_orderstatus" in pushed
    assert "GreaterThanOrEqual(o_totalprice" in pushed


def test_projection_prunes_scan(spark, sf_med):
    plan = _plan(spark, "s2_customers_keyed_projection", sf_med)
    schema_line = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "c_custkey" in schema_line and "c_nationkey" not in schema_line


def test_dim_joins_broadcast(spark, sf_med):
    plan = _plan(spark, "s6_orders_enriched_join", sf_med)
    assert plan.count("BroadcastHashJoin") >= 2  # customer + part dims


def test_topn_uses_rank_pushdown(spark, sf_med):
    plan = _plan(spark, "topn_per_group", sf_med)
    assert "WindowGroupLimit" in plan  # per-group state is O(k), not O(n)


def test_order_limit_avoids_global_sort(spark, sf_med):
    plan = _plan(spark, "order_by_limit", sf_med)
    assert "TakeOrderedAndProject" in plan


def test_agg_splits_partial_final(spark, sf_med):
    plan = _plan(spark, "agg_pricing_summary", sf_med)
    assert plan.count("HashAggregate") >= 2  # map-side partial + final


def test_interval_join_is_hash_not_cross(spark, sf_med):
    plan = _plan(spark, "join_interval", sf_med)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_jaccard_pairs_join_is_equi_on_block_key(spark, sf_med):
    plan = _plan(spark, "dedup_jaccard_blocked_pairs", sf_med)
    assert "CartesianProduct" not in plan


def test_q6_predicates_reach_scan(spark, sf_med):
    plan = _plan(spark, "q6_forecast_revenue", sf_med)
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l][0]
    assert "l_shipdate" in pushed and "l_quantity" in pushed
    # single-row result: partial agg on each scan partition, then final
    assert plan.count("HashAggregate") >= 2


def test_q8_snowflake_dims_all_broadcast(spark, sf_med):
    plan = _plan(spark, "q8_market_share", sf_med)
    # part, customer, nation x2, region, supplier — six broadcast dims;
    # the only shuffle join is lineitem x orders
    assert plan.count("BroadcastHashJoin") >= 6
    assert "CartesianProduct" not in plan


def test_q21_decorrelated_no_cartesian(spark, sf_med):
    plan = _plan(spark, "q21_waiting_supplier", sf_med)
    assert "CartesianProduct" not in plan
    # top-n by numwait avoids a global sort
    assert "TakeOrderedAndProject" in plan
    # one-pass shape: min/max distinctness, so no countDistinct Expand and
    # exactly two aggregate stages (per-order, per-name) x (partial, final)
    assert "Expand" not in plan
    # tree-form node count ("HashAggregate (n)"); formatted explain also
    # repeats each node in the details section
    assert plan.count("HashAggregate (") == 4


def test_q17_threshold_join_broadcasts(spark, sf_med):
    plan = _plan(spark, "q17_small_quantity_revenue", sf_med)
    # brand-filtered part dim AND the per-part threshold table broadcast;
    # the fact is never shuffled on a join key
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan


# With the auto-broadcast threshold disabled, the ONLY thing that can force
# a BroadcastHashJoin is an explicit F.broadcast hint — hints override AQE's
# size logic, so a hint on an SF-scaling relation (customer/part/supplier,
# or any lineitem-derived aggregate) is a guaranteed OOM at 100x scale.
# Expected counts below = hints on BOUNDED relations only (nation: 25 rows,
# region: 5 rows, single-row aggregate singletons, constant query sets).
_HINTED_BOUNDED = {
    "s6_orders_enriched_join": 0,
    "q3_shipping_priority": 0,
    "q5_region_revenue": 2,  # nation + region
    "q8_market_share": 3,  # nation x2 + region
    "q10_returned_items": 1,  # nation
    "q17_small_quantity_revenue": 0,
    "q18_large_volume_customer": 0,
    "q20_excess_shippers": 1,  # filtered nation (semi)
    "q21_waiting_supplier": 0,
    "q2_min_cost_supplier": 0,
}


@pytest.mark.parametrize("name", sorted(_HINTED_BOUNDED))
def test_no_forced_broadcast_on_sf_scaling_tables(spark, name, sf_med):
    saved = {
        "spark.sql.autoBroadcastJoinThreshold": spark.conf.get(
            "spark.sql.autoBroadcastJoinThreshold"
        ),
        "spark.sql.adaptive.enabled": spark.conf.get("spark.sql.adaptive.enabled"),
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = QUERIES[name](spark, sf_med)
        # executedPlan (not formatted explain, which lists every operator
        # twice: once in the tree, once in the details section)
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
    got = plan.count("BroadcastHashJoin")
    assert got == _HINTED_BOUNDED[name], (
        f"{name}: {got} forced broadcasts, expected {_HINTED_BOUNDED[name]} "
        "(only bounded dims may carry an explicit broadcast hint)"
    )


def test_ppjoin_no_cartesian(spark, sf_med):
    """PPJoin candidate generation must stay an equi join on prefix
    tokens — never a nested-loop/cartesian pair enumeration."""
    plan = (
        QUERIES["dedup_jaccard_ppjoin"](spark, sf_med)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_deterministic_shuffle_uses_take_ordered(spark, sf_med):
    """The epoch-shuffle prefix must plan as TakeOrderedAndProject (each
    partition keeps a local top-k heap), never a global Sort of the
    corpus."""
    plan = _plan(spark, "pipeline_deterministic_shuffle", sf_med)
    assert "TakeOrderedAndProject" in plan


def test_ngram_span_dedup_no_cartesian(spark, sf_med):
    """Duplicate-span detection must stay shingle-keyed: no cartesian or
    broadcast-nested-loop pair generation anywhere in the plan."""
    plan = _plan(spark, "dedup_ngram_span_exact", sf_med)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_stratified_sample_single_window_shuffle(spark, sf_med):
    """Rank and per-stratum count must share ONE hash exchange on lang —
    a second exchange would mean the two windows repartitioned twice."""
    import re

    plan = _plan(spark, "pipeline_stratified_sample", sf_med)
    n_exchanges = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_exchanges == 1, plan


def test_match_recognize_quant_single_window_exchange(spark, sf_med):
    """The bounded-quantifier lowering shares ONE LEAD chain (one window
    exchange on the partition key) across all variants — a per-variant
    window would multiply the shuffle by m-n+1."""
    import re

    plan = _plan(spark, "pattern_match_recognize_quant", sf_med)
    n_exchanges = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_exchanges == 1, plan
    assert "CartesianProduct" not in plan


def test_match_recognize_all_rows_single_window_exchange(spark, sf_med):
    """ALL ROWS PER MATCH adds only a generator (offset explode) on top
    of the match plan — still exactly one exchange, no join."""
    import re

    plan = _plan(spark, "pattern_match_recognize_all_rows", sf_med)
    n_exchanges = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_exchanges == 1, plan
    assert "Generate" in plan  # the offset explode


def test_stratified_scalable_broadcasts_cutoffs(spark, sf_med):
    """The histogram variant must broadcast the one-row-per-stratum
    cutoffs back to the base data (map-side filter), never shuffle the
    corpus on a join key, and never enumerate pairs."""
    plan = _plan(spark, "pipeline_stratified_sample_scalable", sf_med)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # no SortMergeJoin of the base documents against anything
    assert "SortMergeJoin" not in plan


def test_heavy_hitters_exact_two_phase_agg(spark, sf_med):
    """Sketch build + merge = keyed aggregations with map-side partials
    throughout; no cartesian, no global sort of the raw rows."""
    plan = _plan(spark, "agg_heavy_hitters_merge_exact", sf_med)
    assert plan.count("HashAggregate") >= 4  # partial+final x two phases
    assert "CartesianProduct" not in plan


def test_q18_no_fact_shuffle_join(spark, sf_med):
    """After the aggregation-reuse rewrite the only exchanges are the
    per-orderkey aggregate and the top-100 ordering; orders and customer
    join via broadcast of the filtered side — the fact tables are never
    shuffled on a join key."""
    plan = _plan(spark, "q18_large_volume_customer", sf_med)
    assert "SortMergeJoin" not in plan
    assert "TakeOrderedAndProject" in plan


def test_match_recognize_alt_prev_single_exchange(spark, sf_med):
    """Alternation and PREV lowerings still ride ONE window exchange —
    the variant CASE and offset rewrites are expression-level only."""
    import re

    for name in ("pattern_match_recognize_alt", "pattern_match_recognize_prev"):
        plan = _plan(spark, name, sf_med)
        n_exchanges = len(re.findall(r"\(\d+\) Exchange", plan))
        assert n_exchanges == 1, (name, plan)
        assert "CartesianProduct" not in plan


def test_match_recognize_plus_single_exchange_no_join(spark, sf_med):
    """The gaps-and-islands A+ B lowering rides ONE exchange: the run-id
    window clusters by (partition key, run id), which the partition-key
    hash partitioning already satisfies (subset rule), so Spark inserts
    no second shuffle. Never joins or pairs — O(1) state per row at any
    run length."""
    import re

    plan = _plan(spark, "pattern_match_recognize_plus", sf_med)
    n_exchanges = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_exchanges == 1, plan
    assert "CartesianProduct" not in plan
    assert "Join" not in plan


def test_match_recognize_overlap_single_exchange_arrow(spark, sf_med):
    """The overlapping-DEFINE A+ B matcher is ONE shuffle on the
    partition key feeding a group-aware Arrow-batched MapInPandas
    (round 13: one Python round-trip per ~10k-row batch instead of one
    per key — FlatMapGroupsInPandas cost scaled with key cardinality,
    3.3 s of pure IPC over sf1z's 15k keys); predicates are evaluated
    JVM-side before the exchange, and nothing joins or pairs."""
    import re

    plan = _plan(spark, "pattern_match_recognize_overlap", sf_med)
    assert "MapInPandas" in plan
    n_exchanges = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_exchanges == 1, plan
    assert "CartesianProduct" not in plan
    assert "Join" not in plan


def test_quota_cap_uses_window_group_limit(spark, sf_med):
    """The per-stratum cap must plan as WindowGroupLimit (map-side O(K)
    state per group before the shuffle), never a full per-stratum sort."""
    plan = _plan(spark, "pipeline_quota_cap", sf_med)
    assert "WindowGroupLimit" in plan


def test_incremental_dedup_no_cartesian_single_key(spark, sf_med):
    """Anti join and keeper groupBy both key on the content hash; no
    cartesian, no nested-loop."""
    plan = _plan(spark, "pipeline_incremental_dedup", sf_med)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_window_dedup_uses_group_limit(spark, sf_med):
    """Window dedup (rn = 1) must keep one row per (window, user) on the
    map side (WindowGroupLimit) before the exchange."""
    plan = _plan(spark, "window_dedup_first", sf_med)
    assert "WindowGroupLimit" in plan


def test_window_topn_uses_group_limit(spark, sf_med):
    """Window Top-N (rnk <= 3) must push the rank filter to
    WindowGroupLimit: O(k) map-side state per window, never a full
    per-window sort of the aggregate."""
    plan = _plan(spark, "window_topn", sf_med)
    assert "WindowGroupLimit" in plan


def test_incremental_near_dedup_single_semi_join(spark, sf_med):
    """Incremental near-dedup: candidate detection must be ONE semi join
    on the composite (band, key) — never a cartesian, never a per-band
    join union."""
    plan = _plan(spark, "pipeline_incremental_near_dedup", sf_med)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("Join type: LeftSemi") == 1
    assert plan.count("Join type: LeftAnti") == 1


def test_pq_candidates_broadcast_and_rerank_broadcast(spark, sf_med):
    """PQ-ADC: the 8-row LUT relation and the candidate id set must both
    broadcast — the corpus is never shuffled for scoring, and the exact
    rerank joins candidate-sized relations, not corpus-sized."""
    plan = _plan(spark, "sim_ann_pq", sf_med)
    assert "CartesianProduct" not in plan
    # LUT x codes scoring is an intentional broadcast nested loop over
    # the 8-row LUT side; the rerank joins are broadcast hash joins
    assert plan.count("BroadcastHashJoin") >= 2
    # candidate/rank shuffles carry scalar rows only: no shuffle of the
    # embedding column before the rank filter
    assert "SortMergeJoin" not in plan


def test_match_recognize_vshape_single_window_exchange(spark, sf_med):
    """TWO quantifiers (9 cross-product variants) with PREV in both
    DEFINEs still ride ONE LEAD chain / one window exchange — the
    variant union is a when-chain, never a plan multiplier."""
    import re

    plan = _plan(spark, "pattern_match_recognize_vshape", sf_med)
    n_exchanges = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_exchanges == 1, plan
    assert "CartesianProduct" not in plan


def test_match_recognize_crossvar_single_window_exchange(spark, sf_med):
    """Cross-variable DEFINE references resolve to offsets of the SAME
    LEAD chain — no join, no extra exchange."""
    import re

    plan = _plan(spark, "pattern_match_recognize_crossvar", sf_med)
    n_exchanges = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_exchanges == 1, plan
    assert "Join" not in plan


def test_tfidf_topk_plan(spark, sf_med):
    """TF-IDF: per-doc top-3 rides WindowGroupLimit; the tf-df join must
    be a plain shuffle join on term (vocabulary is unbounded at scale,
    broadcasting it would be a 100 TB failure) with no cartesian."""
    plan = _plan(spark, "text_tfidf_topk", sf_med)
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan


def test_importance_weights_no_cartesian_no_vocab_broadcast(spark, sf_med):
    """DSIR weights: the vocabulary logratio relation joins the (doc,
    term) counts on term — never a cartesian. The ONLY nested-loop
    join allowed is the ONE-ROW corpus-totals broadcast (the q22
    scalar-subquery trick that replaced three driver-side count()
    actions, round 7) — scale-invariant by construction."""
    import re

    plan = _plan(spark, "pipeline_importance_weights", sf_med)
    assert "CartesianProduct" not in plan
    # formatted plans list each node in the tree AND a numbered detail
    # section — count the detail entries
    assert len(re.findall(r"\(\d+\) BroadcastNestedLoopJoin", plan)) <= 1


def test_skip_past_selection_no_cartesian(spark, sf_med):
    """The skip-past candidate selection joins back on (keys, position)
    as a semi join — one window exchange for the LEAD chain, no
    cartesian anywhere."""
    plan = _plan(spark, "pattern_match_recognize_skip_past", sf_med)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_general_nfa_single_exchange(spark, sf_med):
    """The general NFA matcher shuffles ONCE on the partition key; the
    per-variable booleans are computed before the exchange (no Python
    between scan and shuffle beyond the matcher itself)."""
    plan = _plan(spark, "pattern_match_recognize_mid_plus", sf_med)
    assert plan.count("+- Exchange") == 1
    assert "CartesianProduct" not in plan


def test_pii_redaction_map_only(spark, sf_med):
    """PII redaction is pure regexp_replace: no exchange anywhere."""
    plan = _plan(spark, "pipeline_pii_redaction", sf_med)
    assert "Exchange" not in plan


def test_semdedup_no_cartesian(spark, sf_med):
    """SemDeDup's cosine edges come from the label-blocked equi join —
    never a cartesian or nested-loop product."""
    plan = _plan(spark, "pipeline_semdedup", sf_med)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_window_join_sql_pushdown_no_cartesian(spark, sf_med):
    """WINDOW JOIN through the SQL front door: each side's event_type
    filter must reach its parquet scan, the two windowed aggregates keep
    one shuffle each, and the equality join on (window_start, window_end)
    must never degrade to a cartesian/nested-loop plan."""
    plan = _plan(spark, "window_join_sql", sf_med)
    assert "EqualTo(event_type,click)" in plan
    assert "EqualTo(event_type,purchase)" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_kmeans_assign_zero_exchange_single_udf(spark, sf_med):
    """K-means assignment is the Arrow-matmul argmax: ZERO Exchange of
    any kind (no rank shuffle, no broadcast — the chosen centroid comes
    from a K-entry map literal), and the Arrow UDF evaluates exactly
    ONCE per row (a broadcast-join formulation lets Catalyst push the
    inferred isnotnull below the projection and run the matmul twice)."""
    import re

    plan = _plan(spark, "cluster_kmeans_assign", sf_med)
    assert "Exchange" not in plan
    # formatted explain prints each node once in the tree and once in
    # the details — count detail headers "(n) ArrowEvalPython"
    assert len(re.findall(r"\(\d+\) ArrowEvalPython", plan)) == 1
    assert "CartesianProduct" not in plan


def test_kmeans_update_partial_aggregation(spark, sf_med):
    """The Lloyd update's (cluster, dimension) reduce splits
    partial/final HashAggregates — map-side combine carries K x 64
    cells per task, never n x 64 rows, to the shuffle — and the
    assignment rides the same row (no vec_id self-join: zero Join
    nodes, one Exchange for the aggregate)."""
    plan = _plan(spark, "cluster_kmeans_update", sf_med)
    assert plan.count("HashAggregate") >= 2
    assert "Join" not in plan
    assert "CartesianProduct" not in plan


def test_bigram_lm_no_cartesian(spark, sf_med):
    """Bigram LM scoring: counts chain partial aggregates and the
    model join is keyed on the bigram — no cartesian, no nested-loop
    join anywhere except the one-row vocabulary-size broadcast."""
    import re

    plan = _plan(spark, "text_bigram_lm_score", sf_med)
    assert "CartesianProduct" not in plan
    assert len(re.findall(r"\(\d+\) BroadcastNestedLoopJoin", plan)) <= 1


def test_over_agg_sql_single_window_exchange(spark, sf_med):
    """The front-door OVER aggregation plans ONE exchange on the
    partition key and one Window node computing both frame
    aggregates — no per-aggregate re-shuffle."""
    plan = _plan(spark, "over_agg_sql", sf_med)
    assert plan.count("+- Exchange") == 1
    assert "CartesianProduct" not in plan


def test_bpe_encode_map_only(spark, sf_med):
    """BPE ENCODE over the corpus: the learned merges are driver-side
    literals folded into the projection, so the plan has NO Join and
    exactly ONE Exchange — the fan_out round-robin repartition that
    partitions the compute-bound encode by COST instead of bytes
    (round 9; the fixture scan byte-packs a 5k-row file into one task,
    single-threading two merge folds per word). No key shuffle: the
    one Exchange is RoundRobinPartitioning, never hash-on-a-column
    (the learn loop's aggregates run before the plan is built and are
    not part of it)."""
    plan = _plan(spark, "pipeline_bpe_encode", sf_med)
    assert "RoundRobinPartitioning" in plan
    assert "hashpartitioning" not in plan.lower()
    assert "Join" not in plan
    assert "CartesianProduct" not in plan


def test_quality_floor_broadcasts_floor_table(spark, sf_med):
    """The per-source quality floor joins the corpus against a
    domain-cardinality floor table: the floor side must BROADCAST (a
    shuffle join would move the corpus for a KB-sized dim)."""
    plan = _plan(spark, "pipeline_quality_floor", sf_med)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_dsir_resample_take_ordered(spark, sf_med):
    """The Gumbel top-k draw never materializes a global sort: the
    64 winners come from TakeOrderedAndProject (per-partition heads
    merged on the driver), not a single-partition Sort."""
    plan = _plan(spark, "pipeline_dsir_resample", sf_med)
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_keep_best_partial_aggregation_no_window(spark, sf_med):
    """Keep-best representative selection reduces with a struct-max
    groupBy — partial/final SortAggregates (struct max is not
    hash-aggregable; the partial still combines map-side, so only one
    pre-reduced row per component per task reaches the exchange), the
    docs join broadcasts, and there is no per-component Window sort —
    a giant duplicate cluster never serializes through one sort."""
    plan = _plan(spark, "dedup_keep_best", sf_med)
    assert plan.count("SortAggregate") >= 2
    assert "BroadcastHashJoin" in plan
    assert "Window" not in plan.replace("WindowGroupLimit", "")


def test_fuzzy_name_join_is_blocked_not_cartesian(spark):
    """dedup_fuzzy_name_pairs: candidates must come from a hash join on
    the (brand, size) blocking key with the Levenshtein threshold as a
    join-level predicate — never a cartesian/nested-loop product."""
    from training_flink_sql_cc_src_spark.registry import all_queries

    df = all_queries()["dedup_fuzzy_name_pairs"](
        spark, "/root/testdata/sf0.01"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_winnow_fingerprints_map_side(spark, sf_med):
    """Winnowing fingerprint SELECTION is per-document-local and must
    stay map-side (VERDICT r13 #3): gram hashes and window minima are
    computed per row inside one Arrow-batched MapInPandas over the
    scan, so the plan has NO window operator, NO per-gram
    Generate/explode, NO Join, and the only Exchange is the fan_out
    round-robin repartition (compute-cost partitioning of a
    single-row-group fixture scan — on a pre-split cluster scan the
    stage is a pure map)."""
    import re

    plan = _plan(spark, "text_winnow_fingerprints", sf_med)
    assert "Window" not in plan
    assert "Generate" not in plan  # no explode anywhere
    assert "Join" not in plan
    assert "hashpartitioning" not in plan.lower()
    assert "MapInPandas" in plan
    n_exchange = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_exchange == 1 and "RoundRobinPartitioning" in plan, plan[:1500]


def test_winnow_pairs_explodes_only_selected_fingerprints(spark, sf_med):
    """dedup_winnow_pairs: fingerprint selection happens INSIDE the
    materialized fp relation (the Arrow-batched selector emits only
    per-document-distinct SELECTED fingerprints, density <= 2/(w+1),
    already packed to binary(8)) — the downstream plan over the
    checkpoint must have no Window operator and shuffle only on the
    fingerprint/pair keys; the r13 plan's full-gram explode + doc_id
    window shuffle (~30x corpus bytes) must not reappear. The two
    queries share the one selection helper (_winnow_wmins), whose
    md5/window-min semantics tests/test_winnow_property.py pins against
    a pure-Python reference."""
    from training_flink_sql_cc_src_spark.queries import llm_text as lt

    plan = _plan(spark, "dedup_winnow_pairs", sf_med)
    assert "Window" not in plan
    assert "RoundRobinPartitioning" not in plan  # fan_out is pre-checkpoint
    # every hash shuffle in the posting join keys on the fingerprint
    for line in plan.splitlines():
        if "hashpartitioning" in line:
            assert "wmin" in line or "id_" in line, line
    # both queries route through the shared selection helper
    assert callable(lt._winnow_wmins)


def test_fan_out_conditional(spark, sf_med):
    """fan_out (queries/_util.py, VERDICT r14 #1): the round-robin
    exchange exists ONLY for materially under-parallel inputs. A plan
    that already has >= min_fill x defaultParallelism partitions — the
    structural situation of EVERY corpus-scale scan on a real cluster,
    where splits outnumber cores — must pass through IDENTITY, with no
    exchange inserted; the old unconditional form shuffled the whole
    corpus before each fanned-out [C] stage."""
    from training_flink_sql_cc_src_spark.queries._util import fan_out

    par = spark.sparkContext.defaultParallelism
    wide = spark.range(0, 10_000, 1, numPartitions=2 * par)
    assert fan_out(wide) is wide  # identity: not even a new plan node

    narrow = spark.range(0, 10_000, 1, numPartitions=2)
    fanned = fan_out(narrow)
    assert fanned is not narrow
    assert fanned.rdd.getNumPartitions() == par


def test_fan_out_corpus_scale_scan_has_no_roundrobin(spark, sf_med):
    """Cluster-conditions simulation for the [C] family: shrink
    maxPartitionBytes so the documents scan arrives with more splits
    than cores (exactly how a 100 TB scan lands on a 1000-executor
    cluster), then assert a fan_out-wrapped compute stage inserts NO
    round-robin exchange — scan parallelism is used as-is."""
    from training_flink_sql_cc_src_spark.queries._util import fan_out, t

    key = "spark.sql.files.maxPartitionBytes"
    old = spark.conf.get(key)
    try:
        spark.conf.set(key, "8k")
        docs = t(spark, sf_med, "documents").select("doc_id", "text")
        par = spark.sparkContext.defaultParallelism
        n_in = docs.rdd.getNumPartitions()
        assert n_in >= par, f"fixture scan only {n_in} splits; test setup broken"
        fanned = fan_out(docs)
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        plan = fanned._jdf.queryExecution().explainString(mode)
        assert "RoundRobinPartitioning" not in plan, plan[:1200]
        assert "Exchange" not in plan, plan[:1200]
    finally:
        spark.conf.set(key, old)


def test_kmeans_update_single_udf_eval_below_explode(spark, sf_med):
    """The k-means update stage must evaluate the assignment UDF ONCE,
    on the un-exploded vectors (guide §4.4): before r15 the pushed
    isNotNull(cluster_id) filter made Catalyst duplicate the
    ArrowEvalPython, and the duplicate sat ABOVE the 64-way posexplode
    — every vector crossed the Python boundary and paid the matmul 64
    extra times. Pin: exactly one ArrowEvalPython in the tree, and the
    Generate (posexplode) sits above it, never below."""
    plan = _plan(spark, "cluster_kmeans_update", sf_med)
    tree = plan.split("\n\n")[0]  # numbered-tree section only
    arrow_lines = [
        i for i, l in enumerate(tree.splitlines()) if "ArrowEvalPython" in l
    ]
    gen_lines = [
        i for i, l in enumerate(tree.splitlines()) if "Generate" in l
    ]
    assert len(arrow_lines) == 1, tree
    assert len(gen_lines) == 1, tree
    # formatted tree prints top-down: the Generate line must come BEFORE
    # (above) the ArrowEvalPython line
    assert gen_lines[0] < arrow_lines[0], tree


def test_multimodal_decode_single_python_stage(spark, sf_med):
    """The multimodal decode queries run encode+decode as ONE fused
    mapInPandas (r15, guide §4/§8): the synthetic binary payload never
    crosses the JVM boundary, no exchange ever carries it, and the
    local-mode per-task Python-eval overhead is paid once per task
    instead of twice. Pin: exactly one MapInPandas node and exactly one
    Exchange (the row-fan-out BELOW it, which moves only doc_id longs).
    multimodal_header_decode intentionally keeps the two-stage payload
    shuffle — it carries the family's encode→shuffle→decode byte
    round-trip attestation."""
    for name in ("multimodal_pixel_stats", "multimodal_video_metadata"):
        plan = _plan(spark, name, sf_med)
        tree = plan.split("\n\n")[0]
        lines = tree.splitlines()
        mip = [i for i, l in enumerate(lines) if "MapInPandas" in l]
        exch = [i for i, l in enumerate(lines) if "Exchange" in l]
        assert len(mip) == 1, tree
        assert len(exch) == 1, tree
        # formatted tree prints top-down: the Exchange must sit BELOW
        # (after) the MapInPandas — it fans out doc_ids, not payloads
        assert exch[0] > mip[0], tree


def test_header_decode_attestation_shuffle_is_cores_aware(spark, sf_med):
    """multimodal_header_decode keeps ONE deliberate payload exchange
    (the byte round-trip attestation) — but its width must derive from
    defaultParallelism, not the pre-r16 constant 8 that would run the
    decode stage at parallelism 8 on any cluster (VERDICT r15 Wrong #5)."""
    plan = _plan(spark, "multimodal_header_decode", sf_med)
    par = spark.sparkContext.defaultParallelism
    hash_exch = [
        l for l in plan.splitlines() if "hashpartitioning(doc_id" in l
    ]
    assert len(hash_exch) == 1, plan
    assert f", {par})" in hash_exch[0], hash_exch[0]


def test_pairwise_mask_prune_in_candidate_join(spark, tmp_path):
    """The large-vocab prefix joins carry the 512-bit mask bound (r16):
    the candidate SMJ's join/filter condition must contain the
    bit_count(ma & mb) sum for BOTH containment and blocked jaccard —
    a silent drop of the prune would revert the sf3z verification
    blowup without failing any correctness test."""
    import random

    import pandas as pd

    from training_flink_sql_cc_src_spark.registry import _REGISTRY, _load_all

    _load_all()
    rnd = random.Random(7)
    vocab = [f"tok{i}" for i in range(160)]  # > 64 -> large-vocab path
    rows = []
    for i in range(60):
        words = rnd.sample(vocab, rnd.randint(8, 30))
        text = " ".join(words)
        rows.append((i, text, "en" if i % 2 else "de", "s0", len(text)))
    pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).to_parquet(tmp_path / "documents.parquet")
    for name in ("dedup_containment_pairs", "dedup_jaccard_blocked_pairs"):
        df = _REGISTRY[name].fn(spark, str(tmp_path))
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        plan = df._jdf.queryExecution().explainString(mode)
        assert "bit_count" in plan, f"{name}: mask prune missing\n{plan[:1500]}"


def test_vocab_oov_single_scoring_pass(spark, sf_med):
    """pipeline_vocab_oov_rate derives per-doc token totals and vocab
    hits from the SAME per-doc aggregate over the tokenized corpus
    (r15): two corpus scans total (vocabulary pass + scoring pass) —
    the r14 shape paid a third scan for a separate size(split)
    projection plus a per-doc join to stitch it back."""
    plan = _plan(spark, "pipeline_vocab_oov_rate", sf_med)
    tree = plan.split("\n\n")[0]
    n_scans = sum("Scan parquet" in l for l in tree.splitlines())
    assert n_scans == 2, tree


def test_match_recognize_input_narrowed(spark, sf_med):
    """The MATCH_RECOGNIZE window lowerings project the input to
    partition/order/DEFINE/measure columns before the shuffle (r15,
    guide §2.3): the LEAD and end-info structs ride the partition
    exchange and every window sort, so an unused payload column would
    cross the wire once and the sorts four times. The events fixture's
    `props` string is referenced by none of the headline patterns —
    it must not appear anywhere in their plans."""
    for name in (
        "pattern_match_recognize_plus",
        "pattern_match_recognize_measure_nav",
        "pattern_match_recognize_permute5",
    ):
        plan = _plan(spark, name, sf_med)
        assert "props" not in plan, name


def test_minhash_dedup_shuffle_carries_no_signatures(spark, sf_med):
    """lsh_band_pairs (r15, guide §2.3): the candidate-pair dedup
    aggregates on (id_a, id_b) AFTER the signature agreement count is
    projected down to one integer — the dedup exchange moves
    ~24-byte rows, never the two 32-long signature arrays (which the
    pre-r15 plan shipped through the distinct as sig_a/sig_b). n_agree
    is a pure function of the id pair, so whichever banded duplicate
    survives the distinct carries the identical value."""
    plan = _plan(spark, "dedup_minhash_lsh", sf_med)
    assert "n_agree" in plan
    assert "sig_a" not in plan and "sig_b" not in plan, plan[:1500]
