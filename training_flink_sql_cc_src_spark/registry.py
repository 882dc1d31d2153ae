"""Query registry backing the driver contract (__spark_entry__.py).

Every operator declared in SURVEY.md §2 registers here as a named
(spark_fn, oracle_sql) pair. ``spark_fn(spark, sf_dir) -> DataFrame`` is the
PySpark implementation; ``oracle_sql`` is the ANSI-SQL equivalent DuckDB runs
over the same parquet (views pre-registered by the driver). Non-SQL-
expressible ops register with ``oracle=None`` → driver's weaker rows-only
check.

Hash-matching rules encoded here (see BASELINE.md derived targets):
- every computed column is aliased identically in both implementations;
- double aggregations go through DECIMAL(38,6) so partial/final aggregation
  order (Spark) vs single-node order (DuckDB) cannot produce ULP drift;
- window starts/ends are emitted as BIGINT epoch seconds so timestamp
  type/timezone representation differences cannot affect the value hash.
"""

from __future__ import annotations

import json as _json
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass
class Entry:
    fn: SparkQuery
    oracle: str | None
    doc: str = ""
    #: Part of the driver-facing contract (__spark_entry__.queries()).
    #: False for fold-suite MEMBERS (queries/folds.py): they stay
    #: registered — bench, scale runs, and tests/test_oracle_parity.py
    #: exercise them individually via all_queries() — but the driver
    #: attests them through their fold's single hash-checked row, which
    #: keeps the ~50-slot/round rotation cycle within its staleness
    #: guard (VERDICT r11 #3; arithmetic at driver_queries()).
    driver: bool = True


_REGISTRY: dict[str, Entry] = {}


def register(
    name: str,
    oracle: str | None = None,
    doc: str = "",
    driver: bool = True,
):
    """Decorator: register a (spark_fn, oracle_sql) pair under ``name``."""

    def deco(fn: SparkQuery) -> SparkQuery:
        _REGISTRY[name] = Entry(
            fn=fn,
            oracle=oracle,
            doc=doc or (fn.__doc__ or ""),
            driver=driver,
        )
        return fn

    return deco


def hide_from_driver(names) -> None:
    """Mark registered entries as fold members: still first-class for
    bench/tests, no longer individual rows in the driver rotation."""
    for name in names:
        _REGISTRY[name].driver = False


# Round of the most recent green driver row per registry name (hash-match,
# or a rows-only row that ran without error).
#
# Why a round number and not a set: the driver records only the first ~50
# registry entries in iteration order, AND /root/testdata is regenerated
# between rounds — so a green row is evidence against that round's data
# only (the round-3 events.parquet encoding change silently invalidated
# every window/time green from rounds 1-2). _driver_order therefore
# front-loads names with no driver evidence at all, then cycles the
# verified tail OLDEST evidence first, so all entries get re-checked
# against the current data every ~3 rounds.
#
# The table is built STRUCTURALLY at import: _load_driver_last_green()
# globs CORRECTNESS_r*.json from the repo root, so committing each round's
# driver artifact keeps the rotation current with no human step. The
# frozen dict below is only the fallback when no artifacts are readable
# (e.g. the package installed outside the repo).
_DRIVER_LAST_GREEN_FALLBACK = {
    "agg_approx_count_distinct": 4,
    "agg_bool_bitwise": 4,
    "agg_collect_median": 4,
    "agg_count_distinct": 4,
    "agg_cube": 4,
    "agg_global_no_groupby": 4,
    "agg_grouping_id": 4,
    "agg_grouping_sets": 4,
    "agg_having": 4,
    "agg_heavy_hitters_merge": 4,
    "agg_heavy_hitters_merge_exact": 5,
    "agg_hll_mergeable_sketch": 4,
    "agg_null_semantics": 5,
    "agg_percentile_disc": 4,
    "agg_pivot_conditional": 4,
    "agg_pricing_summary": 4,
    "agg_quantile_sketch_merge": 4,
    "agg_rollup": 4,
    "agg_string_agg": 4,
    "agg_variance_covar_manual": 4,
    "analytic_distribution": 4,
    "analytic_first_last_frames": 4,
    "analytic_offset": 4,
    "analytic_ranking": 4,
    "dedup_connected_components": 5,
    "dedup_exact_text": 5,
    "dedup_first_event_per_user": 5,
    "dedup_jaccard_blocked_pairs": 5,
    "dedup_jaccard_ppjoin": 5,
    "dedup_minhash_lsh": 5,
    "dedup_minhash_lsh_exact": 6,
    "dedup_ngram_span_exact": 4,
    "dedup_simhash_hamming": 5,
    "dedup_simhash_hamming_exact": 6,
    "except_keys": 5,
    "filter_predicates": 5,
    "intersect_keys": 5,
    "join_anti": 5,
    "join_asof_temporal": 5,
    "join_full_outer": 5,
    "join_interval": 5,
    "join_left_outer": 5,
    "join_range_bucketed": 5,
    "join_right_outer": 5,
    "join_semi": 5,
    "join_temporal_sql": 5,
    "join_theta_band": 5,
    "late_data_filter": 4,
    "multimodal_binary_metadata": 5,
    "multimodal_decode_features": 5,
    "multimodal_doc_embedding_join": 6,
    "multimodal_frame_sample": 6,
    "multimodal_header_decode": 6,
    "order_by_limit": 6,
    "order_nulls_first_last": 6,
    "pandas_grouped_zscore": 3,
    "pandas_grouped_zscore_rounded": 6,
    "pandas_udaf_median": 3,
    "pandas_udf_entropy": 3,
    "pattern_funnel": 4,
    "pattern_funnel3_sequential": 4,
    "pattern_match_recognize": 4,
    "pattern_match_recognize_agg": 5,
    "pattern_match_recognize_all_rows": 5,
    "pattern_match_recognize_all_rows_plus": 6,
    "pattern_match_recognize_all_rows_quant": 6,
    "pattern_match_recognize_alt": 5,
    "pattern_match_recognize_crossvar": 6,
    "pattern_match_recognize_crossvar_run": 6,
    "pattern_match_recognize_group_quant": 6,
    "pattern_match_recognize_mid_plus": 6,
    "pattern_match_recognize_multi_alt": 6,
    "pattern_match_recognize_nav": 6,
    "pattern_match_recognize_nested": 6,
    "pattern_match_recognize_next": 6,
    "pattern_match_recognize_opt": 6,
    "pattern_match_recognize_overlap": 6,
    "pattern_match_recognize_permute": 6,
    "pattern_match_recognize_plus": 5,
    "pattern_match_recognize_prev": 5,
    "pattern_match_recognize_prev_run": 6,
    "pattern_match_recognize_quant": 5,
    "pattern_match_recognize_skip_past": 6,
    "pattern_match_recognize_skip_to": 6,
    "pattern_match_recognize_star": 6,
    "pattern_match_recognize_unmatched": 5,
    "pattern_match_recognize_vshape": 6,
    "pipeline_bpe_pair_counts": 6,
    "pipeline_column_profile": 5,
    "pipeline_context_chunking": 6,
    "pipeline_corpus_curation": 4,
    "pipeline_data_mixture": 3,
    "pipeline_decontaminate": 6,
    "pipeline_deterministic_shuffle": 4,
    "pipeline_importance_weights": 6,
    "pipeline_incremental_dedup": 5,
    "pipeline_incremental_near_dedup": 6,
    "pipeline_neardup_prune": 3,
    "pipeline_pii_redaction": 6,
    "pipeline_quota_cap": 5,
    "pipeline_semdedup": 6,
    "pipeline_sequence_packing": 3,
    "pipeline_stratified_sample": 4,
    "pipeline_stratified_sample_scalable": 5,
    "pipeline_train_val_split": 4,
    "q10_returned_items": 5,
    "q11_important_stock": 3,
    "q12_priority_by_linestatus": 5,
    "q13_customer_distribution": 3,
    "q14_promo_revenue": 5,
    "q15_top_supplier": 3,
    "q16_supplier_part_counts": 3,
    "q17_small_quantity_revenue": 3,
    "q18_large_volume_customer": 5,
    "q19_disjunctive_predicates": 5,
    "q20_excess_shippers": 3,
    "q21_waiting_supplier": 3,
    "q22_dormant_accounts": 5,
    "q2_min_cost_supplier": 3,
    "q3_shipping_priority": 4,
    "q4_order_priority": 5,
    "q5_region_revenue": 5,
    "q6_forecast_revenue": 3,
    "q7_nation_volume": 5,
    "q8_market_share": 3,
    "q9_product_type_profit": 3,
    "s1_router_upsert_aggregate": 4,
    "s1_upsert_latest_per_key": 4,
    "s2_customers_keyed_projection": 4,
    "s4_products_keyed_projection": 4,
    "s6_orders_enriched_join": 4,
    "s7_schema_evolution_cast": 4,
    "scalar_array_advanced": 3,
    "scalar_array_struct": 6,
    "scalar_bitwise": 6,
    "scalar_conditional": 6,
    "scalar_datetime": 6,
    "scalar_datetime_extended": 6,
    "scalar_decimal_arithmetic": 3,
    "scalar_edit_distance_hash": 6,
    "scalar_json": 6,
    "scalar_json_struct": 6,
    "scalar_map_functions": 6,
    "scalar_math": 3,
    "scalar_null_semantics": 6,
    "scalar_string": 6,
    "scalar_string_datetime_extras": 2,
    "scalar_string_extended": 2,
    "scalar_subquery_above_avg": 5,
    "sim_ann_ivf": 4,
    "sim_ann_ivf_exhaustive": 6,
    "sim_ann_lsh": 4,
    "sim_ann_pq": 6,
    "sim_ann_pq_exhaustive": 6,
    "sim_threshold_pairs_blocked": 4,
    "sim_topk_bruteforce": 4,
    "text_bpe_token_count": 2,
    "text_fingerprint": 2,
    "text_lang_source_rollup": 2,
    "text_langid_heuristic": 5,
    "text_quality_score": 5,
    "text_repetition_filter": 2,
    "text_tfidf_topk": 6,
    "text_token_stats": 5,
    "text_vocabulary_topk": 2,
    "topn_per_group": 2,
    "topn_with_ties": 3,
    "udtf_explode_tokens": 3,
    "union_all": 2,
    "union_distinct": 2,
    "values_constant_relation": 2,
    "window_cumulate": 4,
    "window_dedup_first": 5,
    "window_dedup_sql": 6,
    "window_distinct_users": 4,
    "window_hop": 4,
    "window_join": 4,
    "window_over_time_range": 4,
    "window_session": 4,
    "window_session_sql": 4,
    "window_topn": 5,
    "window_topn_sql": 6,
    "window_tumble": 4,
}

def _driver_row_green(row) -> bool:
    """A green driver row: hash-match with no error, or a rows-only row
    (no oracle registered) whose Spark run succeeded. Mirrors
    scripts/update_driver_verified.py::green exactly."""
    if not isinstance(row, dict):
        return False
    if row.get("err") is None:
        return bool(
            row.get("hash_match")
            or (
                row.get("oracle_rows") in (-1, None)
                and row.get("rows_match") is not False
            )
        )
    return row.get("err") == "no_oracle" and row.get("spark_rows") is not None


def _load_driver_last_green() -> dict[str, int]:
    """Rebuild the last-green-round table from the driver's committed
    CORRECTNESS_r*.json artifacts (repo root = two levels above this file).

    Falls back to the frozen dict if no artifact parses — the rotation is
    then stale but still well-ordered. This makes the round-open refresh
    structural: the only required step is committing the new artifact,
    which the round-close checklist already does.
    """
    import re as _re
    from pathlib import Path

    root = Path(__file__).resolve().parent.parent
    last_green: dict[str, int] = {}
    found = False
    for path in sorted(root.glob("CORRECTNESS_r*.json")):
        m = _re.search(r"_r(\d+)", path.name)
        if not m:
            continue
        try:
            with open(path) as fh:
                doc = _json.load(fh)
        except (OSError, ValueError):
            continue
        if not isinstance(doc, dict):
            continue
        found = True
        rnd = int(m.group(1))
        for name, row in doc.items():
            if _driver_row_green(row):
                last_green[name] = max(last_green.get(name, 0), rnd)
    if not found or not last_green:
        return dict(_DRIVER_LAST_GREEN_FALLBACK)
    return last_green


_DRIVER_LAST_GREEN = _load_driver_last_green()
_DRIVER_VERIFIED = frozenset(_DRIVER_LAST_GREEN)


def _load_attested() -> dict[str, str]:
    """registry name -> spec hash attested by its last green driver row
    (committed DRIVER_ATTESTED.json; refreshed at round open by
    scripts/refresh_attested.py). Missing/unreadable file -> empty dict,
    i.e. every entry conservatively counts as changed-since-evidence."""
    from pathlib import Path

    path = Path(__file__).resolve().parent.parent / "DRIVER_ATTESTED.json"
    try:
        with open(path) as fh:
            doc = _json.load(fh)
    except (OSError, ValueError):
        return {}
    if not isinstance(doc, dict):
        return {}
    return {
        k: v["spec_hash"]
        for k, v in doc.items()
        if isinstance(v, dict) and isinstance(v.get("spec_hash"), str)
    }


#: memo for spec_closure_sources keyed on the function object — sources
#: cannot change within one interpreter session (inspect reads the file
#: once at import), so the cache is sound and keeps the per-round
#: _stale_entries pass over ~200 entries cheap.
_CLOSURE_CACHE: dict[int, str] = {}

#: traversal bound for the helper closure. Deep enough for every real
#: chain in the package (entry fn -> private module helper -> _util
#: helper -> fixtures loader is depth 4); the cap only exists so a
#: pathological reference cycle cannot make hashing unbounded. r16:
#: referenced module-level constants enter ``seen`` too, so the bound
#: grew with them (they are leaves — each costs one slot, no traversal).
_CLOSURE_MAX_FNS = 256


#: per-module map of top-level constant assignments: module name ->
#: {name: assignment source text}. Parsed once per module via ast (the
#: assignment TEXT, not the runtime value — env-derived constants like
#: session.DEFAULT_SF_DIR evaluate differently per driver invocation,
#: and hashing their values would flap every entry's spec hash between
#: SF runs; the text is stable and still changes whenever a constant
#: is EDITED, which is the r15 audit hole being closed).
_MODULE_CONST_SRC: dict[str, dict[str, str]] = {}


def _module_const_sources(module_name: str) -> dict[str, str]:
    cached = _MODULE_CONST_SRC.get(module_name)
    if cached is not None:
        return cached
    import ast
    import inspect
    import sys

    out: dict[str, str] = {}
    mod = sys.modules.get(module_name)
    try:
        src = inspect.getsource(mod)
        tree = ast.parse(src)
    except (OSError, TypeError, SyntaxError, ValueError):
        _MODULE_CONST_SRC[module_name] = out
        return out
    for node in tree.body:
        names: list[str] = []
        if isinstance(node, ast.Assign):
            names = [
                t.id for t in node.targets if isinstance(t, ast.Name)
            ]
        elif isinstance(node, ast.AnnAssign) and isinstance(
            node.target, ast.Name
        ):
            names = [node.target.id]
        if not names:
            continue
        seg = ast.get_source_segment(src, node) or ""
        for n in names:
            out[n] = seg
    _MODULE_CONST_SRC[module_name] = out
    return out


def spec_closure_sources(fn) -> str:
    """Concatenated source of ``fn`` plus every package-local function it
    references, transitively (BFS, deterministic order, bounded) — and,
    since r16, the ASSIGNMENT SOURCE of every module-level constant a
    visited function references (VERDICT r15 Wrong #2: a
    behavior-bearing constant edit — _DRIVER_FINISH_EDGES, WINNOW_DF_CAP
    — changed results or plan paths without changing any hashed source,
    so the entry did not re-front the driver sample).

    Why a closure and not just ``inspect.getsource(fn)``: driver evidence
    attests the BEHAVIOR of an entry, and that behavior lives partly in
    shared helpers — ``_util.fan_out`` (plan shape), ``_util.dsum``
    (aggregation determinism), ``sources.fixtures.load_fixture`` (what
    the scan even reads). Hashing only the entry function's own text let
    a helper edit ride every caller's stale green evidence — exactly the
    r13 staleness hole, one level down (found in r15 while replanning
    fan_out: 28 call sites, zero of which would have re-fronted).

    Resolution is by the function's own global namespace (``__globals__``)
    so only names the entry can actually call are followed; functions
    outside this package (pyspark, stdlib) are skipped — their versions
    are environment, not definition. Order is BFS with sorted referenced
    names, so the hash is deterministic across interpreter runs.
    """
    import inspect
    import re
    from collections import deque

    def _src(f) -> str:
        try:
            return inspect.getsource(f)
        except (OSError, TypeError):
            return f"{f.__module__}.{getattr(f, '__qualname__', repr(f))}"

    pkg = __name__.rsplit(".", 1)[0]
    cached = _CLOSURE_CACHE.get(id(fn))
    if cached is not None:
        return cached
    seen: dict[str, str] = {}
    queue = deque([fn])
    while queue and len(seen) < _CLOSURE_MAX_FNS:
        f = queue.popleft()
        key = f"{f.__module__}.{f.__qualname__}"
        if key in seen:
            continue
        src = _src(f)
        seen[key] = src
        g = getattr(f, "__globals__", None) or {}
        fmod = f.__module__ or ""
        consts = (
            _module_const_sources(fmod) if fmod.startswith(pkg) else {}
        )
        for ref in sorted(set(re.findall(r"[A-Za-z_]\w*", src))):
            obj = g.get(ref)
            if (
                obj is not None
                and inspect.isfunction(obj)
                and (obj.__module__ or "").startswith(pkg)
            ):
                queue.append(obj)
            elif ref in consts and not (
                inspect.isfunction(obj)
                or inspect.isclass(obj)
                or inspect.ismodule(obj)
            ):
                # module-level constant assignment: hash its TEXT
                seen.setdefault(f"{fmod}::{ref}", consts[ref])
    out = "\x00".join(f"{k}\x01{seen[k]}" for k in sorted(seen))
    _CLOSURE_CACHE[id(fn)] = out
    return out


def entry_spec_hash(name: str) -> str:
    """Canonical hash of WHAT a driver row for ``name`` attests: for a
    fold suite, its member composition + member oracles/sources
    (queries.folds.spec_hash); for a regular entry, its oracle SQL +
    implementation source INCLUDING every package-local helper the
    implementation reaches (spec_closure_sources — so a replanned shared
    helper voids its callers' evidence, not just edits to the entry fn
    itself). Conservative by design — a docstring-only edit re-fronts
    the entry for one round, which costs one rotation slot; a semantic
    change riding stale evidence costs a correctness hole (VERDICT
    r13 #1)."""
    import hashlib

    try:
        from .queries import folds
    except Exception:  # pragma: no cover - folds import is load-bearing
        folds = None
    if folds is not None and name in folds.SPECS:
        return folds.spec_hash(name)
    e = _REGISTRY[name]
    payload = "\x00\x00".join((name, e.oracle or "", spec_closure_sources(e.fn)))
    return hashlib.sha256(payload.encode()).hexdigest()


def _stale_entries(names, attested: dict[str, str] | None = None) -> set[str]:
    """Driver-facing entries whose CURRENT definition differs from the
    one their last green driver row attested (VERDICT r13 #1,
    generalized past folds in r14: ANY changed query — new fold member,
    replanned implementation, edited oracle — must void its evidence,
    or the new definition rides stale green for up to 3 rounds).
    Returns names to treat as never-verified in _driver_order. A name
    absent from DRIVER_ATTESTED.json counts as stale, which is a no-op
    for truly-fresh names (they are already unverified) and
    conservative for everything else."""
    if attested is None:
        attested = _load_attested()
    name_set = set(names)
    stale = {
        n
        for n in names
        if n in _DRIVER_VERIFIED and attested.get(n) != entry_spec_hash(n)
    }
    # closure over rows-only/exact companion pairs: a rows-only row's
    # correctness leans on its exact companion being green ON THE SAME
    # DATA (VERDICT r12 #5), so a stale member pulls its partner into
    # the same round's sample rather than leaving it in the tail.
    # Iterated to a FIXPOINT (r14 ADVICE): one exact companion can serve
    # several rows-only partners (agg_count_distinct serves both
    # agg_approx_count_distinct and agg_hll_mergeable_sketch), and a
    # single dict pass was order-dependent — a stale partner listed
    # later pulled the exact in, but siblings iterated earlier were
    # never revisited, so co-sampling was only partially honored.
    while True:
        added = set()
        for ro, ex in _ROWS_ONLY_COMPANION.items():
            if (ro in stale) != (ex in stale):
                added |= {
                    n
                    for n in (ro, ex)
                    if n in name_set and n in _DRIVER_VERIFIED and n not in stale
                }
        if not added:
            return stale
        stale |= added

# Heaviest cold plans (persist in the pipeline, wide literal expression
# trees in the similarity family). Within the FRESH (never-driver-checked)
# batch they run last so a per-query stall cannot starve smaller checks;
# once verified they rotate with everyone else (their last-green round
# already orders them).
_DRIVER_HEAVY_TAIL = (
    "pipeline_corpus_curation",
    "sim_topk_bruteforce",
    "sim_threshold_pairs_blocked",
    "sim_ann_lsh",
    "sim_ann_ivf",
    "sim_ann_pq",
    "pipeline_incremental_near_dedup",  # 8x md5 per shingle, both engines
    "pipeline_semdedup",  # iterative label propagation + 64-dim cosine join
    "sim_ann_ivf_exhaustive",  # full-corpus probe by design
    "sim_ann_pq_exhaustive",  # full-corpus rerank by design
)


#: rows-only approximations paired with their hash-checked EXACT
#: companions (VERDICT r12 #5): the rotation sorts each pair by the
#: pair's OLDEST evidence and keeps the two adjacent, so any sampled
#: round that re-attests the rows-only row also re-attests the exact
#: row its correctness argument leans on.
_ROWS_ONLY_COMPANION = {
    "agg_approx_count_distinct": "agg_count_distinct",
    "agg_heavy_hitters_merge": "agg_heavy_hitters_merge_exact",
    "agg_hll_mergeable_sketch": "agg_count_distinct",
    "agg_quantile_sketch_merge": "agg_percentile_disc",
    "dedup_minhash_lsh": "dedup_minhash_lsh_exact",
    "dedup_simhash_hamming": "dedup_simhash_hamming_exact",
    "pandas_grouped_zscore": "pandas_grouped_zscore_rounded",
    "pandas_udf_entropy": "pandas_udf_entropy_rounded",
    "sim_ann_ivf": "sim_ann_ivf_exhaustive",
    "sim_ann_ivfpq": "sim_ann_ivfpq_exhaustive",
    "sim_ann_lsh": "sim_ann_lsh_recall",
    "sim_ann_pq": "sim_ann_pq_exhaustive",
}


def _pair_id(n: str) -> str:
    """Canonical group key: a rows-only name groups under its EXACT
    companion (two approximations may share one exact — e.g. HLL and
    approx_count_distinct both lean on agg_count_distinct); unpaired
    names are their own group."""
    return _ROWS_ONLY_COMPANION.get(n, n)


def _driver_order(names) -> list[str]:
    # an entry whose definition changed since its last green row is
    # FRESH, not verified — its evidence no longer covers its current
    # definition (VERDICT r13 #1; generalized to all entries in r14)
    stale = _stale_entries(names)
    fresh = [
        n
        for n in names
        if (n not in _DRIVER_VERIFIED or n in stale)
        and n not in _DRIVER_HEAVY_TAIL
    ]
    # oracle-paired entries first within the fresh batch: a green
    # hash-match row is stronger evidence than a rows-only row, so if the
    # driver's per-run budget truncates, it truncates the weaker checks
    oracled = {k for k in _REGISTRY if _REGISTRY[k].oracle is not None}
    fresh.sort(key=lambda n: n not in oracled)
    fresh_heavy = [
        n
        for n in _DRIVER_HEAVY_TAIL
        if n in names and (n not in _DRIVER_VERIFIED or n in stale)
    ]
    # Verified tail: oldest driver evidence first (ascending last-green
    # round, name as tiebreak for determinism), so the ~45 re-verification
    # slots behind the fresh batch cycle through every entry as the
    # testdata regenerates underneath us. Rows-only/exact companion
    # pairs sort as ONE unit on the pair's oldest evidence (exact
    # member first — it carries the hash) so they are always co-sampled.
    name_set = set(names)
    group_members: dict[str, list[str]] = {}
    for ro, ex in _ROWS_ONLY_COMPANION.items():
        group_members.setdefault(ex, [ex]).append(ro)

    def _tail_key(n: str):
        gid = _pair_id(n)
        members = group_members.get(gid, [gid])
        oldest = min(
            (
                _DRIVER_LAST_GREEN[m]
                for m in members
                if m in name_set and m in _DRIVER_VERIFIED
            ),
            default=_DRIVER_LAST_GREEN[n],
        )
        # exact companion (the hash evidence) leads its group
        return (oldest, gid, n != gid, n)

    verified = sorted(
        (n for n in names if n in _DRIVER_VERIFIED and n not in stale),
        key=_tail_key,
    )
    return fresh + fresh_heavy + verified


def all_queries() -> dict[str, SparkQuery]:
    """EVERY registered query, fold members included (bench, scale runs,
    tests/test_oracle_parity.py)."""
    _load_all()
    return {k: _REGISTRY[k].fn for k in _driver_order(_REGISTRY)}


def all_oracles() -> dict[str, str]:
    _load_all()
    return {
        k: _REGISTRY[k].oracle
        for k in _driver_order(_REGISTRY)
        if _REGISTRY[k].oracle is not None
    }


def driver_queries() -> dict[str, SparkQuery]:
    """The driver-facing contract (__spark_entry__.queries()): fold
    members excluded — each is attested through its fold's single
    hash-checked row instead of an individual rotation slot.

    Rotation headroom (VERDICT r11 #3): the driver records ~50 rows per
    round, and evidence older than current-4 rounds is stale by the
    repo's own guard. 236 individual names = 4.7-round cycle (saturated).
    With the queries/folds.py suites folding 49 near-duplicate shapes
    into 7 suite rows, the driver-facing count stays <= 200, i.e. a
    <= 4-round full recheck -> oldest evidence >= current-3, one full
    round of slack under the guard even as new operators land.
    tests/test_registry_rotation.py::test_driver_count_keeps_headroom
    enforces the <= 200 bound structurally.
    """
    _load_all()
    return {
        k: _REGISTRY[k].fn
        for k in _driver_order(
            [n for n in _REGISTRY if _REGISTRY[n].driver]
        )
    }


def driver_oracles() -> dict[str, str]:
    _load_all()
    return {
        k: _REGISTRY[k].oracle
        for k in _driver_order(
            [n for n in _REGISTRY if _REGISTRY[n].driver]
        )
        if _REGISTRY[k].oracle is not None
    }


_LOADED = False


def _load_all() -> None:
    """Import every query module exactly once (they self-register)."""
    global _LOADED
    if _LOADED:
        return
    from .queries import (  # noqa: F401
        aggregates,
        analytic,
        attested,
        composite,
        joins,
        llm_ann_recall,
        llm_dedup,
        llm_pipeline,
        llm_similarity,
        llm_text,
        multimodal,
        relational,
        scalar_fns,
        time_windows,
        tpch_more,
        udf_surface,
    )

    # folds must import AFTER the member modules above: building each
    # fold's oracle reads the members' registered oracle SQL
    from .queries import folds  # noqa: F401

    _LOADED = True
