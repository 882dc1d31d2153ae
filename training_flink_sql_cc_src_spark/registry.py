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

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass
class Entry:
    fn: SparkQuery
    oracle: str | None
    doc: str = ""


_REGISTRY: dict[str, Entry] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: register a (spark_fn, oracle_sql) pair under ``name``."""

    def deco(fn: SparkQuery) -> SparkQuery:
        _REGISTRY[name] = Entry(fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


# Names with a FINAL driver-recorded row in CORRECTNESS_r01.json (green or
# declared rows-only). The round-1 driver run recorded only the first ~50
# registry entries in iteration order, so round 2 front-loads the queries
# that still lack driver evidence and pushes these to the back. Rotate per
# round until every entry has a green driver row.
_DRIVER_VERIFIED_R01 = frozenset({
    "agg_pricing_summary", "agg_count_distinct", "agg_having", "agg_rollup",
    "agg_cube", "agg_grouping_sets", "agg_approx_count_distinct",
    "agg_global_no_groupby", "agg_percentile_disc", "agg_string_agg",
    "agg_variance_covar_manual", "agg_pivot_conditional", "agg_bool_bitwise",
    "agg_hll_mergeable_sketch", "analytic_ranking", "analytic_offset",
    "analytic_first_last_frames", "analytic_distribution",
    "s2_customers_keyed_projection", "s4_products_keyed_projection",
    "s6_orders_enriched_join", "s7_schema_evolution_cast",
    "s1_upsert_latest_per_key", "q3_shipping_priority", "q5_region_revenue",
    "q10_returned_items", "q4_order_priority", "scalar_subquery_above_avg",
    "q7_nation_volume", "q12_priority_by_linestatus", "q14_promo_revenue",
    "q18_large_volume_customer", "q19_disjunctive_predicates",
    "q22_dormant_accounts", "join_left_outer", "join_full_outer",
    "join_semi", "join_anti", "join_theta_band", "join_interval",
    "join_asof_temporal", "join_range_bucketed", "dedup_exact_text",
    "dedup_jaccard_blocked_pairs", "dedup_minhash_lsh",
    "dedup_simhash_hamming", "text_token_stats", "text_quality_score",
    "text_langid_heuristic",
})

# Queries the round-1 driver attempted but never recorded (heaviest cold
# plans: persist in the pipeline, wide literal expression trees in the
# similarity family). They go after the never-attempted batch so a
# per-query stall cannot starve the rest of the run.
_DRIVER_SKIPPED_R01 = (
    "pipeline_corpus_curation",
    "sim_topk_bruteforce",
    "sim_threshold_pairs_blocked",
    "sim_ann_lsh",
    "sim_ann_ivf",
)


def _driver_order(names) -> list[str]:
    fresh = [
        n
        for n in names
        if n not in _DRIVER_VERIFIED_R01 and n not in _DRIVER_SKIPPED_R01
    ]
    # oracle-paired entries first within the fresh batch: a green
    # hash-match row is stronger evidence than a rows-only row, so if the
    # driver's per-run budget truncates, it truncates the weaker checks
    oracled = {k for k in _REGISTRY if _REGISTRY[k].oracle is not None}
    fresh.sort(key=lambda n: n not in oracled)
    skipped = [n for n in _DRIVER_SKIPPED_R01 if n in names]
    verified = [n for n in names if n in _DRIVER_VERIFIED_R01]
    return fresh + skipped + verified


def all_queries() -> dict[str, SparkQuery]:
    _load_all()
    return {k: _REGISTRY[k].fn for k in _driver_order(_REGISTRY)}


def all_oracles() -> dict[str, str]:
    _load_all()
    return {
        k: _REGISTRY[k].oracle
        for k in _driver_order(_REGISTRY)
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

    _LOADED = True
