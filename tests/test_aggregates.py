"""Aggregate-family tests beyond the oracle gate: approx_count_distinct
accuracy (its oracle is intentionally absent — HLL++ is engine-specific)."""

from __future__ import annotations

from pyspark.sql import functions as F

from training_flink_sql_cc_src_spark.queries._util import t
from training_flink_sql_cc_src_spark.registry import all_queries

QUERIES = all_queries()


def test_approx_count_distinct_accuracy(spark, sf_med):
    approx = {
        r.returnflag: (r.approx_orders, r.approx_parts)
        for r in QUERIES["agg_approx_count_distinct"](spark, sf_med).collect()
    }
    exact = {
        r.returnflag: (r.n_orders, r.n_parts)
        for r in (
            t(spark, sf_med, "lineitem")
            .groupBy(F.col("l_returnflag").alias("returnflag"))
            .agg(
                F.countDistinct("l_orderkey").alias("n_orders"),
                F.countDistinct("l_partkey").alias("n_parts"),
            )
        ).collect()
    }
    assert set(approx) == set(exact)
    for flag in exact:
        for a, e in zip(approx[flag], exact[flag]):
            assert abs(a - e) / e < 0.05, f"{flag}: {a} vs {e}"  # HLL++ rsd


def test_rollup_has_grand_total(spark, sf_med):
    rows = QUERIES["agg_rollup"](spark, sf_med).collect()
    grand = [r for r in rows if r.returnflag is None and r.linestatus is None]
    assert len(grand) == 1
    assert grand[0].n == t(spark, sf_med, "lineitem").count()


def test_manual_moments_match_builtin_corr(spark, sf_med):
    """The moment-sum construction (agg_variance_covar_manual) agrees with
    Spark's built-in var_pop/covar_pop/corr to float tolerance — the
    built-ins are the production path when cross-engine bit-equality is
    not required."""
    got = {
        r.returnflag: (r.mean_qty, r.var_pop_qty, r.cov_pop_qty_price)
        for r in QUERIES["agg_variance_covar_manual"](spark, sf_med).collect()
    }
    want = {
        r.returnflag: (r.m, r.v, r.c)
        for r in (
            t(spark, sf_med, "lineitem")
            .groupBy(F.col("l_returnflag").alias("returnflag"))
            .agg(
                F.avg("l_quantity").alias("m"),
                F.var_pop("l_quantity").alias("v"),
                F.covar_pop("l_quantity", "l_extendedprice").alias("c"),
            )
        ).collect()
    }
    for flag in want:
        for a, b in zip(got[flag], want[flag]):
            assert abs(a - b) <= 1e-6 * max(1.0, abs(b)), (flag, a, b)


def test_hll_estimate_within_error(spark, sf_med):
    """HLL sketch estimates (per-segment and merged-global) must sit within
    the theoretical error of the exact distinct counts: default lgConfigK=12
    gives ~1.6% relative standard error; assert 5 sigma."""
    rows = QUERIES["agg_hll_mergeable_sketch"](spark, sf_med).collect()
    exact_total = 0
    for r in rows:
        assert abs(r.estimate - r.exact_distinct) <= max(
            5, 0.08 * r.exact_distinct
        ), (r.segment, r.estimate, r.exact_distinct)
        exact_total += r.exact_distinct
    global_est = rows[0].global_estimate
    assert abs(global_est - exact_total) <= max(5, 0.08 * exact_total)


def test_quantile_sketch_merge_rank_error(spark, sf_small):
    """Merged-sketch median per lang must land within the exact p40–p60
    band (sketch rank error is 1/K = ~3% of mass; 10% band = slack for
    the per-segment percentile_approx error on tiny segments)."""
    from training_flink_sql_cc_src_spark.queries._util import t
    from training_flink_sql_cc_src_spark.registry import all_queries

    got = {
        r.lang: r.q50
        for r in all_queries()["agg_quantile_sketch_merge"](
            spark, sf_small
        ).collect()
    }
    d = t(spark, sf_small, "documents")
    import pyspark.sql.functions as F

    bands = {
        r.lang: (r.lo, r.hi)
        for r in d.groupBy("lang")
        .agg(
            F.percentile(F.col("n_chars"), F.lit(0.4)).alias("lo"),
            F.percentile(F.col("n_chars"), F.lit(0.6)).alias("hi"),
        )
        .collect()
    }
    assert set(got) == set(bands) and got
    for lang, v in got.items():
        lo, hi = bands[lang]
        assert lo <= v <= hi, f"{lang}: {v} outside [{lo}, {hi}]"


def test_heavy_hitters_merge_bounds(spark, sf_small):
    """Sketch-merged top users: (1) every returned estimate satisfies
    est <= true_count <= est + max_missed against exact counts; (2) with
    K large enough that no segment truncates, the merge recovers the
    exact global top-10."""
    import pyspark.sql.functions as F

    from training_flink_sql_cc_src_spark.operators.heavy_hitters import (
        heavy_hitter_sketch,
        merge_heavy_hitter_sketches,
    )
    from training_flink_sql_cc_src_spark.queries._util import t
    from training_flink_sql_cc_src_spark.registry import all_queries

    ev = t(spark, sf_small, "events")
    exact = {
        r.user_id: r.n
        for r in ev.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }

    got = all_queries()["agg_heavy_hitters_merge"](spark, sf_small).collect()
    assert len(got) == 10
    ests = [r.est for r in got]
    assert ests == sorted(ests, reverse=True)
    for r in got:
        true = exact[r.user_id]
        assert r.est <= true <= r.est + r.max_missed, (
            f"user {r.user_id}: est={r.est} missed={r.max_missed} true={true}"
        )

    # exact recovery at K >= distinct items per segment
    big_k = heavy_hitter_sketch(ev, ["event_type"], "user_id", k=10**6)
    merged = {
        r.item: (r.est, r.max_missed)
        for r in merge_heavy_hitter_sketches(big_k, [], top=10).collect()
    }
    want_top = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert {u: c for u, c in want_top} == {u: e for u, (e, _) in merged.items()}
    assert all(m == 0 for _, m in merged.values())
