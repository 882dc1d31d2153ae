"""Scale smoke: replicate the sf0.1 fact table ~8x (≈5M lineitem rows)
and prove the headline plans still complete with sane shapes — the
closest a single box gets to "would this survive a scale-up". The
replicated union is a TEST HARNESS artifact (tagged copies of the same
fixture), not synthesized query input: correctness is still pinned by the
oracle parity suite; this file only checks behavior under data growth.

What growth must NOT change (and these assert):
- the fact side is never broadcast (AQE may broadcast true dims only)
- aggregation stays partial+final (map-side combine present)
- Top-N keeps the WindowGroupLimit rank pushdown
- results scale exactly linearly for replication-invariant queries
  (group-by keys unchanged -> counts x8)
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from training_flink_sql_cc_src_spark.queries._util import dsum, t

REPL = 8


@pytest.fixture(scope="module")
def big_li(spark, sf_med):
    li = t(spark, sf_med, "lineitem")
    out = li
    for i in range(1, REPL):
        # distinct orderkey space per replica so join/group cardinality
        # actually grows (not just row multiplicity)
        out = out.unionByName(
            li.withColumn(
                "l_orderkey", F.col("l_orderkey") + F.lit(i * 10_000_000)
            )
        )
    return out


def test_big_agg_scales_linearly(spark, big_li, sf_med):
    base = (
        t(spark, sf_med, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"), dsum("l_quantity").alias("q"))
    )
    big = big_li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"), dsum("l_quantity").alias("q")
    )
    plan = big._jdf.queryExecution().executedPlan().toString()
    assert plan.count("HashAggregate") >= 2  # partial + final survives
    b = {(r.l_returnflag, r.l_linestatus): (r.n, r.q) for r in base.collect()}
    g = {(r.l_returnflag, r.l_linestatus): (r.n, r.q) for r in big.collect()}
    assert set(b) == set(g)
    for k, (n, q) in b.items():
        assert g[k][0] == n * REPL
        assert abs(g[k][1] - q * REPL) < 1e-6


def test_big_join_never_broadcasts_fact(spark, big_li, sf_med):
    """orders⋈big_lineitem: whatever AQE picks, the 5M-row fact side must
    not be the broadcast side."""
    o = t(spark, sf_med, "orders").select("o_orderkey", "o_orderdate")
    j = (
        big_li.join(o, big_li.l_orderkey == o.o_orderkey, "left")
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    rows = {r.l_returnflag: r.n for r in j.collect()}
    total = sum(rows.values())
    assert total == big_li.count()
    plan = j._jdf.queryExecution().executedPlan().toString()
    # the fact is the LEFT side: any broadcast join must build RIGHT
    # (the dim); a BuildLeft would ship the 5M-row fact to every task
    assert "BuildLeft" not in plan
    for line in plan.splitlines():
        if "BroadcastHashJoin" in line:
            assert "BuildRight" in line


def test_big_topn_keeps_rank_pushdown(spark, big_li):
    from pyspark.sql import Window

    w = Window.partitionBy("l_returnflag").orderBy(
        F.col("l_extendedprice").desc(), F.col("l_orderkey")
    )
    q = (
        big_li.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("l_returnflag", "l_extendedprice", "rn")
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan  # rank pushdown: per-partition top-k
    assert q.count() == 3 * 5 or q.count() == len(
        [r.l_returnflag for r in q.select("l_returnflag").distinct().collect()]
    ) * 5


def test_big_match_recognize_scales_linearly(spark, sf_med):
    """CEP under data growth: replicating events 8x across disjoint user
    spaces must scale the match count exactly 8x (matches are per-user,
    replication-invariant) and keep the single-window-exchange plan."""
    from training_flink_sql_cc_src_spark.plans.router import StatementRouter

    ev = t(spark, sf_med, "events")
    big = ev
    for i in range(1, REPL):
        big = big.unionByName(
            ev.withColumn("user_id", F.col("user_id") + F.lit(i * 10_000_000))
        )
    stmt = """
        SELECT user_id, CAST(a_ts AS LONG) AS a_e FROM {tbl}
        MATCH_RECOGNIZE (
            PARTITION BY user_id
            ORDER BY ts, event_id
            MEASURES A.ts AS a_ts, B.ts AS b_ts
            ONE ROW PER MATCH
            AFTER MATCH SKIP PAST LAST ROW
            PATTERN (A B)
            WITHIN INTERVAL '1' HOUR
            DEFINE A AS A.event_type = 'view',
                   B AS B.event_type = 'click'
        )
    """
    ev.createOrReplaceTempView("__mr_scale_base")
    big.createOrReplaceTempView("__mr_scale_big")
    r = StatementRouter(spark)
    n_base = r.execute(stmt.format(tbl="__mr_scale_base")).count()
    big_df = r.execute(stmt.format(tbl="__mr_scale_big"))
    assert big_df.count() == n_base * REPL and n_base > 0
    plan = big_df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") - plan.count("ReusedExchange") <= 2
    assert "CartesianProduct" not in plan
