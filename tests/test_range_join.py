"""range_bucket_join: result-equivalence against the nested-loop
formulation, boundary inclusivity, and the plan guarantee (hash join on
the derived bucket key, never a nested loop)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from training_flink_sql_cc_src_spark.operators.range_join import range_bucket_join
from training_flink_sql_cc_src_spark.queries._util import t


def _mk(spark, rows, name):
    return spark.createDataFrame(
        [(i, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)) for i, s in rows],
        schema=f"{name}_id long, {name}_ts timestamp",
    )


def test_equivalence_vs_nested_loop(spark):
    # timestamps engineered around bucket boundaries: width = 600s,
    # offsets at exact multiples, one second off, and sub-bucket jitter
    left = _mk(spark, [(i, s) for i, s in enumerate(range(0, 3600, 37))], "l")
    right = _mk(spark, [(i, s) for i, s in enumerate(range(5, 3600, 53))], "r")
    got = {
        (r.l_id, r.r_id)
        for r in range_bucket_join(
            left, right, "l_ts", "r_ts", lower_s=-600, upper_s=0
        ).collect()
    }
    want = {
        (r.l_id, r.r_id)
        for r in left.crossJoin(right)
        .filter(
            (F.col("r_ts") >= F.col("l_ts") - F.expr("INTERVAL 600 SECONDS"))
            & (F.col("r_ts") <= F.col("l_ts"))
        )
        .collect()
    }
    assert got == want and len(want) > 0


def test_boundaries_inclusive(spark):
    left = _mk(spark, [(0, 1000)], "l")
    right = _mk(spark, [(0, 400), (1, 399), (2, 1000), (3, 1001)], "r")
    got = {
        r.r_id
        for r in range_bucket_join(
            left, right, "l_ts", "r_ts", lower_s=-600, upper_s=0
        ).collect()
    }
    assert got == {0, 2}  # [ts-600, ts] inclusive on both ends


def test_plan_is_hash_join_not_nested_loop(spark, sf_med):
    ev = t(spark, sf_med, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), F.col("ts").alias("p_ts")
    )
    e = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"), F.col("ts").alias("e_ts")
    )
    df = range_bucket_join(p, e, "p_ts", "e_ts", lower_s=-600, upper_s=0)
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = df._jdf.queryExecution().explainString(mode)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Join" in plan  # equi join on __rbucket
