"""Unit tests for plans/match_recognize._grouped_apply — the group-aware
mapInPandas wrapper every batch CEP matcher runs through (round 13).

The wrapper's contract mirrors groupBy().applyInPandas: the per-key
function sees each key's COMPLETE rows exactly once, including when

- a key's rows straddle two Arrow batches (forced here by shrinking
  spark.sql.execution.arrow.maxRecordsPerBatch below the key size),
- the partition key contains NULLs (one group, like GROUP BY/keyBy),
- a partition is empty or holds a single key.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from training_flink_sql_cc_src_spark.plans.match_recognize import (
    _grouped_apply,
)

SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_rows", T.LongType()),
        T.StructField("v_sum", T.LongType()),
    ]
)


def _make_summary():
    """Factory so the function pickles BY VALUE (cloudpickle ships a
    module-top-level function by reference, which executors cannot
    import for a test module)."""

    def _per_key_summary(pdf: pd.DataFrame) -> pd.DataFrame:
        # one output row per invocation: detects double-delivery of a
        # key (two invocations -> two rows for the same user_id)
        uid = pdf["user_id"].iloc[0]
        uid = None if pd.isna(uid) else int(uid)
        return pd.DataFrame(
            {
                "user_id": [uid],
                "n_rows": [len(pdf)],
                "v_sum": [int(pdf["v"].sum())],
            }
        )

    return _per_key_summary


def _run(spark, df):
    out = _grouped_apply(df, ["user_id"], _make_summary(), SCHEMA)
    return sorted(
        ((r.user_id, r.n_rows, r.v_sum) for r in out.collect()),
        key=lambda t_: (t_[0] is None, t_[0]),
    )


def test_keys_straddling_arrow_batches_are_carried(spark):
    """80-row keys with a 16-row Arrow batch ceiling: every key spans
    ~5 batches, so the carry path runs constantly. Each key must be
    delivered exactly once and complete."""
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "16")
    try:
        df = spark.range(400).select(
            (F.col("id") % 5).alias("user_id"), F.col("id").alias("v")
        )
        got = _run(spark, df)
        # per key: 80 rows; v_sum = sum of ids with id % 5 == k
        expect = []
        for k in range(5):
            ids = [i for i in range(400) if i % 5 == k]
            expect.append((k, len(ids), sum(ids)))
        assert got == expect
    finally:
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", old
        )


def test_null_partition_key_is_one_group(spark):
    """NULL keys form ONE group (GROUP BY semantics), never one group
    per null row."""
    rows = [(None, 1), (None, 2), (None, 4), (7, 10), (7, 20)]
    df = spark.createDataFrame(rows, "user_id long, v long")
    got = _run(spark, df)
    assert got == [(7, 2, 30), (None, 3, 7)]


def test_single_key_and_empty_result(spark):
    """A single-key frame exercises the 'carry everything' path (no
    group boundary inside any batch until end-of-stream)."""
    df = spark.createDataFrame([(3, 5), (3, 6)], "user_id long, v long")
    assert _run(spark, df) == [(3, 2, 11)]


def test_function_returning_empty_frames_yields_empty(spark):
    def drop_all(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"user_id": [], "n_rows": [], "v_sum": []})


    df = spark.createDataFrame([(1, 1), (2, 2)], "user_id long, v long")
    out = _grouped_apply(df, ["user_id"], drop_all, SCHEMA)
    assert out.count() == 0


def test_matches_apply_in_pandas_reference(spark):
    """Differential check against groupBy().applyInPandas on a frame
    with many keys of varied sizes."""
    import random

    rng = random.Random(13)
    rows = []
    for uid in range(37):
        for _ in range(rng.randrange(1, 12)):
            rows.append((uid, rng.randrange(1000)))
    df = spark.createDataFrame(rows, "user_id long, v long")
    got = _run(spark, df)
    ref = sorted(
        (
            (r.user_id, r.n_rows, r.v_sum)
            for r in df.groupBy("user_id")
            .applyInPandas(_make_summary(), SCHEMA)
            .collect()
        ),
        key=lambda t_: (t_[0] is None, t_[0]),
    )
    assert got == ref


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
