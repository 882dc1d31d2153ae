"""Property test for the custom as-of join (SURVEY.md §4 item 2 — the one
genuinely hard operator): compare the union-tag merge implementation
against DuckDB's native ASOF JOIN on randomized keyed time series.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

from training_flink_sql_cc_src_spark.queries.joins import asof_join


def _random_series(seed: int):
    rng = np.random.RandomState(seed)
    n_left, n_right = 200, 150
    left = pd.DataFrame(
        {
            "k": rng.randint(0, 8, n_left),
            "lts": rng.randint(0, 10_000, n_left).astype("int64"),
            "lid": np.arange(n_left, dtype="int64"),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.randint(0, 8, n_right),
            "rts": rng.randint(0, 10_000, n_right).astype("int64"),
            "payload": rng.randint(0, 1_000_000, n_right).astype("int64"),
        }
    )
    # dedupe (k, rts) so "latest right at-or-before" is unique and the
    # comparison is well-defined under ties
    right = right.drop_duplicates(["k", "rts"]).reset_index(drop=True)
    return left, right


def test_asof_join_matches_duckdb(spark):
    for seed in (7, 42, 1337):
        left_pd, right_pd = _random_series(seed)
        left = spark.createDataFrame(left_pd)
        right = spark.createDataFrame(right_pd)
        ours = asof_join(
            left.withColumnRenamed("lts", "ts"),
            right.withColumnRenamed("rts", "ts"),
            key="k",
            left_ts="ts",
            right_ts="ts",
            right_payload=["payload"],
        )
        got = {
            (r.lid): r.payload for r in ours.collect()
        }
        con = duckdb.connect()
        con.register("l", left_pd)
        con.register("r", right_pd)
        want = {
            row[0]: row[1]
            for row in con.execute(
                """
                SELECT l.lid, r.payload
                FROM l ASOF LEFT JOIN r
                  ON l.k = r.k AND l.lts >= r.rts
                """
            ).fetchall()
        }
        con.close()
        assert got == want, f"seed {seed}: {len(got)} vs {len(want)}"
