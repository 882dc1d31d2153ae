"""The core correctness gate replicated as pytest: every registered query
must match its DuckDB oracle exactly at sf0.001 (row count + columns +
order-insensitive values). The driver runs the same comparison at sf0.01;
scripts/check_parity.py covers that interactively.
"""

from __future__ import annotations

import pytest

from oracle_harness import compare_one

from training_flink_sql_cc_src_spark.registry import all_oracles, all_queries

QUERIES = all_queries()
ORACLES = all_oracles()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, sf_small, name):
    res = compare_one(spark, name, QUERIES[name], ORACLES.get(name), sf_small)
    assert res.ok, f"{res.detail} {res.mismatches[:2]}"
    assert res.spark_rows >= 0


def test_every_oracle_has_query():
    assert not set(ORACLES) - set(QUERIES)


def test_entry_contract(spark):
    import __spark_entry__ as mod

    df = mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == [
        "order_id",
        "line_number",
        "customer_name",
        "segment",
        "brand",
        "model",
        "sale_price",
        "quantity",
    ]
