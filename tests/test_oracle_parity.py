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


def test_harness_detects_mismatches(spark, sf_small):
    """Meta-test: the parity gate must be able to FAIL. Deliberately wrong
    Spark functions against a correct oracle must be flagged for each
    mismatch class (values, row count, schema, unhashable output) — a
    gate that cannot fail verifies nothing."""
    from pyspark.sql import functions as F

    from tests.oracle_harness import compare_one
    from training_flink_sql_cc_src_spark.queries._util import t

    oracle = "SELECT o_orderstatus AS status, COUNT(*) AS n FROM orders GROUP BY 1"

    def right(sp, d):
        return (
            t(sp, d, "orders")
            .groupBy(F.col("o_orderstatus").alias("status"))
            .agg(F.count(F.lit(1)).alias("n"))
        )

    assert compare_one(spark, "meta_ok", right, oracle, sf_small).ok

    def wrong_values(sp, d):
        return right(sp, d).withColumn("n", F.col("n") + 1)

    r = compare_one(spark, "meta_vals", wrong_values, oracle, sf_small)
    assert not r.ok and r.detail == "VALUE MISMATCH"

    def wrong_rows(sp, d):
        return right(sp, d).limit(1)

    r = compare_one(spark, "meta_rows", wrong_rows, oracle, sf_small)
    assert not r.ok and "ROW COUNT" in r.detail

    def wrong_schema(sp, d):
        return right(sp, d).withColumnRenamed("n", "count_rows")

    r = compare_one(spark, "meta_schema", wrong_schema, oracle, sf_small)
    assert not r.ok and "SCHEMA" in r.detail

    def array_out(sp, d):
        return right(sp, d).withColumn("arr", F.array(F.lit(1)))

    import pytest as _pytest

    with _pytest.raises(AssertionError, match="non-hashable"):
        compare_one(spark, "meta_arr", array_out, oracle, sf_small)
