"""Local replica of the driver's t2 correctness gate: run each queries()
entry on Spark and its oracle_sql() on DuckDB over the same parquet, then
compare row count, column names, and exact values (order-insensitive).

Used by tests/test_oracle_parity.py and scripts/check_parity.py so oracle
mismatches are caught before the driver sees them. Exact float equality is
intentional: the driver hashes values, so a ULP of drift is a failure here
too (queries route double aggregation through DECIMAL to guarantee this).
"""

from __future__ import annotations

import datetime as _dt
import decimal
import math
import os
from dataclasses import dataclass, field

import duckdb
import numpy as np
import pandas as pd

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.isdir(path):
            # Spark-written scale fixtures are parquet DIRECTORIES
            # (scripts/gen_scale.py) — glob the part files so parity
            # can run on them too (Zipf-corpus checks, VERDICT r10 #1)
            con.execute(
                f"CREATE OR REPLACE VIEW {name} AS "
                f"SELECT * FROM '{path}/*.parquet'"
            )
        elif os.path.exists(path):
            con.execute(f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM '{path}'")
    return con


def _norm_cell(v):
    """Canonical python value for cross-engine comparison.

    TYPE-PRESERVING for numerics (round-3 tightening): the driver's hash
    canonicalizer formats ``1000`` / ``1000.0`` / ``Decimal('1000')``
    differently, so a Spark BIGINT column paired with a DuckDB DOUBLE oracle
    hash-mismatches even when every value is equal.  Round 2 shipped seven
    driver-red queries that were green here precisely because this function
    coerced int→float and Decimal→float.  Numerics now carry a type tag
    (``b``/``i``/``f``/``dec``) so int ≠ float ≠ Decimal in the comparison —
    queries must pin ONE explicit type per output column on BOTH engine
    sides (``.cast("double")`` / ``CAST(... AS DOUBLE)``)."""
    if v is None:
        return None
    if isinstance(v, (bool, np.bool_)):
        return ("b", bool(v))
    if isinstance(v, (int, np.integer)):
        return ("i", int(v))
    if isinstance(v, (float, np.floating)):
        f = float(v)
        return None if math.isnan(f) else ("f", f)
    if isinstance(v, decimal.Decimal):
        return ("dec", str(v))
    if isinstance(v, (pd.Timestamp, _dt.datetime)):
        if pd.isna(v):
            return None
        return pd.Timestamp(v).tz_localize(None) if pd.Timestamp(v).tzinfo else pd.Timestamp(v)
    if isinstance(v, _dt.date):
        return pd.Timestamp(v)
    if isinstance(v, (list, tuple, np.ndarray)):
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, bytes):
        return v
    if isinstance(v, str):
        return v
    if v is pd.NaT:
        return None
    try:
        if pd.isna(v):
            return None
    except (TypeError, ValueError):
        pass
    return str(v)


def _rows(pdf: pd.DataFrame) -> list[tuple]:
    cols = sorted(pdf.columns)
    out = []
    for rec in pdf[cols].itertuples(index=False, name=None):
        out.append(tuple(_norm_cell(v) for v in rec))
    out.sort(key=repr)
    return out


@dataclass
class CompareResult:
    name: str
    ok: bool
    spark_rows: int = 0
    oracle_rows: int = 0
    detail: str = ""
    mismatches: list = field(default_factory=list)


def _assert_hashable_output(name: str, df) -> None:
    """The driver canonicalizes via a pandas sort + hash; array/map/struct
    cells raise ``TypeError: unhashable type`` there (the exact failure that
    killed agg_collect_median in round 1). Guard the whole class: every
    ORACLE-PAIRED query must emit only atomic columns — join arrays to
    strings (F.array_join) before returning."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    bad = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    if bad:
        raise AssertionError(
            f"{name}: oracle-paired output has non-hashable column(s) {bad}; "
            "the driver's hash canonicalizer cannot sort these — emit "
            "array_join/to_json strings instead"
        )


def compare_one(spark, name: str, spark_fn, oracle: str | None, sf_dir: str) -> CompareResult:
    spark_df = spark_fn(spark, sf_dir)
    if oracle is not None:
        _assert_hashable_output(name, spark_df)
    spark_pdf = spark_df.toPandas()
    if oracle is None:
        return CompareResult(
            name=name, ok=True, spark_rows=len(spark_pdf), oracle_rows=-1,
            detail="rows-only (no oracle)",
        )
    con = duck_connection(sf_dir)
    try:
        duck_pdf = con.execute(oracle).fetchdf()
    finally:
        con.close()
    if len(spark_pdf) != len(duck_pdf):
        return CompareResult(
            name=name, ok=False, spark_rows=len(spark_pdf),
            oracle_rows=len(duck_pdf), detail="ROW COUNT MISMATCH",
        )
    spark_pdf.columns = [c.lower() for c in spark_pdf.columns]
    duck_pdf.columns = [c.lower() for c in duck_pdf.columns]
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        return CompareResult(
            name=name, ok=False, spark_rows=len(spark_pdf),
            oracle_rows=len(duck_pdf),
            detail=f"SCHEMA MISMATCH spark={sorted(spark_pdf.columns)} "
            f"duck={sorted(duck_pdf.columns)}",
        )
    s_rows, d_rows = _rows(spark_pdf), _rows(duck_pdf)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b
    ][:5]
    if mismatches:
        return CompareResult(
            name=name, ok=False, spark_rows=len(spark_pdf),
            oracle_rows=len(duck_pdf), detail="VALUE MISMATCH",
            mismatches=mismatches,
        )
    return CompareResult(
        name=name, ok=True, spark_rows=len(spark_pdf), oracle_rows=len(duck_pdf)
    )
