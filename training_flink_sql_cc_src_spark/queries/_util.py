"""Shared helpers for oracle-matched queries."""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table (column pruning / predicate pushdown reach the
    parquet scan because this is a plain declarative source). Delegates to
    sources.fixtures (which also normalizes events' nanosecond timestamps
    to DuckDB-identical microseconds)."""
    from ..sources.fixtures import load_fixture

    return load_fixture(spark, sf_dir, name)


def fan_out(df: DataFrame) -> DataFrame:
    """Round-robin repartition to the session's default parallelism.

    The fixture parquet files are single-row-group, so Spark scans them as
    ONE task; any compute-heavy map stage placed directly on the scan runs
    single-threaded. Fanning out first costs a tiny shuffle (the fixtures
    are MBs) and unlocks full-core parallelism for sketching/scoring. On a
    real cluster the scan arrives pre-split, making this a no-op cost-wise
    — compute-bound stages still want partition-by-cost, not by-bytes,
    which is exactly what this expresses.
    """
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism)


def dsum(col: Column | str) -> Column:
    """Deterministic SUM over doubles: route through DECIMAL(38,6) so the
    result is independent of partial-aggregation order, then back to DOUBLE.
    Oracle side mirrors with CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast("decimal(38,6)")).cast("double")


def davg(col: Column | str) -> Column:
    """Deterministic AVG: exact decimal sum divided by count, in double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast("decimal(38,6)")).cast("double") / F.count(c)


DSUM_SQL = "CAST(SUM(CAST({x} AS DECIMAL(38,6))) AS DOUBLE)"
DAVG_SQL = "CAST(SUM(CAST({x} AS DECIMAL(38,6))) AS DOUBLE) / COUNT({x})"


def dot_col(a: Column, b: Column) -> Column:
    """Deterministic dot product of two array<float> columns: cast each
    element to double, multiply, and left-fold the sum in index order
    (F.aggregate is a sequential fold). Paired with dot_sql, which spells
    the same left-associated double arithmetic in DuckDB — IEEE doubles
    make the two bit-identical, so cosine scores are hash-safe.
    """
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def dot_sql(a: str, b: str, dim: int = 64) -> str:
    """DuckDB SQL mirroring dot_col: explicit left-associated 64-term sum
    (1-indexed list access)."""
    terms = " + ".join(
        f"CAST({a}[{i}] AS DOUBLE) * CAST({b}[{i}] AS DOUBLE)"
        for i in range(1, dim + 1)
    )
    return f"(0.0 + {terms})"


def cosine_col(a: Column, b: Column) -> Column:
    """cos(a,b) with the deterministic fold; composition order mirrors
    cosine_sql exactly."""
    return dot_col(a, b) / (F.sqrt(dot_col(a, a)) * F.sqrt(dot_col(b, b)))


def norm_col(a: Column) -> Column:
    """sqrt(a·a) with the same deterministic fold as cosine_col. Compute
    it ONCE per side before a similarity join: each candidate row then
    folds only dot(a,b) instead of three dots — identical doubles, so
    scores stay bit-identical to cosine_col/cosine_sql, but the per-pair
    cost drops 3x (the corpus-side norm is amortized over every candidate
    pair the vector appears in)."""
    return F.sqrt(dot_col(a, a))


def cosine_sql(a: str, b: str, dim: int = 64) -> str:
    return (
        f"({dot_sql(a, b, dim)} / "
        f"(SQRT({dot_sql(a, a, dim)}) * SQRT({dot_sql(b, b, dim)})))"
    )


def epoch_s(col: Column | str) -> Column:
    """Timestamp → BIGINT epoch seconds (truncating), for oracle-stable
    window boundaries."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("long")
