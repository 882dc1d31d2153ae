"""Shared helpers for oracle-matched queries."""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table (column pruning / predicate pushdown reach the
    parquet scan because this is a plain declarative source).

    ``events.ts`` is TIMESTAMP(NANOS) parquet, which Spark's vectorized
    reader rejects; read it as long nanos and truncate to microseconds —
    bit-identical to how DuckDB reads the same file (TIMESTAMP_NS → µs).
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


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


def epoch_s(col: Column | str) -> Column:
    """Timestamp → BIGINT epoch seconds (truncating), for oracle-stable
    window boundaries."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("long")
