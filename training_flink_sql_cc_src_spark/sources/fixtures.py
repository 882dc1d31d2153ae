"""Parquet fixture source (SURVEY.md §3 EP2 fixture mode).

The reference auto-exposes Kafka topics as tables via Schema Registry
(shoe_customers is readable with no in-repo CREATE —
terraform/lab-aggregations/main.tf:431 vs connector :248-278). Batch
analog: every parquet under the scale-factor dir registers as a temp view.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import TABLES


def load_fixture(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table, normalizing ``events.ts`` to TimestampType.

    The driver's events.parquet encoding has varied across testdata
    generations — TIMESTAMP(NANOS) (readable only as long nanos via the
    legacy flag) and plain timestamp[us] (read as TIMESTAMP_NTZ). Dispatch
    on the type Spark actually reads so every generation lands on the same
    session-TZ TimestampType column with identical microsecond values
    (DuckDB reads the same file natively, so oracle parity holds).

    Session timezone is pinned to UTC here (idempotent): timestamp-derived
    values (year/date casts, date_trunc) evaluate in session TZ, and the
    DuckDB oracle is UTC-naive — a non-UTC caller session would shift
    every date field. The NTZ→TZ cast below is value-preserving only
    under UTC, which this pin guarantees.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        ts_type = df.schema["ts"].dataType.simpleString()
        if ts_type == "bigint":  # TIMESTAMP(NANOS) read as long nanos
            return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        if ts_type == "timestamp_ntz":  # timestamp[us], no TZ metadata
            return df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df  # already TimestampType
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_fixture_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every fixture table as a temp view; returns the frames."""
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            df = load_fixture(spark, sf_dir, name)
            df.createOrReplaceTempView(name)
            out[name] = df
    return out
