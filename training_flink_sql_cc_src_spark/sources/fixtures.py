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
    """Load one fixture table. events.ts is TIMESTAMP(NANOS) parquet —
    read as long nanos, truncate to micros (identical to DuckDB).

    Session timezone is pinned to UTC here (idempotent): timestamp-derived
    values (year/date casts, date_trunc) evaluate in session TZ, and the
    DuckDB oracle is UTC-naive — a non-UTC caller session would shift
    every date field.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
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
